"""Feature pipeline tests: detectors, descriptors, matching, RANSAC, and
find_alignment end-to-end on synthetic transforms."""

import numpy as np
import jax.numpy as jnp
import pytest

from optflow_tpu.features.detect import (
    fast_keypoints,
    gaussian_blur,
    hessian_keypoints,
)
from optflow_tpu.features.descriptors import orb_descriptors, surf_descriptors
from optflow_tpu.features.match import knn_match2, ratio_filter
from optflow_tpu.features.ransac import find_homography
from optflow_tpu.features.align import find_alignment
from tests.conftest import make_fibsem_like


def _blob_image(h=128, w=128, centers=((32, 40), (64, 96), (96, 30)), sig=3.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    im = np.full((h, w), 30.0)
    for cy, cx in centers:
        im += 180.0 * np.exp(-(((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sig**2)))
    return im.astype(np.float32)


def _affine_warp_np(im, A):
    """Forward-warp im by affine A (dst(x) = im(A^-1 x)), cubic sampling."""
    import scipy.ndimage as ndi

    Ainv = np.linalg.inv(np.vstack([A, [0, 0, 1]]))
    h, w = im.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    sx = Ainv[0, 0] * xs + Ainv[0, 1] * ys + Ainv[0, 2]
    sy = Ainv[1, 0] * xs + Ainv[1, 1] * ys + Ainv[1, 2]
    return ndi.map_coordinates(im, [sy, sx], order=3, mode="nearest").astype(
        np.float32
    )


# ------------------------------------------------------------- detectors


def test_hessian_detects_blobs():
    im = _blob_image()
    kps = hessian_keypoints(jnp.asarray(im), hessian_threshold=50.0)
    xs = np.asarray(kps.x)[np.asarray(kps.valid)]
    ys = np.asarray(kps.y)[np.asarray(kps.valid)]
    assert len(xs) >= 3
    # each true blob center has a detection within 3 px
    for cy, cx in ((32, 40), (64, 96), (96, 30)):
        d = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
        assert d.min() < 3.0, f"blob at {(cy, cx)} missed (closest {d.min()})"


def test_hessian_threshold_monotone(rng):
    im = make_fibsem_like(rng, 128, 128, smooth=4)
    lo = hessian_keypoints(jnp.asarray(im), hessian_threshold=10.0)
    hi = hessian_keypoints(jnp.asarray(im), hessian_threshold=1000.0)
    assert int(jnp.sum(lo.valid)) >= int(jnp.sum(hi.valid))


def test_fast_detects_corners():
    im = np.full((96, 96), 40.0, np.float32)
    im[30:70, 30:70] = 200.0  # a bright square: 4 strong corners
    kps = fast_keypoints(jnp.asarray(im), capacity=256, edge_threshold=8)
    xs = np.asarray(kps.x)[np.asarray(kps.valid)]
    ys = np.asarray(kps.y)[np.asarray(kps.valid)]
    assert len(xs) >= 4
    for cy, cx in ((30, 30), (30, 69), (69, 30), (69, 69)):
        d = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
        assert d.min() < 4.0


# ------------------------------------------------------------ descriptors


def test_surf_descriptors_normalized_and_repeatable(rng):
    im = make_fibsem_like(rng, 128, 128, smooth=4)
    kps = hessian_keypoints(jnp.asarray(im), hessian_threshold=20.0)
    desc = surf_descriptors(jnp.asarray(im), kps)
    v = np.asarray(kps.valid)
    norms = np.linalg.norm(np.asarray(desc), axis=1)
    assert np.allclose(norms[v], 1.0, atol=1e-3)
    # invalid slots are zero
    assert np.allclose(norms[~v], 0.0, atol=1e-6)


def test_orb_descriptors_pm_one(rng):
    im = make_fibsem_like(rng, 96, 96, smooth=3)
    kps = fast_keypoints(jnp.asarray(im), capacity=128)
    desc = np.asarray(orb_descriptors(jnp.asarray(im), kps))
    v = np.asarray(kps.valid)
    assert set(np.unique(desc[v])) <= {-1.0, 1.0}


# -------------------------------------------------------------- matching


def test_knn_match_identity(rng):
    """Matching an image's descriptors against themselves is the identity."""
    im = make_fibsem_like(rng, 128, 128, smooth=4)
    kps = hessian_keypoints(jnp.asarray(im), hessian_threshold=20.0)
    desc = surf_descriptors(jnp.asarray(im), kps)
    m = knn_match2(desc, kps.valid, desc, kps.valid)
    v = np.asarray(kps.valid)
    idx = np.asarray(m.idx)
    assert np.all(idx[v] == np.arange(len(idx))[v])
    assert np.allclose(np.asarray(m.dist1)[v], 0.0, atol=1e-2)


def test_ratio_filter():
    from optflow_tpu.features.match import Knn2

    m = Knn2(
        idx=jnp.asarray([0, 1]),
        dist1=jnp.asarray([0.5, 0.79]),
        dist2=jnp.asarray([1.0, 1.0]),
        valid=jnp.asarray([True, True]),
    )
    mask = np.asarray(ratio_filter(m, 0.7))
    assert mask.tolist() == [True, False]


# ---------------------------------------------------------------- RANSAC


def _random_correspondences(rng, n=100, n_out=0, A=None):
    p0 = rng.uniform(10, 500, size=(n, 2)).astype(np.float32)
    if A is None:
        A = np.array([[1.02, 0.05, 8.0], [-0.03, 0.98, -5.0]])
    p1 = p0 @ A[:, :2].T + A[:, 2]
    p1 += rng.normal(0, 0.3, p1.shape)
    if n_out:
        out_idx = rng.choice(n, n_out, replace=False)
        p1[out_idx] += rng.uniform(40, 120, (n_out, 2))
    return (
        jnp.asarray(p0),
        jnp.asarray(p1.astype(np.float32)),
        jnp.ones((n,), bool),
        A,
    )


def test_homography_all_points_clean(rng):
    p0, p1, mask, A = _random_correspondences(rng)
    res = find_homography(p0, p1, mask, method=0)
    H = np.asarray(res.H)
    assert np.allclose(H[0:2, 0:2], A[:, :2], atol=0.02)
    assert np.allclose(H[0:2, 2], A[:, 2], atol=1.5)


def test_homography_ransac_with_outliers(rng):
    p0, p1, mask, A = _random_correspondences(rng, n=120, n_out=40)
    res = find_homography(p0, p1, mask, method=4, thresh=3.0)
    H = np.asarray(res.H)
    assert bool(res.ok)
    assert int(res.n_inliers) >= 60
    assert np.allclose(H[0:2, 0:2], A[:, :2], atol=0.03)
    assert np.allclose(H[0:2, 2], A[:, 2], atol=2.0)


def test_homography_lmeds(rng):
    p0, p1, mask, A = _random_correspondences(rng, n=120, n_out=30)
    res = find_homography(p0, p1, mask, method=8, thresh=3.0)
    assert bool(res.ok)
    H = np.asarray(res.H)
    assert np.allclose(H[0:2, 0:2], A[:, :2], atol=0.05)


def test_homography_too_few_points():
    p0 = jnp.zeros((8, 2))
    p1 = jnp.zeros((8, 2))
    mask = jnp.zeros((8,), bool).at[0].set(True)
    res = find_homography(p0, p1, mask, method=4)
    assert not bool(res.ok)


# ----------------------------------------------------- find_alignment e2e


ALIGN_ARGS = {"hessianThreshold": 30, "ratio": 0.85, "debug": False}


def test_find_alignment_translation(rng):
    im0 = make_fibsem_like(rng, 160, 160, smooth=5)
    A = np.array([[1.0, 0.0, 6.0], [0.0, 1.0, -4.0]], dtype=np.float64)
    im1 = _affine_warp_np(im0, A)
    # find_alignment(src=im1... wait: engine calls (frame1, frame0) and the
    # result maps frame1 -> frame0. Here im1 = warp of im0 by A, so the
    # affine mapping im1 coords -> im0 coords is A^-1.
    aff = find_alignment(im1, im0, {}, dict(ALIGN_ARGS))
    Ainv = np.linalg.inv(np.vstack([A, [0, 0, 1]]))[:2]
    assert np.allclose(aff[:, :2], Ainv[:, :2], atol=0.03), aff
    assert np.allclose(aff[:, 2], Ainv[:, 2], atol=2.0), aff


def test_find_alignment_small_rotation(rng):
    im0 = make_fibsem_like(rng, 160, 160, smooth=5)
    th = np.deg2rad(3.0)
    c, s = np.cos(th), np.sin(th)
    A = np.array([[c, -s, 5.0], [s, c, 2.0]])
    im1 = _affine_warp_np(im0, A)
    aff = find_alignment(im1, im0, {}, dict(ALIGN_ARGS))
    Ainv = np.linalg.inv(np.vstack([A, [0, 0, 1]]))[:2]
    assert np.allclose(aff[:, :2], Ainv[:, :2], atol=0.05), aff
    assert np.allclose(aff[:, 2], Ainv[:, 2], atol=3.0), aff


def test_find_alignment_rejects_zoom(rng):
    """>20% scale change must trip the sanity gate -> identity."""
    im0 = make_fibsem_like(rng, 160, 160, smooth=5)
    A = np.array([[1.5, 0.0, 0.0], [0.0, 1.5, 0.0]])
    im1 = _affine_warp_np(im0, A)
    aff = find_alignment(im1, im0, {}, dict(ALIGN_ARGS))
    assert np.allclose(aff, np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-6)


def test_find_alignment_not_enough_matches(capsys):
    flat = np.zeros((96, 96), np.float32)
    aff = find_alignment(flat, flat, {}, dict(ALIGN_ARGS))
    assert np.allclose(aff, np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-6)
    assert "Not enough matches" in capsys.readouterr().out


def test_find_alignment_orb_path(rng):
    im0 = make_fibsem_like(rng, 160, 160, smooth=5)
    A = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, 3.0]])
    im1 = _affine_warp_np(im0, A)
    args = dict(ALIGN_ARGS)
    args["features"] = 1  # ORB-class
    aff = find_alignment(im1, im0, {}, args)
    # identity fallback is acceptable only if matching genuinely failed;
    # for a pure translation ORB should lock on
    assert abs(aff[0, 2] + 5.0) < 3.0, aff
    assert abs(aff[1, 2] + 3.0) < 3.0, aff


def test_engine_integration_feature_prealign(rng, tmp_path):
    """Full pair solve with real feature pre-alignment: a large translation
    (beyond the small pyramid's range) must come back through the affine."""
    from optflow_tpu.engine.pair import solve_rois
    from optflow_tpu.engine.rois import resolve_rois
    from optflow_tpu.engine.features_glue import default_aligner

    im0 = make_fibsem_like(rng, 160, 192, smooth=5)
    A = np.array([[1.0, 0.0, -12.0], [0.0, 1.0, 0.0]])
    im1 = _affine_warp_np(im0, A)
    im_args = {}
    args = {
        "output_type": "flow",
        "features": 2,
        "hessianThreshold": 30,
        "ratio": 0.85,
        "rois": {"top": 80},
        "nscales": 3,
        "warps": 2,
        "iterations": 40,
    }
    rois = resolve_rois(im_args, args, *im0.shape)
    res = solve_rois(
        im0, im1, rois, im_args, args,
        aligner=default_aligner, write_outputs=False,
    )
    fx = res["top"]["flow_x"]
    m = 20
    med = float(np.median(fx[m:-m, m:-m]))
    # flow output subtracts identity: total displacement ~ -12 in x... the
    # feature affine absorbs it, so the composed flow's median must be
    # close to the true -12... in the features branch with output "flow"
    # the emitted field is (warped absolute map) - identity ~= A^-1 - I
    # composed with residual TV-L1 flow: ~ +12? A maps im0->im1 shifting
    # content by -12 means im1(x) = im0(x+12): true forward flow is -12.
    assert abs(med - (-12.0)) < 1.5, med


def test_estimate_orientations_ramp():
    """A pure intensity ramp has gradient direction = ramp direction."""
    import jax.numpy as jnp
    from optflow_tpu.features.descriptors import estimate_orientations
    from optflow_tpu.features.detect import Keypoints

    h = w = 64
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    th = np.deg2rad(30.0)
    im = np.cos(th) * xs + np.sin(th) * ys
    kps = Keypoints(
        x=jnp.asarray([32.0]), y=jnp.asarray([32.0]),
        sigma=jnp.asarray([2.0]), angle=jnp.asarray([0.0]),
        response=jnp.asarray([1.0]), valid=jnp.asarray([True]),
    )
    ang = float(estimate_orientations(jnp.asarray(im), kps)[0])
    assert abs(ang - th) < 0.05


def test_find_alignment_moderate_rotation(rng):
    """10-degree rotation: needs rotation-invariant descriptors."""
    im0 = make_fibsem_like(rng, 192, 192, smooth=5)
    th = np.deg2rad(10.0)
    c, s = np.cos(th), np.sin(th)
    cx = cy = 96.0
    # rotate about the center to keep content in frame
    A = np.array([
        [c, -s, cx - c * cx + s * cy],
        [s, c, cy - s * cx - c * cy],
    ])
    im1 = _affine_warp_np(im0, A)
    aff = find_alignment(im1, im0, {}, dict(ALIGN_ARGS))
    Ainv = np.linalg.inv(np.vstack([A, [0, 0, 1]]))[:2]
    # must NOT fall back to identity, and the linear part must match
    assert not np.allclose(aff, np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-3)
    assert np.allclose(aff[:, :2], Ainv[:, :2], atol=0.05), aff


def test_find_alignment_indexed_matches_batched(rng):
    """The frame-deduplicated indexed aligner (detect once per unique
    frame — the engine's production path for chained pair lists) must
    produce the same results as the per-pair batched pipeline."""
    import jax.numpy as jnp

    from optflow_tpu.core.config import (
        MatchParams, OrbParams, SurfParams, SURF_TYPE,
    )
    from optflow_tpu.features.align import (
        find_alignment_batched_device,
        find_alignment_indexed,
    )

    orb = OrbParams()
    surf = SurfParams(hessian_threshold=30.0)
    mp = MatchParams(ratio=0.85)

    f0 = make_fibsem_like(rng, 128, 128, smooth=5)
    f1 = _affine_warp_np(f0, np.array([[1.0, 0, 3.0], [0, 1.0, -2.0]]))
    f2 = _affine_warp_np(f1, np.array([[1.0, 0, -2.0], [0, 1.0, 1.0]]))
    frames = jnp.asarray(np.stack([f0, f1, f2]))

    # chained pairs (f1->f0), (f2->f1): frame f1 is reused
    idx_src = jnp.asarray([1, 2], jnp.int32)
    idx_dst = jnp.asarray([0, 1], jnp.int32)
    res_i = find_alignment_indexed(
        frames, idx_src, idx_dst, SURF_TYPE, orb, surf, mp
    )

    res_b = find_alignment_batched_device(
        frames[idx_src], frames[idx_dst], SURF_TYPE, orb, surf, mp
    )
    assert np.array_equal(np.asarray(res_i.affine), np.asarray(res_b.affine))
    assert np.array_equal(np.asarray(res_i.n_good), np.asarray(res_b.n_good))
    # and the alignment is actually good: recovered translations
    assert np.allclose(
        np.asarray(res_i.affine)[0][:, 2], [-3.0, 2.0], atol=2.0
    )
