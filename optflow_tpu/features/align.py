"""Feature-based pre-alignment: find_alignment.

Reimplements the reference's find_alignment (src/features.cpp:46-167):
detect + describe on both frames (ORB-class for ``features == 1``,
SURF-class for ``features == 2``, default SURF), k=2 brute-force matching,
Lowe ratio test, homography estimation by the configured ``homo`` method
with ``ransac`` reprojection threshold, then the sanity gates:

- fewer than 11 good matches -> identity + "Not enough matches"
  (src/features.cpp:157-166)
- no homography or either diagonal scale term deviating more than 20%
  from 1 -> identity + warning (src/features.cpp:134-147)
- otherwise the affine is the top two rows of the homography
  (src/features.cpp:154) — the projective row is dropped, as in the
  reference.

The returned 2x3 affine maps the first argument's coordinates into the
second argument's space (the engine calls find_alignment(frame1, frame0),
src/optflow.cpp:373, then warps frame1 with it).

The reference's SURF pad-to-multiple-of-64 workaround
(src/features.cpp:70-78) is a CUDA-SURF implementation detail and is not
needed here.
"""

from __future__ import annotations

import sys
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from optflow_tpu.core.config import (
    MatchParams,
    OrbParams,
    SurfParams,
    cfg_get,
    feature_type,
    ORB_TYPE,
    SURF_TYPE,
)
from optflow_tpu.features.descriptors import orb_descriptors, surf_descriptors
from optflow_tpu.features.detect import fast_keypoints, hessian_keypoints
from optflow_tpu.features.match import knn_match2, ratio_filter
from optflow_tpu.features.ransac import find_homography

IDENTITY = np.array([[1.0, 0, 0], [0, 1.0, 0]], dtype=np.float32)


def _detect_describe(im: jnp.ndarray, ftype: int, im_args, args):
    h, w = im.shape
    if ftype == ORB_TYPE:
        p = OrbParams.from_config(im_args, args)
        cap = min(max(int(p.nfeatures), 64), 2048)
        kps = fast_keypoints(
            im,
            fast_threshold=p.fast_threshold,
            scale_factor=p.scale_factor,
            nlevels=p.nlevels,
            capacity=cap,
            edge_threshold=p.edge_threshold,
        )
        desc = orb_descriptors(im, kps)
        return kps, desc, True
    p = SurfParams.from_config(im_args, args)
    cap = int(np.clip(p.keypoints_ratio * h * w, 256, 4096))
    kps = hessian_keypoints(
        im,
        hessian_threshold=p.hessian_threshold,
        n_octaves=p.n_octaves,
        n_octave_layers=p.n_octave_layers,
        capacity=cap,
    )
    if not p.upright:
        from optflow_tpu.features.descriptors import estimate_orientations

        kps = kps._replace(angle=estimate_orientations(im, kps))
    desc = surf_descriptors(im, kps, upright=p.upright)
    return kps, desc, False


def find_alignment(
    src: np.ndarray,
    dst: np.ndarray,
    im_args: Mapping,
    args: Mapping,
) -> np.ndarray:
    """Estimate the 2x3 affine mapping src coordinates into dst space."""
    debug = bool(args.get("debug", False))
    ftype = feature_type(im_args, args)
    mp = MatchParams.from_config(im_args, args)

    src_j = jnp.asarray(src, jnp.float32)
    dst_j = jnp.asarray(dst, jnp.float32)
    kps0, desc0, binary = _detect_describe(src_j, ftype, im_args, args)
    kps1, desc1, _ = _detect_describe(dst_j, ftype, im_args, args)

    matches = knn_match2(desc0, kps0.valid, desc1, kps1.valid, binary=binary)
    good = ratio_filter(matches, mp.ratio)

    n_good = int(jnp.sum(good))
    if debug:
        print(f"Number of features: {int(jnp.sum(kps0.valid))}")
        print(f"Number of good features: {n_good}")

    if n_good <= 10:
        print("Not enough matches. Using no transformation")
        return IDENTITY.copy()

    p0 = jnp.stack([kps0.x, kps0.y], axis=1)
    p1_all = jnp.stack([kps1.x, kps1.y], axis=1)
    p1 = p1_all[matches.idx]

    res = find_homography(
        p0,
        p1,
        good,
        thresh=float(mp.ransac),
        method=int(mp.homo),
    )
    H = np.asarray(res.H, dtype=np.float64)
    ok = bool(res.ok)

    if (
        not ok
        or abs(1.0 - H[0, 0]) > mp.max_zoom_deviation
        or abs(1.0 - H[1, 1]) > mp.max_zoom_deviation
    ):
        print(
            "More than twenty percent variance in zoom or no homography "
            "found, this is probably an error, ignoring the transformation."
        )
        if debug:
            print(H)
        return IDENTITY.copy()

    if debug:
        print(H)
    return H[0:2, 0:3].astype(np.float32)
