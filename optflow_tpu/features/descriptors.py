"""Keypoint descriptors, fully batched for MXU matching.

- :func:`surf_descriptors` — SURF-class 64-dim float descriptor: a 4x4 grid
  of subregions over an oriented 20-sigma window, each accumulating
  (sum dx, sum |dx|, sum dy, sum |dy|) of scale-space gradients rotated into
  the keypoint frame, L2-normalized. (Replaces cv::cuda::SURF_CUDA's
  descriptor stage, src/features.cpp:86-87.)
- :func:`orb_descriptors` — ORB-class 256-bit binary descriptor from
  pairwise intensity tests on a smoothed patch, rotated by the keypoint
  orientation. The test pattern is generated from a fixed PRNG (BRIEF
  style) rather than OpenCV's learned table; descriptors are encoded as
  +/-1 float32 vectors so Hamming distance becomes a single MXU matmul:
  ham = (256 - a.b) / 2. (Replaces cv::cuda::ORB descriptors,
  src/features.cpp:58-61.)

Both take fixed-capacity Keypoints and return (K, D) arrays; invalid
keypoints get zero descriptors (matched out via masks downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from optflow_tpu.features.detect import (
    Keypoints,
    gaussian_blur,
    gaussian_gradients,
)
from optflow_tpu.ops.warp import bilinear_sample


# ------------------------------------------------------------ SURF-class

_GRID = 4  # 4x4 subregions
_SUB = 5  # 5x5 samples per subregion


def _surf_sample_offsets():
    """(400, 2) sample offsets in units of sigma, spanning [-10, 10)."""
    n = _GRID * _SUB
    coords = (np.arange(n) - n / 2 + 0.5) * (20.0 / n)
    oy, ox = np.meshgrid(coords, coords, indexing="ij")
    return ox.reshape(-1).astype(np.float32), oy.reshape(-1).astype(np.float32)


_SURF_OX, _SURF_OY = _surf_sample_offsets()
# Gaussian weighting of samples (sigma 3.3 in sigma units, as in SURF).
_SURF_W = np.exp(
    -(_SURF_OX**2 + _SURF_OY**2) / (2 * 3.3**2)
).astype(np.float32)


# Orientation sampling pattern: disk of radius 6 (in sigma units).
def _orient_offsets():
    coords = np.arange(-6, 7, dtype=np.float32)
    oy, ox = np.meshgrid(coords, coords, indexing="ij")
    keep = ox**2 + oy**2 <= 36.0
    w = np.exp(-(ox**2 + oy**2) / (2 * 2.5**2))
    return (
        ox[keep].astype(np.float32),
        oy[keep].astype(np.float32),
        w[keep].astype(np.float32),
    )


_OR_OX, _OR_OY, _OR_W = _orient_offsets()


@jax.jit
def estimate_orientations(im: jnp.ndarray, kps: Keypoints) -> jnp.ndarray:
    """Dominant gradient orientation per keypoint: the angle of the
    Gaussian-weighted mean gradient over a 6-sigma disk (the role of
    SURF's sliding-sector Haar voting, simplified to its first moment)."""
    gx, gy = gaussian_gradients(im.astype(jnp.float32), 2.0)
    ox = jnp.asarray(_OR_OX)
    oy = jnp.asarray(_OR_OY)
    wgt = jnp.asarray(_OR_W)

    def one(x, y, sigma):
        sx = x + sigma * ox
        sy = y + sigma * oy
        dx = bilinear_sample(gx, sx.reshape(1, -1), sy.reshape(1, -1))[0]
        dy = bilinear_sample(gy, sx.reshape(1, -1), sy.reshape(1, -1))[0]
        return jnp.arctan2(jnp.sum(dy * wgt), jnp.sum(dx * wgt))

    angles = jax.vmap(one)(kps.x, kps.y, kps.sigma)
    return jnp.where(kps.valid, angles, 0.0)


@functools.partial(jax.jit, static_argnames=("upright",))
def surf_descriptors(
    im: jnp.ndarray, kps: Keypoints, upright: bool = False
) -> jnp.ndarray:
    """(K, 64) L2-normalized SURF-class descriptors."""
    im = im.astype(jnp.float32)
    # Single gradient field at a representative scale; per-keypoint scale
    # selection is folded into the sampling window (offsets scale with
    # sigma), which preserves discrimination while keeping one conv pass.
    gx, gy = gaussian_gradients(im, 2.0)

    ox = jnp.asarray(_SURF_OX)
    oy = jnp.asarray(_SURF_OY)
    wgt = jnp.asarray(_SURF_W)

    def one(x, y, sigma, angle):
        if upright:
            ca, sa = jnp.float32(1.0), jnp.float32(0.0)
        else:
            ca, sa = jnp.cos(angle), jnp.sin(angle)
        # rotate sample grid into image frame; offsets scale with sigma
        sx = x + sigma * (ca * ox - sa * oy)
        sy = y + sigma * (sa * ox + ca * oy)
        dx_i = bilinear_sample(gx, sx.reshape(1, -1), sy.reshape(1, -1))[0]
        dy_i = bilinear_sample(gy, sx.reshape(1, -1), sy.reshape(1, -1))[0]
        # rotate gradients into keypoint frame
        dx = (ca * dx_i + sa * dy_i) * wgt
        dy = (-sa * dx_i + ca * dy_i) * wgt
        feats = jnp.stack([dx, jnp.abs(dx), dy, jnp.abs(dy)], axis=-1)
        # (400, 4) -> (4, 5, 4, 5, 4) -> sum over the 5x5 samples
        feats = feats.reshape(_GRID, _SUB, _GRID, _SUB, 4)
        cells = feats.sum(axis=(1, 3))  # (4, 4, 4)
        vec = cells.reshape(-1)
        norm = jnp.sqrt(jnp.sum(vec * vec) + 1e-8)
        return vec / norm

    desc = jax.vmap(one)(kps.x, kps.y, kps.sigma, kps.angle)
    return jnp.where(kps.valid[:, None], desc, 0.0)


# ------------------------------------------------------------ ORB-class

_N_TESTS = 256


def _brief_pattern(patch_size: int = 31, seed: int = 17):
    """BRIEF test-pair pattern: Gaussian-distributed point pairs inside the
    patch, fixed seed for determinism across runs/processes."""
    rng = np.random.default_rng(seed)
    std = patch_size / 5.0
    lim = patch_size // 2 - 1
    pts = np.clip(
        rng.normal(0.0, std, size=(_N_TESTS, 4)), -lim, lim
    ).astype(np.float32)
    return pts  # columns: x1, y1, x2, y2


_BRIEF = _brief_pattern()


@jax.jit
def orb_descriptors(im: jnp.ndarray, kps: Keypoints) -> jnp.ndarray:
    """(K, 256) +/-1 float32 binary descriptors (rotated BRIEF tests)."""
    im = gaussian_blur(im.astype(jnp.float32), 2.0)
    pat = jnp.asarray(_BRIEF)

    def one(x, y, sigma, angle):
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        # rotate + scale the test pattern into the image frame
        x1 = x + sigma * (ca * pat[:, 0] - sa * pat[:, 1])
        y1 = y + sigma * (sa * pat[:, 0] + ca * pat[:, 1])
        x2 = x + sigma * (ca * pat[:, 2] - sa * pat[:, 3])
        y2 = y + sigma * (sa * pat[:, 2] + ca * pat[:, 3])
        v1 = bilinear_sample(im, x1.reshape(1, -1), y1.reshape(1, -1))[0]
        v2 = bilinear_sample(im, x2.reshape(1, -1), y2.reshape(1, -1))[0]
        return jnp.where(v1 < v2, 1.0, -1.0)

    desc = jax.vmap(one)(kps.x, kps.y, kps.sigma, kps.angle)
    return jnp.where(kps.valid[:, None], desc, 0.0)
