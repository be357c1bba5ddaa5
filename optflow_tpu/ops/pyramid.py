"""Coarse-to-fine image pyramid for the TV-L1 solver.

The reference's GPU solver builds its pyramid by repeatedly resizing by
``scaleStep`` with bilinear sampling and stops adding levels once a dimension
would drop below 16 px (behavior of the cv::cuda::OpticalFlowDual_TVL1
dependency configured at src/optflow.cpp:506,510). Because XLA requires
static shapes, the level geometry is computed in Python
(:func:`pyramid_shapes`) and the per-level resizes are traced with those
static shapes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

MIN_LEVEL_DIM = 16


def resize_bilinear(im: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with OpenCV's half-pixel convention, no antialiasing
    (cv::resize INTER_LINEAR)."""
    if tuple(im.shape) == tuple(shape):
        return im
    return jax.image.resize(im, shape, method="linear", antialias=False)


def pyramid_shapes(
    h: int, w: int, nscales: int, scale_step: float
) -> List[Tuple[int, int]]:
    """Static level shapes, finest first.

    Level s has shape round(prev * scale_step); levels stop when either
    dimension would fall below MIN_LEVEL_DIM (matching the reference GPU
    solver's level clamp).
    """
    shapes = [(h, w)]
    ch, cw = h, w
    for _ in range(1, nscales):
        nh = int(round(ch * scale_step))
        nw = int(round(cw * scale_step))
        if nh < MIN_LEVEL_DIM or nw < MIN_LEVEL_DIM:
            break
        shapes.append((nh, nw))
        ch, cw = nh, nw
    return shapes


def build_pyramid(
    im: jnp.ndarray, shapes: Sequence[Tuple[int, int]]
) -> List[jnp.ndarray]:
    """Build the pyramid by chained resizes (finest first), compounding
    scale_step exactly like the reference (resize from the previous level,
    not from the base)."""
    levels = [im]
    for shape in shapes[1:]:
        levels.append(resize_bilinear(levels[-1], shape))
    return levels


def upscale_flow(
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    shape: Tuple[int, int],
    scale_step: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Upsample flow to the next finer level and rescale magnitudes by
    1/scale_step (the reference multiplies by the constant, not the exact
    per-axis shape ratio)."""
    inv = 1.0 / scale_step
    return (
        resize_bilinear(u1, shape) * inv,
        resize_bilinear(u2, shape) * inv,
    )
