"""Pallas TPU kernel for the TV-L1 inner iteration loop.

The hot loop of the whole framework (SURVEY.md §3.1): per pyramid level and
per warp, up to ``iterations`` (default 300) primal-dual updates over the
full image. The reference's GPU solver launches separate CUDA kernels per
update, round-tripping HBM every iteration. Here the entire iteration loop
runs inside ONE Pallas kernel with all state resident in VMEM — zero HBM
traffic between iterations — which converts the solve from
bandwidth-bound to VPU-bound.

Kernel state (all H x W f32 in VMEM): i1wx, i1wy, grad, rho_c (read-only
per warp) and u1, u2, p11, p12, p21, p22 (updated in place via
input/output aliasing). Stencils (forward gradient, backward divergence)
are built from pltpu.roll plus iota boundary masks. The epsilon stop
criterion is an in-VMEM reduction checked every iteration, matching the
reference solver's early exit.

The backward warp between iteration blocks stays in XLA (per-pixel gather
has no efficient Pallas TPU lowering) — it runs warps (5) times per level
vs. iterations x warps (1500) for the fused loop, so its cost is amortized
~60x.

Falls back to the pure-jnp level solver when the level state would
overflow VMEM or when gamma != 0 (reference default gamma is 0,
src/optflow.cpp:511).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow_level
from optflow_tpu.ops.warp import centered_gradient, warp_backward

_GRAD_EPS = 1.192092896e-07

# VMEM budget for the resident kernel: 10 state arrays + live temporaries.
# Empirically the compiled kernel allocates ~16 arrays worth of scoped VMEM
# per grid step; requesting more than ~16 MiB crashes the v5e worker, so
# levels that would exceed the budget fall back to the (equally XLA-fused)
# jnp iteration path instead.
_VMEM_STATE_ARRAYS = 17
_VMEM_BYTES = 14 * 1024 * 1024


def _roll_up(x, axis):
    """x shifted so out[i] = x[i+1] along axis (pltpu.roll needs shift >= 0,
    so a -1 shift is expressed as size-1)."""
    return pltpu.roll(x, x.shape[axis] - 1, axis)


def _iter_kernel(
    scalar_ref,  # SMEM (4,): l_t, theta, taut, scaled_eps
    niter_ref,  # SMEM (1,): iteration count
    i1wx_ref,
    i1wy_ref,
    grad_ref,
    rho_ref,
    u1_ref,
    u2_ref,
    p11_ref,
    p12_ref,
    p21_ref,
    p22_ref,
    # outputs (aliased to the six state inputs)
    u1_out,
    u2_out,
    p11_out,
    p12_out,
    p21_out,
    p22_out,
):
    l_t = scalar_ref[0]
    theta = scalar_ref[1]
    taut = scalar_ref[2]
    scaled_eps = scalar_ref[3]
    n_iters = niter_ref[0]

    h, w = u1_out.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    first_col = cols == 0
    last_col = cols == w - 1
    first_row = rows == 0
    last_row = rows == h - 1

    i1wx = i1wx_ref[:]
    i1wy = i1wy_ref[:]
    grad = grad_ref[:]
    rho_c = rho_ref[:]

    def div(p1, p2):
        # backward differences with zero boundary on the low side
        dx = p1 - pltpu.roll(p1, 1, 1)
        dx = jnp.where(first_col, p1, dx)
        dy = p2 - pltpu.roll(p2, 1, 0)
        dy = jnp.where(first_row, p2, dy)
        return dx + dy

    def fwd_grad(u):
        ux = _roll_up(u, 1) - u
        ux = jnp.where(last_col, 0.0, ux)
        uy = _roll_up(u, 0) - u
        uy = jnp.where(last_row, 0.0, uy)
        return ux, uy

    def body(carry):
        n, _ = carry
        u1 = u1_out[:]
        u2 = u2_out[:]

        rho = rho_c + i1wx * u1 + i1wy * u2
        hi_thresh = l_t * grad
        lo = rho < -hi_thresh
        hi = rho > hi_thresh
        fi = -rho / jnp.maximum(grad, _GRAD_EPS)
        mid_ok = grad > _GRAD_EPS
        d1 = jnp.where(
            lo,
            l_t * i1wx,
            jnp.where(
                hi, -l_t * i1wx, jnp.where(mid_ok, fi * i1wx, 0.0)
            ),
        )
        d2 = jnp.where(
            lo,
            l_t * i1wy,
            jnp.where(
                hi, -l_t * i1wy, jnp.where(mid_ok, fi * i1wy, 0.0)
            ),
        )

        u1n = u1 + d1 + theta * div(p11_out[:], p12_out[:])
        u2n = u2 + d2 + theta * div(p21_out[:], p22_out[:])

        err = jnp.sum((u1n - u1) ** 2 + (u2n - u2) ** 2)

        u1_out[:] = u1n
        u2_out[:] = u2n

        u1x, u1y = fwd_grad(u1n)
        u2x, u2y = fwd_grad(u2n)
        ng1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
        ng2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
        p11_out[:] = (p11_out[:] + taut * u1x) / ng1
        p12_out[:] = (p12_out[:] + taut * u1y) / ng1
        p21_out[:] = (p21_out[:] + taut * u2x) / ng2
        p22_out[:] = (p22_out[:] + taut * u2y) / ng2
        return n + 1, err

    def cond(carry):
        n, err = carry
        return (n < n_iters) & (err > scaled_eps)

    # state inputs are aliased to outputs; nothing to copy first
    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(jnp.inf)))


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def _iteration_block(
    i1wx,
    i1wy,
    grad,
    rho_c,
    u1,
    u2,
    p11,
    p12,
    p21,
    p22,
    l_t: jnp.ndarray,
    theta: jnp.ndarray,
    taut: jnp.ndarray,
    scaled_eps: jnp.ndarray,
    n_iters: int,
    interpret: bool = False,
):
    h, w = u1.shape
    scalars = jnp.stack([l_t, theta, taut, scaled_eps]).astype(jnp.float32)
    niter = jnp.array([n_iters], jnp.int32)
    out_shapes = [jax.ShapeDtypeStruct((h, w), jnp.float32)] * 6
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _iter_kernel,
        out_shape=tuple(out_shapes),
        in_specs=[smem, smem] + [vmem] * 10,
        out_specs=tuple([vmem] * 6),
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3, 10: 4, 11: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES,
        ),
        interpret=interpret,
    )(scalars, niter, i1wx, i1wy, grad, rho_c, u1, u2, p11, p12, p21, p22)


def _fits_vmem(h: int, w: int) -> bool:
    return _VMEM_STATE_ARRAYS * h * w * 4 <= _VMEM_BYTES


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def tvl1_flow_level_pallas(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    params: TVL1Params,
    u3=None,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.tvl1.tvl1_flow_level using the fused
    VMEM-resident iteration kernel. Falls back to the jnp solver when the
    level doesn't fit or gamma is active."""
    h, w = i0.shape
    if params.gamma != 0.0 or not _fits_vmem(h, w):
        return tvl1_flow_level(i0, i1, u1, u2, params, u3=u3)
    if interpret is None:
        interpret = not _on_tpu()

    l_t = jnp.float32(params.lambda_ * params.theta)
    theta = jnp.float32(params.theta)
    taut = jnp.float32(params.tau / params.theta)
    if params.epsilon > 0:
        scaled_eps = jnp.float32(params.epsilon * params.epsilon * h * w)
    else:
        scaled_eps = jnp.float32(-1.0)  # never triggers: run all iterations

    i1x, i1y = centered_gradient(i1)
    zeros = jnp.zeros_like(i0)
    p11 = p12 = p21 = p22 = zeros
    if u3 is None:
        u3 = zeros

    for _ in range(params.warps):
        _, i1wx, i1wy, grad, rho_c = warp_backward(i0, i1, i1x, i1y, u1, u2)
        u1, u2, p11, p12, p21, p22 = _iteration_block(
            i1wx,
            i1wy,
            grad,
            rho_c,
            u1,
            u2,
            p11,
            p12,
            p21,
            p22,
            l_t,
            theta,
            taut,
            scaled_eps,
            params.iterations,
            interpret,
        )
    return u1, u2, u3
