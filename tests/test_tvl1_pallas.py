"""Parity tests: the Pallas fused level solver must match the jnp solver
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow, tvl1_flow_level
from optflow_tpu.ops.tvl1_pallas import tvl1_flow_level_pallas
from tests.conftest import make_fibsem_like
from tests.test_tvl1 import mean_epe, translate


def test_level_parity_with_jnp(rng):
    im0 = make_fibsem_like(rng, 40, 48)
    im1 = translate(im0, 1.0, -0.5)
    params = TVL1Params(nscales=1, warps=2, iterations=25, epsilon=0.0)
    u1 = jnp.zeros((40, 48), jnp.float32)
    u2 = jnp.zeros((40, 48), jnp.float32)
    a1, a2, _ = tvl1_flow_level(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params
    )
    b1, b2, _ = tvl1_flow_level_pallas(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params, interpret=True
    )
    assert np.allclose(np.asarray(a1), np.asarray(b1), atol=1e-4)
    assert np.allclose(np.asarray(a2), np.asarray(b2), atol=1e-4)


def test_level_parity_epsilon_early_exit(rng):
    """With epsilon > 0 both solvers take the same early exit."""
    im0 = make_fibsem_like(rng, 32, 40)
    im1 = translate(im0, 0.5, 0.0)
    params = TVL1Params(nscales=1, warps=1, iterations=100, epsilon=0.05)
    u1 = jnp.zeros((32, 40), jnp.float32)
    u2 = jnp.zeros((32, 40), jnp.float32)
    a1, a2, _ = tvl1_flow_level(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params
    )
    b1, b2, _ = tvl1_flow_level_pallas(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params, interpret=True
    )
    assert np.allclose(np.asarray(a1), np.asarray(b1), atol=1e-4)
    assert np.allclose(np.asarray(a2), np.asarray(b2), atol=1e-4)


def test_full_pyramid_with_pallas_levels(rng):
    im0 = make_fibsem_like(rng, 64, 80)
    im1 = translate(im0, 1.5, 1.0)
    params = TVL1Params(nscales=3, warps=2, iterations=40)

    def solver(i0, i1, u1, u2, p, u3=None):
        return tvl1_flow_level_pallas(i0, i1, u1, u2, p, u3=u3, interpret=True)

    flow = tvl1_flow(
        jnp.asarray(im0), jnp.asarray(im1), params, level_solver=solver
    )
    assert mean_epe(flow, 1.5, 1.0) < 0.3


def test_vmem_fallback_for_large_levels(rng):
    """A level larger than the VMEM budget silently uses the jnp solver."""
    from optflow_tpu.ops import tvl1_pallas as tp

    h = w = 2048  # 16 arrays x 16 MiB >> budget
    assert not tp._fits_vmem(h, w)
    # small fits
    assert tp._fits_vmem(128, 256)
