"""Distributed global stack alignment: edge-sharded CG over a device mesh.

The single-device solver (align/global_solve.py) builds the match-graph
normal equations and runs preconditioned CG; for pod-scale stacks
(thousands of sections, millions of matches — the Sec26 VNC production
graph spans z=1..9604 at z-distance <= 3, docs/example_gen_cross:1) the
edge set is sharded across the mesh's ``pairs`` axis and each CG matvec
reduces partial gather/scatter contributions with a psum — the
collectives-first structure SURVEY.md §2.4 prescribes for the z-axis
("sequence") dimension. The per-section state (Z, 2) is small and kept
replicated; only the O(edges) work distributes.

Matvec per shard: diff = t[a] - t[b] on local edges; scatter-add into a
local (Z, 2) accumulator; psum over the mesh -> identical full matvec on
every device. The result is numerically the same solve as the
single-device path (tested for agreement).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optflow_tpu.align.global_solve import (
    AlignmentResult,
    _cg,
    _collect_edges,
)


def solve_translation_alignment_sharded(
    matches: Sequence[dict],
    mesh: Mesh,
    axis_name: str = "pairs",
    iters: int = 200,
    tol: float = 1e-6,
) -> AlignmentResult:
    """Edge-sharded equivalent of solve_translation_alignment."""
    group_ids, a_idx, b_idx, p, q, w = _collect_edges(matches)
    z = len(group_ids)
    if z == 0 or len(w) == 0:
        return AlignmentResult(group_ids, np.zeros((z, 2, 3), np.float32), 0.0)

    n_shards = mesh.shape[axis_name]
    m = len(w)
    m_pad = -(-m // n_shards) * n_shards

    def pad(x, fill=0):
        out = np.full((m_pad,) + x.shape[1:], fill, x.dtype)
        out[:m] = x
        return out

    # padding edges carry weight 0 -> no contribution
    a_p = pad(a_idx)
    b_p = pad(b_idx)
    w_p = pad(w.astype(np.float32))
    d_p = pad((q - p).astype(np.float32))

    pin = 2.0 * float(np.sum(w)) + 1.0

    def shard_solve(a_s, b_s, w_s, d_s):
        # every device sees its own edge shard; t is replicated
        def matvec(t):
            diff = t[a_s] - t[b_s]
            out = jnp.zeros((z, 2))
            out = out.at[a_s].add(w_s[:, None] * diff)
            out = out.at[b_s].add(-w_s[:, None] * diff)
            out = jax.lax.psum(out, axis_name)
            out = out.at[0].add(pin * t[0])
            return out

        rhs = jnp.zeros((z, 2))
        rhs = rhs.at[a_s].add(w_s[:, None] * d_s)
        rhs = rhs.at[b_s].add(-w_s[:, None] * d_s)
        rhs = jax.lax.psum(rhs, axis_name)

        deg = jnp.zeros((z,))
        deg = deg.at[a_s].add(w_s)
        deg = deg.at[b_s].add(w_s)
        deg = jax.lax.psum(deg, axis_name)
        deg = deg.at[0].add(pin)
        M_inv = (1.0 / jnp.maximum(deg, 1e-9))[:, None] * jnp.ones((1, 2))
        return _cg(matvec, rhs, M_inv, iters, tol)

    spec = P(axis_name)
    fn = jax.shard_map(
        shard_solve,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=P(),  # replicated result
        check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)
    t = fn(
        jax.device_put(jnp.asarray(a_p), sharding),
        jax.device_put(jnp.asarray(b_p), sharding),
        jax.device_put(jnp.asarray(w_p), sharding),
        jax.device_put(jnp.asarray(d_p), sharding),
    )
    t_np = np.asarray(t)

    transforms = np.tile(
        np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (z, 1, 1)
    )
    transforms[:, 0, 2] = t_np[:, 0]
    transforms[:, 1, 2] = t_np[:, 1]
    res = (p + t_np[a_idx]) - (q + t_np[b_idx])
    rms = float(np.sqrt((res**2).sum(axis=1).mean()))
    return AlignmentResult(group_ids, transforms, rms)
