#!/usr/bin/env python
"""Benchmark driver: TV-L1 throughput + EPE on the target accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: megapixel image-pairs/s per chip for coarse-to-fine TV-L1
at the reference's default parameters (tau=.25, lambda=.05, theta=.3,
nscales=10, warps=5, iterations=300, eps=.01, scaleStep=.8 — the exact
defaults of src/optflow.cpp:503-512). The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against a 1.0 MP-pairs/s nominal
target; the EPE gate (<=0.5 px, driver target) is checked alongside.

Robustness notes (learned on the harness's TPU tunnel):
  - the FIRST execution of a freshly compiled large program can take
    minutes and occasionally crashes/restarts the remote TPU worker; the
    bench therefore warms up patiently and retries the whole measurement
    from scratch (fresh input upload) on JaxRuntimeError.
  - device->host traffic is kept to scalars: EPE is reduced on device and
    timing reps sync on a single-element readback.
"""

import json
import sys
import time

import numpy as np

H, W = 256, 1024  # production-representative strip geometry (SURVEY.md §6)
# Batch size: production jobs stream thousands of pairs (5000/job file,
# gen_cross_file_list.py:118-119), so a 16-pair device batch is the
# realistic granularity; it also amortizes the harness tunnel's per-batch
# dispatch latency, which otherwise hides the kernel's speed entirely.
BATCH = 16
DX, DY = 2.0, -1.25
REPS = 5
ATTEMPTS = 3


def make_pair(h, w, dx, dy, seed=0):
    """Synthetic FIB-SEM-like pair with known ground-truth flow (dx, dy)."""
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((h, w))
    tex = ndi.gaussian_filter(base, 2.0)
    lowf = ndi.gaussian_filter(rng.standard_normal((h, w)), 18.0)
    im = tex * 2.0 + lowf * 4.0
    im = (im - im.min()) / (np.ptp(im) + 1e-9)
    im0 = (20.0 + 215.0 * im).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    im1 = ndi.map_coordinates(
        im0, [ys - dy, xs - dx], order=3, mode="nearest"
    ).astype(np.float32)
    return im0, im1


def _oracle_flow():
    """Committed golden flow for pair seed=0 at the production shape,
    solved once by the independent IPOL oracle (tests/reference_tvl1.py)
    at the reference-default parameters. Gates the bench EPE against the
    reference *algorithm* (BASELINE.md definition), not just synthetic
    constant-translation truth."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests",
        "fixtures",
        "golden_oracle_256x1024.npz",
    )
    try:
        d = np.load(path)
        if float(d["dx"]) == DX and float(d["dy"]) == DY and int(d["seed"]) == 0:
            return d["flow"]
        print(
            f"bench: oracle fixture {path} metadata mismatch "
            f"(dx={float(d['dx'])}, dy={float(d['dy'])}, seed={int(d['seed'])}) "
            f"— oracle EPE gate DISABLED",
            file=sys.stderr,
            flush=True,
        )
    except Exception as e:
        print(
            f"bench: oracle fixture {path} failed to load ({e!r}) "
            f"— oracle EPE gate DISABLED",
            file=sys.stderr,
            flush=True,
        )
    return None


def _measure(i0_np, i1_np):
    """One full measurement attempt. Raises on TPU worker failure."""
    import jax
    import jax.numpy as jnp

    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.ops.tvl1 import tvl1_flow_batched

    params = TVL1Params()  # reference defaults

    # Nudge the worker awake with a trivial program before the big one.
    _ = float(jnp.ones((8, 128)).sum())

    i0 = jnp.asarray(i0_np)
    i1 = jnp.asarray(i1_np)

    @jax.jit
    def epe_of(flow):
        m = 16
        inner = flow[:, m:-m, m:-m, :]
        return jnp.sqrt(
            (inner[..., 0] - DX) ** 2 + (inner[..., 1] - DY) ** 2
        ).mean()

    def solve_and_epe(a, b):
        # production path: one fused Pallas kernel per pyramid level,
        # orchestrated eagerly (see ops/tvl1_pallas.py;
        # OPTFLOW_TPU_SINGLETON_LEVELS=1 / OPTFLOW_TPU_FUSED=0 select
        # fallbacks). All dispatches are async; only two scalars cross
        # the tunnel. repair_contract=False: the public API's default
        # shift-warp repair check would sync every call and serialize
        # the steady-state loop; the bench reports the violation
        # telemetry explicitly instead (shift_warp_fallback_sweeps — 0
        # on this workload, so there is nothing to repair).
        flow = tvl1_flow_batched(i0, i1, params, repair_contract=False)
        return flow[0, 0, 0, 0], epe_of(flow)

    # Warmup: compiles every level program; the first execution can be
    # pathologically slow on the tunnel, so do it twice for steady state.
    _, epe_dev = solve_and_epe(i0, i1)
    epe = float(epe_dev)
    # Production-shape oracle parity: EPE of pair 0's flow against the
    # committed IPOL-oracle golden (full 10-level pyramid at 256x1024).
    # Reuses pair 0 of the batch-16 solve instead of compiling a second
    # N=1 program chain. Note the fused path stacks images at coarse
    # levels and iterates until the SLOWEST stacked image converges, so
    # pair 0 can receive extra iterations relative to a batch-1 solve —
    # extra iterations only tighten convergence, well inside the 0.5 px
    # gate (measured drift: 0.0455 -> 0.0459 px).
    epe_oracle = None
    oracle = _oracle_flow()
    if oracle is not None:
        flow0 = np.asarray(tvl1_flow_batched(i0, i1, params)[0])
        m = 16
        diff = flow0[m:-m, m:-m] - oracle[m:-m, m:-m]
        epe_oracle = float(
            np.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2).mean()
        )
    s, _ = solve_and_epe(i0, i1)
    _ = float(s)

    import os

    from optflow_tpu.utils.metrics import profiler_trace

    times = []
    # OPTFLOW_TPU_PROFILE_DIR: capture a jax.profiler trace of the timed
    # reps (inspect with TensorBoard/xprof)
    with profiler_trace(os.environ.get("OPTFLOW_TPU_PROFILE_DIR")):
        for _ in range(REPS):
            t0 = time.perf_counter()
            s, _ = solve_and_epe(i0, i1)
            _ = float(s)  # sync
            times.append(time.perf_counter() - t0)
        # steady-state: enqueue REPS batches back-to-back and sync once —
        # the production regime (jobs stream thousands of pairs), which
        # amortizes the per-sync tunnel roundtrip (~32 ms measured) that
        # the latency loop above pays once per batch. The device runs
        # programs in order, so the last batch's scalar implies all done.
        t0 = time.perf_counter()
        outs = [solve_and_epe(i0, i1)[0] for _ in range(REPS)]
        _ = float(outs[-1])
        dt_ss = (time.perf_counter() - t0) / REPS
    dt_lat = float(np.median(times))

    # MFU: exact useful-iteration count from the fused kernel's per-level
    # telemetry (epsilon early-exit makes it data-dependent), times the
    # counted ~82 VPU flops per pixel-iteration, against the v5e VPU peak
    # (8x128 lanes x 4 ALUs x ~1.5 GHz ~= 6.1 Tf32op/s; clock inferred
    # from the chip's published 197 bf16 TFLOPs over 4 MXUs).
    mfu = None
    px_iters = None
    try:
        from optflow_tpu.ops.tvl1_pallas import (
            ITER_FLOPS_PER_PX,
            get_last_iteration_stats,
        )

        stats = get_last_iteration_stats()
        if stats:
            px_iters = sum(
                h_ * w_ * float(np.asarray(its).sum())
                for (h_, w_), its in stats
            )
            mfu = px_iters * ITER_FLOPS_PER_PX / dt_ss / 6.1e12
    except Exception as e:  # telemetry must never sink the bench
        print(f"bench: MFU telemetry failed: {e!r}", file=sys.stderr)
    return dt_ss, dt_lat, epe, epe_oracle, mfu, px_iters


def main():
    import jax

    from optflow_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    dev = jax.devices()[0]
    platform = dev.platform

    pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(BATCH)]
    i0_np = np.stack([p[0] for p in pairs])
    i1_np = np.stack([p[1] for p in pairs])

    import os

    last_err = None
    for attempt in range(ATTEMPTS + 1):
        if attempt == ATTEMPTS - 1:
            # penultimate attempt: keep Pallas but drop the multi-level
            # fused canvas-group programs (the shape that faulted the r2
            # worker) for one-kernel-per-program singleton levels, so an
            # intermittent fused-program fault still records a Pallas
            # number (advisor r3 medium).
            os.environ["OPTFLOW_TPU_SINGLETON_LEVELS"] = "1"
            print(
                "bench: retrying with singleton-level Pallas programs",
                file=sys.stderr,
                flush=True,
            )
        if attempt == ATTEMPTS:
            # final fallback: the XLA level solver (slower but sturdy) so
            # the round always records a number; the JSON labels the path
            os.environ["OPTFLOW_TPU_DISABLE_PALLAS"] = "1"
            print(
                "bench: falling back to the XLA level solver",
                file=sys.stderr,
                flush=True,
            )
        try:
            dt, dt_lat, epe, epe_oracle, mfu, px_iters = _measure(
                i0_np, i1_np
            )
            break
        except Exception as e:  # worker crash/restart: retry from scratch
            last_err = e
            print(
                f"bench attempt {attempt + 1} failed: {e!r}; retrying",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(15)
    else:
        raise SystemExit(f"bench failed after {ATTEMPTS} attempts: {last_err!r}")

    mp_pairs_per_s = BATCH * (H * W / 1e6) / dt

    from optflow_tpu.ops.tvl1_pallas import pallas_enabled

    result = {
        "metric": "megapixel image-pairs/s per chip (TV-L1, ref defaults)",
        "value": round(mp_pairs_per_s, 4),
        "unit": "MP-pairs/s",
        "vs_baseline": round(mp_pairs_per_s / 1.0, 4),
        "epe_px": round(epe, 4),
        "epe_target_px": 0.5,
        "epe_ok": epe <= 0.5,
        # EPE vs the committed IPOL-oracle golden flow at the production
        # shape (full 10-level pyramid) — the BASELINE.md parity metric.
        "epe_vs_oracle_px": (
            round(epe_oracle, 4) if epe_oracle is not None else None
        ),
        "oracle_epe_ok": (
            epe_oracle <= 0.5 if epe_oracle is not None else None
        ),
        "platform": platform,
        "kernel": "pallas" if pallas_enabled() else "xla",
        "shape": [BATCH, H, W],
        # steady-state (pipelined batches, the production regime) and
        # single-batch latency (includes one ~32 ms tunnel sync)
        "seconds_per_batch": round(dt, 4),
        "latency_s_per_batch": round(dt_lat, 4),
        # model flop utilization of the primal-dual iteration work
        # against the v5e VPU peak (see _measure), plus the measured
        # useful pixel-iterations per batch (epsilon-exit dependent)
        "mfu": round(mfu, 4) if mfu is not None else None,
        "gpx_iters_per_batch": (
            round(px_iters / 1e9, 3) if px_iters is not None else None
        ),
        "shift_warp_fallback_sweeps": _fallback_sweeps(),
    }
    print(json.dumps(result))


def _fallback_sweeps():
    try:
        from optflow_tpu.ops.tvl1_pallas import get_last_fallback_sweeps

        return get_last_fallback_sweeps()
    except Exception:
        return None


if __name__ == "__main__":
    main()
