"""Persistent XLA compilation cache.

The Pallas TV-L1 path compiles one program per (pyramid level shape,
batch) and the feature pre-aligner is a single large program; a cold
process pays minutes of compilation before the first solve (the reference
binary has the same cold-start shape in its OpenCV CUDA module builds,
just at build time). JAX's persistent cache keyed on (HLO, compiler
version, platform) makes every process after the first start warm; this
helper turns it on with one call from all entry points (CLI, bench
drivers, tests, pod runner).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "optflow_tpu_xla"
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently enable the on-disk XLA compilation cache.

    Respects an explicit JAX_COMPILATION_CACHE_DIR from the environment;
    otherwise uses ``~/.cache/optflow_tpu_xla`` (override with ``path``).
    Returns the directory in use.
    """
    import jax

    cache_dir = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR") or path or _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that takes noticeable time; tiny programs are
    # cheap to recompile and would only churn the directory.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
    return cache_dir
