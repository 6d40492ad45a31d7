"""Persistent XLA compilation cache management.

The axon TPU backend's compiler is nondeterministically pathological for
the traversal program: identical HLO compiles in ~2 s into a ~0.1 ms/chunk
binary, or in minutes into a ~100x slower one (see ops/traverse_wide.py).
The persistent compilation cache turns a single good draw into a permanent
artifact; runtime.warmup re-rolls bad draws in disposable subprocesses.
"""

from __future__ import annotations

import glob
import os

_DEFAULT = os.path.expanduser(
    os.environ.get("VORTEX_RT_CACHE", "~/.cache/vortex_rt_tpu/jax"))
_enabled = False


def enable_persistent_cache(path: str = _DEFAULT) -> str:
    """Idempotently point JAX at the on-disk compilation cache."""
    global _enabled
    import jax

    os.makedirs(path, exist_ok=True)
    if not _enabled:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return path


def cache_dir() -> str:
    return _DEFAULT


def drop_entries(name_prefix: str, path: str = _DEFAULT) -> int:
    """Delete cached executables whose key starts with ``jit_<prefix>`` —
    used to evict a slow-compiled traversal binary before re-rolling."""
    n = 0
    for f in glob.glob(os.path.join(path, f"jit_{name_prefix}*")):
        try:
            os.remove(f)
            n += 1
        except OSError:
            pass
    return n
