"""Profiling scratch: what in the frame epilogue costs 54 ms/frame?"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from vortex_rt_tpu.engine.wavefront import _resolve_tiled  # noqa: E402

R = 262144
W = H = 512
K = 16


def timeit(f, label, n=3):
    out = f(0)
    _ = np.asarray(jax.tree.leaves(out)[-1]).reshape(-1)[:1]
    t0 = time.perf_counter()
    outs = [f(i) for i in range(n)]
    _ = np.asarray(jax.tree.leaves(outs[-1])[-1]).reshape(-1)[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms/call ({dt/K*1e3:.2f} ms/frame)",
          flush=True)


def main():
    lanes = jnp.arange(R, dtype=jnp.float32)

    @jax.jit
    def resolve_k(seed):
        def one(s):
            return jnp.stack([
                _resolve_tiled(lanes + s + c, W, H, 1, 16, 8).reshape(R)
                for c in range(3)])
        return jax.lax.map(one, seed + jnp.arange(K))

    timeit(resolve_k, "resolve x16 (tile transpose)")

    @jax.jit
    def noresolve_k(seed):
        def one(s):
            return jnp.stack([lanes + s + c for c in range(3)])
        return jax.lax.map(one, seed + jnp.arange(K))

    timeit(noresolve_k, "no-resolve x16 (plane stack only)")

    @jax.jit
    def hwc_final(seed):
        planes = jnp.stack([lanes + seed + c for c in range(3)])
        return planes.reshape(3, H, W).transpose(1, 2, 0)

    timeit(hwc_final, "one (H,W,3) materialize")

    # stacked per-frame (n_pix, 3) images (the round-1 shape)
    @jax.jit
    def hwc_k(seed):
        def one(s):
            return jnp.stack([lanes + s + c for c in range(3)], axis=-1)
        return jax.lax.map(one, seed + jnp.arange(K))

    timeit(hwc_k, "x16 (n_pix, 3) stack")


if __name__ == "__main__":
    main()
