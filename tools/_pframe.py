"""Profiling scratch: frame-component costs on the real chip.

Measures argsort/scatter/resolve/D2H costs that make up the non-trace part
of the wavefront frame at 512x512 (R=262144).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

R = 262144


def timeit(f, n=5, label=""):
    out = f()
    _ = np.asarray(jax.tree.leaves(out)[-1]).reshape(-1)[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    _ = np.asarray(jax.tree.leaves(out)[-1]).reshape(-1)[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4)
    vals = jax.random.uniform(keys[0], (R,))
    ints = jax.random.randint(keys[1], (R,), 0, 1 << 30)
    img = jax.random.uniform(keys[2], (512, 512, 3))
    perm = jax.random.permutation(keys[3], R)

    # baseline: noop dispatch + tiny D2H (the fixed cost floor)
    timeit(jax.jit(lambda v: v.sum()).lower(vals).compile().__call__ if False
           else (lambda: jnp.sum(vals)), 5, "sum (fixed floor)")

    timeit(lambda: jnp.argsort(ints, stable=True), 5, "argsort i32 R")
    timeit(lambda: jnp.zeros(R, jnp.int32).at[perm].set(
        jnp.arange(R, dtype=jnp.int32)), 5, "inv-perm scatter")
    timeit(lambda: jnp.zeros(R).at[perm].add(vals), 5, "scatter-add f32")
    timeit(lambda: vals[perm], 5, "gather f32 R")

    # D2H costs: f32 image vs u8 image vs scalar
    def d2h(x, label):
        _ = np.asarray(x)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = np.asarray(x)
        print(f"D2H {label}: {(time.perf_counter()-t0)/3*1e3:.1f} ms",
              flush=True)

    u8 = jnp.clip(img * 255, 0, 255).astype(jnp.uint8)
    d2h(jnp.float32(1.0), "scalar")
    d2h(img, "img f32 3MB")
    d2h(u8, "img u8 768KB")

    # 8 argsorts of different sizes (compaction alternatives)
    half = jax.random.randint(keys[1], (R // 8,), 0, 1 << 30)
    timeit(lambda: jnp.argsort(half, stable=True), 5, "argsort i32 R/8")

    # cumsum-based compaction (prefix sum + scatter) alternative
    @jax.jit
    def compact(alive, v):
        pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
        dst = jnp.where(alive, pos, R - 1 - (jnp.arange(R) - pos))
        return jnp.zeros_like(v).at[dst].set(v)

    alive = vals > 0.5
    timeit(lambda: compact(alive, vals), 5, "cumsum+scatter compact 1 lane")


if __name__ == "__main__":
    main()
