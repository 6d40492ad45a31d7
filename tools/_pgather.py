"""Profiling scratch: gather/scatter lowering variants at pool scale."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

R = 262144
T, P = 2048, 128


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
    vals2 = vals.reshape(T, P)
    perm = jax.random.permutation(keys[1], R)
    rperm = jax.random.permutation(keys[2], T)
    sperm = jnp.sort(perm[: R // 2])  # mostly-sorted half

    floor = timeit(lambda: jnp.sum(vals), 5, "floor (sum)")

    timeit(lambda: vals[perm], 5, "1d element gather R")
    timeit(lambda: jnp.take(vals, perm), 5, "jnp.take R")
    timeit(lambda: vals2[rperm], 5, "row gather (T,P) T rows")
    timeit(lambda: vals.reshape(R, 1)[perm][:, 0], 5, "(R,1) row gather")
    timeit(lambda: vals[sperm], 5, "sorted half gather")

    # 14-column variant: one (T, P*14) row gather vs 14 element gathers
    wide = jnp.broadcast_to(vals2[:, None, :], (T, 14, P)).reshape(T, 14 * P)
    timeit(lambda: wide[rperm], 5, "row gather (T,14*P)")

    # scatter rows
    timeit(lambda: jnp.zeros((T, P)).at[rperm].set(vals2), 5,
           "row scatter (T,P)")

    # D2H on FRESH arrays (bypass host-copy cache)
    imgs = [jax.random.uniform(jax.random.PRNGKey(i), (512, 512, 3))
            for i in range(3)]
    u8s = [jnp.clip(i * 255, 0, 255).astype(jnp.uint8) for i in imgs]
    for i in imgs:
        i.block_until_ready()
    t0 = time.perf_counter()
    for i in imgs:
        _ = np.asarray(i)
    print(f"D2H fresh f32 3MB: {(time.perf_counter()-t0)/3*1e3:.1f} ms",
          flush=True)
    t0 = time.perf_counter()
    for u in u8s:
        _ = np.asarray(u)
    print(f"D2H fresh u8 768KB: {(time.perf_counter()-t0)/3*1e3:.1f} ms",
          flush=True)
    scals = [jnp.float32(i) + vals[0] for i in range(3)]
    _ = [s.block_until_ready() for s in scals]
    t0 = time.perf_counter()
    for s in scals:
        _ = np.asarray(s)
    print(f"D2H fresh scalar: {(time.perf_counter()-t0)/3*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
