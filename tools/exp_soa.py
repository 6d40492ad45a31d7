"""Layout probe: (T,3) AoS vs per-axis (T,) SoA for the refit chain.

Hypothesis (from refit stage timings at 1M tris): every (T,3) f32 op
pays the TPU (8,128) tile pad on the minor axis (3 -> 128 lanes, ~42x
physical traffic), which would explain `move` costing 25 ms for 72 MB
of logical traffic.  If SoA columns run ~10-40x faster, the refit path
(boxes pyramid, child-box gathers, vertex ripple) should be rewritten
per-axis; if they tie, XLA already re-layouts and the lever is dead.

Usage: python tools/exp_soa.py [--t 999700] [--reps 8]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{label:28s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=999700)
    ap.add_argument("--reps", type=int, default=8)
    a = ap.parse_args()
    t = a.t
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((t, 3), dtype=np.float32))
    x, y, z = (jnp.asarray(np.asarray(v[:, k])) for k in range(3))
    idx = jnp.asarray(rng.integers(0, t, t, dtype=np.int32))
    np.asarray(x[:1])  # sync mode
    print(f"t={t} backend={jax.default_backend()}", flush=True)

    # 1. the ripple move: update one coordinate from the other two
    @jax.jit
    def move_aos(v, tt):
        f = 0.3 * jnp.sin(0.7 * v[:, 0] + 2.1 * tt) \
            * jnp.cos(0.5 * v[:, 2] - 1.3 * tt)
        return v.at[:, 1].set(v[:, 1] + f)

    @jax.jit
    def move_soa(x, y, z, tt):
        f = 0.3 * jnp.sin(0.7 * x + 2.1 * tt) * jnp.cos(0.5 * z - 1.3 * tt)
        return y + f

    bench("move AoS (T,3)", move_aos, v, jnp.float32(0.3), reps=a.reps)
    bench("move SoA 3x(T,)", move_soa, x, y, z, jnp.float32(0.3),
          reps=a.reps)

    # 2. one pyramid level: elementwise min of shifted slices
    @jax.jit
    def pyr_aos(v):
        return jnp.minimum(v[: t - 8], v[8: t])

    @jax.jit
    def pyr_soa(x, y, z):
        return (jnp.minimum(x[: t - 8], x[8: t]),
                jnp.minimum(y[: t - 8], y[8: t]),
                jnp.minimum(z[: t - 8], z[8: t]))

    bench("pyramid level AoS", pyr_aos, v, reps=a.reps)
    bench("pyramid level SoA", pyr_soa, x, y, z, reps=a.reps)

    # 3. random row gather (the child-box / leaf-slot fetch shape)
    @jax.jit
    def gath_aos(v, idx):
        return v[idx]

    @jax.jit
    def gath_soa(x, y, z, idx):
        return x[idx], y[idx], z[idx]

    bench("gather (T,)->(T,3) AoS", gath_aos, v, idx, reps=a.reps)
    bench("gather 3x(T,) SoA", gath_soa, x, y, z, idx, reps=a.reps)

    # 4. the one-time column extraction cost (AoS -> SoA entry toll)
    @jax.jit
    def split_cols(v):
        return v[:, 0], v[:, 1], v[:, 2]

    bench("column extract (T,3)->3x(T,)", split_cols, v, reps=a.reps)


if __name__ == "__main__":
    main()
