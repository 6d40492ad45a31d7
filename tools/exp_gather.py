"""Scaling law of the data-dependent row gather — the packet loop's
dominant cost.

The dualfront probe (tools/exp_dualfront.py, rule 32) put the config-3
loop body at ~20 us gather + ~14.5 us chain per iteration at B=1024
row gathers of 96 f32 — i.e. the frame's ~130M row gathers
(artifacts/profile_cfg3.json int+tri steps) are ~2.6 s of its 2.4-2.7 s
wall.  Whether that cost scales with BYTES PER ROW (then: compress the
fused row) or is FLAT PER ROW (then: only row count matters) decides
the next lever.  This probe times a chained (data-dependent, like a
real walk: next index derived from gathered words) row gather in a
while_loop across row widths, batch sizes, and pool sizes, plus a
transposed-pool variant (gather along the LANE axis, the layout the
TPU can in principle serve with its dynamic lane-select path).

Usage: python tools/exp_gather.py [--iters 2048] [--n 29140]
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


def sync(x):
    return np.asarray(jax.device_get(x))


def time_case(pool, idx0, iters, mode, reps=3):
    n = pool.shape[0] if mode == "rows" else pool.shape[1]

    @jax.jit
    def run(pool, idx0):
        def body(st):
            i, idx, acc = st
            if mode == "rows":
                rows = pool[idx]                      # (B, W)
                key = rows[:, 0] + rows[:, -1]
            else:
                rows = pool[:, idx]                   # (W, B)
                key = rows[0] + rows[-1]
            # data-dependent next index (defeats prefetch/hoist)
            nidx = (idx * 1103515245 + 12345
                    + key.astype(jnp.int32)) % n
            return i + 1, jnp.abs(nidx), acc + key.sum()
        _, idx, acc = jax.lax.while_loop(
            lambda st: st[0] < iters, body,
            (jnp.int32(0), idx0, jnp.float32(0)))
        return acc + idx.sum().astype(jnp.float32) * 1e-30

    sync(run(pool, idx0))  # compile + first
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(pool, idx0))
        best = min(best, time.perf_counter() - t0)
    return best


def time_depth(pool, idx0, iters, depth, reps=3):
    """D CHAINED gathers inside ONE while iteration (manual unroll).

    Decides whether rule 33's ~13 us/iteration floor is per-WHILE-
    ITERATION machinery (then cost(D) ~ 13 + D*eps and unrolling the
    packet walk body divides the floor by D) or per-GATHER dependency
    latency (then cost(D) ~ D*13 and unroll buys nothing)."""
    n = pool.shape[0]

    @jax.jit
    def run(pool, idx0):
        def body(st):
            i, idx, acc = st
            for _ in range(depth):
                rows = pool[idx]
                key = rows[:, 0] + rows[:, -1]
                idx = jnp.abs((idx * 1103515245 + 12345
                               + key.astype(jnp.int32)) % n)
                acc = acc + key.sum()
            return i + 1, idx, acc
        _, idx, acc = jax.lax.while_loop(
            lambda st: st[0] < iters, body,
            (jnp.int32(0), idx0, jnp.float32(0)))
        return acc + idx.sum().astype(jnp.float32) * 1e-30

    sync(run(pool, idx0))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(pool, idx0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2048)
    ap.add_argument("--n", type=int, default=29140)
    ap.add_argument("--widths", default="16,32,64,96,160")
    ap.add_argument("--batches", default="256,1024,4096")
    ap.add_argument("--depths", default="",
                    help="sweep chained gathers per while iteration "
                         "(e.g. 1,2,4,8); W=96 only")
    a = ap.parse_args()

    if a.depths:
        rng = np.random.default_rng(0)
        print(f"backend={jax.default_backend()} n_pool={a.n} "
              f"iters={a.iters} depth sweep", flush=True)
        pool = jnp.asarray(
            rng.standard_normal((a.n, 96), dtype=np.float32))
        for b in (int(x) for x in a.batches.split(",")):
            idx0 = jnp.asarray(rng.integers(0, a.n, b, dtype=np.int32))
            for d in (int(x) for x in a.depths.split(",")):
                it = max(a.iters // d, 64)
                dt = time_depth(pool, idx0, it, d)
                us = dt / it * 1e6
                print(f"depth B={b:5d} D={d:2d}: {us:8.2f} us/iter, "
                      f"{us/d:8.2f} us/gather-step", flush=True)
        return

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n_pool={a.n} "
          f"iters={a.iters}", flush=True)
    for b in (int(x) for x in a.batches.split(",")):
        idx0 = jnp.asarray(rng.integers(0, a.n, b, dtype=np.int32))
        for w in (int(x) for x in a.widths.split(",")):
            pool = jnp.asarray(
                rng.standard_normal((a.n, w), dtype=np.float32))
            dt = time_case(pool, idx0, a.iters, "rows")
            us = dt / a.iters * 1e6
            print(f"rows  B={b:5d} W={w:4d}: {us:8.2f} us/iter "
                  f"({us/b*1000:7.2f} ns/row, "
                  f"{b*w*4/us/1e3:7.2f} GB/s)", flush=True)
        # transposed layout, one width
        w = 96
        poolT = jnp.asarray(
            rng.standard_normal((w, a.n), dtype=np.float32))
        dt = time_case(poolT, idx0, a.iters, "lanes")
        us = dt / a.iters * 1e6
        print(f"lanes B={b:5d} W={w:4d}: {us:8.2f} us/iter "
              f"({us/b*1000:7.2f} ns/row, "
              f"{b*w*4/us/1e3:7.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
