"""Synthetic probe: does issuing TWO independent node-row gathers per
while-loop iteration cost meaningfully less than two iterations of one?

The packet loop is gather-latency-bound at big trees (ARCHITECTURE.md
rules 21/29: FUSED_ROWS won by deleting the serially-dependent second
gather).  A dual-front walk would process two independent stack nodes
per iteration — one (2B,)-indexed gather + F-axis-batched math — and
halve iterations.  This probe times the atoms WITHOUT building the
engine:

  A: while_loop, 2N iters, body = one (B,96) row gather (data-dependent
     chained index) + rule-21-scale elementwise chain at (8,B,P)
  B: while_loop, N iters, body = one (2B,96) gather (two chained index
     lanes) + the same chain at (8,2B,P)
  C: while_loop, N iters, body = two SEPARATE (B,96) gathers + chain
     at (8,2B,P)  (does XLA overlap the two gathers?)

If B (or C) lands near 0.5x A, the dual-front engine pays ~2x on
bounce waves.  If near 1.0x A, per-iteration cost scales with gathered
rows and the idea is dead.

Usage: python tools/exp_dualfront.py [--b 1024] [--p 32] [--iters 2048]
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


def chain(rowt, ox, n_ops_scale=1):
    """Elementwise op chain shaped like the slab test: (C, B*, P) from
    per-row fields (B*,) against ray lanes (B*, P)."""
    g = [rowt[k][:, None] for k in range(12)]
    acc = ox * 0.0
    for c in range(8):
        t1 = (g[c % 12] - ox) * g[(c + 1) % 12]
        t2 = (g[(c + 2) % 12] + ox) * g[(c + 3) % 12]
        acc = acc + jnp.minimum(jnp.maximum(t1, t2),
                                jnp.maximum(-t1, -t2))
    return acc


def make_loop(table, b, p, n_iters, fronts, split_gather):
    n = table.shape[0]

    def body(state):
        node, acc, i = state
        if split_gather:
            # two separate (B, 96) gathers on independent index lanes
            r0 = table[node[:b]].T
            r1 = table[node[b:]].T
            rowt = jnp.concatenate([r0, r1], axis=1)
        else:
            rowt = table[node].T          # (96, fronts*b)
        acc = acc + chain(rowt, acc)
        # data-dependent next index (serializes iterations like a walk)
        nxt = (node * 1664525 + 1013904223
               + jnp.sum(rowt[0]).astype(jnp.int32)) % n
        return nxt, acc, i + 1

    def cond(state):
        return state[2] < n_iters

    def run(node0):
        acc0 = jnp.zeros((fronts * b, p), jnp.float32)
        node, acc, _ = jax.lax.while_loop(
            cond, body, (node0, acc0, jnp.int32(0)))
        return acc.sum() + node.sum()

    return jax.jit(run)


def timeit(fn, arg, reps=3):
    sync(fn(arg))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(arg))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--p", type=int, default=32)
    ap.add_argument("--n-nodes", type=int, default=29140)
    ap.add_argument("--iters", type=int, default=2048)
    a = ap.parse_args()

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((a.n_nodes, 96), np.float32))
    sync(table[:1, :1])  # flip axon into sync mode before timing

    n1 = jnp.asarray(rng.integers(0, a.n_nodes, a.b).astype(np.int32))
    n2 = jnp.asarray(rng.integers(0, a.n_nodes, 2 * a.b).astype(np.int32))

    fa = make_loop(table, a.b, a.p, 2 * a.iters, 1, False)
    fb = make_loop(table, a.b, a.p, a.iters, 2, False)
    fc = make_loop(table, a.b, a.p, a.iters, 2, True)

    ta = timeit(fa, n1)
    tb = timeit(fb, n2)
    tc = timeit(fc, n2)
    print(f"B={a.b} P={a.p} iters={a.iters} nodes={a.n_nodes}")
    print(f"A  1 front , {2*a.iters} iters: {ta*1e3:8.1f} ms "
          f"({ta/2/a.iters*1e6:6.2f} us/iter)")
    print(f"B  2 fronts, {a.iters} iters (one 2B gather): {tb*1e3:8.1f} ms "
          f"({tb/a.iters*1e6:6.2f} us/iter)  ratio vs A: {tb/ta:.2f}")
    print(f"C  2 fronts, {a.iters} iters (two B gathers): {tc*1e3:8.1f} ms "
          f"({tc/a.iters*1e6:6.2f} us/iter)  ratio vs A: {tc/ta:.2f}")


if __name__ == "__main__":
    main()
