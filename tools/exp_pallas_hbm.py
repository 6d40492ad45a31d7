"""Pallas HBM-resident node-walk microbenchmark (VERDICT r4 #4).

Question: can a Mosaic per-packet scalar walk with HBM-RESIDENT tables
(the only form that reaches config-3+ scene sizes — VMEM caps at ~40k
tris) compete with the XLA packet engine's amortized chained gather?

The walk's memory shape is a chained, data-dependent row fetch: node i's
record determines node i+1.  In Mosaic that is a scalar-indexed
``make_async_copy`` (HBM -> VMEM scratch) per step whose latency cannot
be prefetched (the address IS the previous step's payload).  Rule 28
measured ~1 us for this shape at one outstanding copy; the open question
was whether K INTERLEAVED walks per program (the RTU's warp-buffer
latency-hiding trick, rt_sim.cpp warp scheduling) amortize it enough.

This benchmark measures exactly that, on a pool sized like config 3's
fused table (~29k rows x 128 words = 15 MB, HBM-only):

* serial: one chained walk, T steps, ns/step = raw DMA latency;
* interleaved-K: K independent chained walks sharing one program, K
  copies in flight per iteration -> ns/step/walk = amortized latency.

The XLA packet engine's comparison number (rule 33): a (B,)-row batched
gather costs ~13 us / B + ~2.5 ns/row — at the adopted B=8192 that is
~4 ns/row.  The Mosaic walk must land near that to matter.

Usage: python tools/exp_pallas_hbm.py [--rows 29140] [--steps 2000]
       [--ks 1,4,8,16,32]
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

from functools import partial

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE = True
except Exception:
    HAVE = False

W = 128  # row words (config-3 fused rows are 96; rule 33: width <=128
         # pads to one (8,128) tile row either way)


def _walk_kernel(tab_ref, out_ref, scratch, sems, steps: int, k: int,
                 n: int):
    """k interleaved chained walks; each step DMAs each walk's current
    row HBM->VMEM, waits all, reads word 0 as the next index."""

    def body(t, idxs):
        # start all k copies (addresses from the PREVIOUS step's rows)
        for j in range(k):
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(idxs[j], 1)], scratch.at[j],
                sems.at[j]).start()
        nxt = []
        for j in range(k):
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(idxs[j], 1)], scratch.at[j],
                sems.at[j]).wait()
            nxt.append(scratch[j, 0, 0])
        return tuple(nxt)

    init = tuple(jnp.int32(j * (n // max(k, 1))) for j in range(k))
    final = jax.lax.fori_loop(0, steps, body, init)
    acc = final[0]
    for j in range(1, k):
        acc = acc + final[j]
    out_ref[0] = acc  # anti-DCE


@partial(jax.jit, static_argnames=("steps", "k"))
def run_walks(tab, steps: int, k: int):
    n = tab.shape[0]
    kern = partial(_walk_kernel, steps=steps, k=k, n=n)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # stays in HBM
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((k, 1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((k,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tab)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=29140)  # config-3 pool
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--ks", default="1,4,8,16,32")
    a = ap.parse_args()
    assert HAVE, "pallas unavailable"

    rng = np.random.default_rng(0)
    n = a.rows
    tab = np.zeros((n, W), np.int32)
    # word 0 = a random-permutation successor: a genuinely
    # data-dependent chain with no locality (the adversarial walk)
    tab[:, 0] = rng.permutation(n).astype(np.int32)
    tab_d = jnp.asarray(tab)
    np.asarray(tab_d[:1])  # sync mode

    print(f"pool {n} rows x {W} i32 = {n * W * 4 / 2**20:.1f} MB (HBM), "
          f"{a.steps} steps, backend={jax.default_backend()}")
    for k in [int(x) for x in a.ks.split(",")]:
        r = run_walks(tab_d, a.steps, k)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = run_walks(tab_d, a.steps, k)
            jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        ns_step = dt / a.steps * 1e9
        print(f"k={k:3d}: {dt * 1e3:8.2f} ms total, {ns_step:9.1f} ns/step,"
              f" {ns_step / k:8.1f} ns/step/walk")


if __name__ == "__main__":
    main()
