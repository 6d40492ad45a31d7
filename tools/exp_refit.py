"""Refit-phase profile at 1M tris (VERDICT r4 #5: refit is config 5's
dominant term at 758 ms/frame; the bar is ~100-150 ms).

Times each stage of the per-frame refit pipeline as its own jitted
program on the current backend:
  move       — the ripple vertex displacement (3 x (T,3) elementwise)
  boxes      — _leaf_boxes + _range_refit (pyramid + 4 gathers)
  pack       — _pack_wide (quantize + record scatter into the node pool)
  rows       — _leaf_rows (leaf-slot vertex gathers -> packed rows)
  fuse       — WideArrays.fuse (node+leaf row fusion gather)
  full       — refit_lbvh + fuse as one program (the production shape;
               fused stages overlap, so full <= sum of parts)

Usage: python tools/exp_refit.py [--n 708] [--leaf 4] [--width 8]
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


def timed(label, fn, *args, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{label:8s} {ms:9.1f} ms")
    return out, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=708)  # 708 -> ~1M tris
    ap.add_argument("--leaf", type=int, default=4)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--compact", action="store_true",
                    help="size pools via compact_sizes (VERDICT r4 #5)")
    a = ap.parse_args()

    from vortex_rt_tpu.accel import lbvh as L
    from vortex_rt_tpu.models import bigscenes

    m = bigscenes.wavy_grid(n=a.n)
    v0, v1, v2 = L.pad_tris(np.asarray(m.v0), np.asarray(m.v1),
                            np.asarray(m.v2), a.leaf)
    dv = [jnp.asarray(v) for v in (v0, v1, v2)]
    np.asarray(dv[0][:1])  # force sync mode (rule 31)
    t = int(dv[0].shape[0])
    print(f"tris={t} leaf={a.leaf} width={a.width} "
          f"backend={jax.default_backend()}")

    lb, topo = L.build_lbvh_topo(*dv, leaf_size=a.leaf, width=a.width)
    jax.block_until_ready(lb.nodes)
    pool_rows = leaf_rows = 0
    surv_idx = None
    if a.compact:
        pool_rows, leaf_rows, surv_idx = L.compact_plan(topo)
    print(f"node pool rows={lb.nodes.shape[0]} "
          f"leaf rows={lb.tri_rows.shape[0]} "
          f"used leaves={int(lb.num_leaves)} "
          f"used pool={int((topo.newid >= 0).sum()) + 0} "
          f"compact=({pool_rows},{leaf_rows})")

    base_y = dv[0][:, 1], dv[1][:, 1], dv[2][:, 1]

    def move1(v, y0, tt):
        def field(t_):
            return 0.3 * jnp.sin(0.7 * v[:, 0] + 2.1 * t_) \
                * jnp.cos(0.5 * v[:, 2] - 1.3 * t_)
        return v.at[:, 1].set(y0 + field(tt) - field(jnp.float32(0.0)))

    move = jax.jit(lambda t_: tuple(
        move1(dv[k], base_y[k], t_) for k in range(3)))
    (w0, w1, w2), _ = timed("move", move, jnp.float32(0.3))

    l = t

    @jax.jit
    def boxes(v0, v1, v2):
        lmin, lmax = L._leaf_boxes(v0, v1, v2, topo.order)
        imin, imax = L._range_refit(lmin, lmax, topo.lo, topo.hi)
        return (jnp.concatenate([imin, lmin]),
                jnp.concatenate([imax, lmax]))

    (bmin, bmax), _ = timed("boxes", boxes, w0, w1, w2)

    pack = jax.jit(lambda bmin, bmax: L._pack_wide(
        topo, bmin, bmax, l, a.leaf, root_offset=0, width=a.width,
        pool_rows=pool_rows, surv_idx=surv_idx, leaf_rows=leaf_rows))
    nodes, _ = timed("pack", pack, bmin, bmax)

    rows_f = jax.jit(lambda v0, v1, v2: L._leaf_rows(
        v0, v1, v2, topo.order, topo.row_lo, topo.row_cnt, l,
        leaf_size=a.leaf, n_rows=leaf_rows))
    rows, _ = timed("rows", rows_f, w0, w1, w2)

    wa_t = L.wide_arrays_from_lbvh(lb, a.leaf, width=a.width)
    import dataclasses as dc

    @jax.jit
    def fuse(nodes, rows):
        return dc.replace(wa_t, nodes=nodes, tri_rows=rows).fuse().fused

    timed("fuse", fuse, nodes, rows)

    @jax.jit
    def full(t_):
        vv = tuple(move1(dv[k], base_y[k], t_) for k in range(3))
        lb2 = L.refit_lbvh(topo, *vv, leaf_size=a.leaf, width=a.width,
                           pool_rows=pool_rows, leaf_rows=leaf_rows,
                           surv_idx=surv_idx)
        wa = dc.replace(wa_t, nodes=lb2.nodes, tri_rows=lb2.tri_rows)
        wa = wa.fuse()
        return wa.nodes, wa.tri_rows, wa.fused

    timed("full", full, jnp.float32(0.3))


if __name__ == "__main__":
    main()
