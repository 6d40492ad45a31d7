"""Step-cost decomposition for the packet traversal loop.

Two parts, all slope-timed (two max_steps points, np.asarray sync — the
only honest method on axon, ARCHITECTURE.md rules 13-14):

1. REAL loop baseline: us/step of trace_packets on a bench-scene
   primary slab (B=128 packets x P=256 rays).
2. SYNTHETIC while_loops with the same shapes, decomposing a step into
   its cost atoms:
     g2   two row gathers (node 32-col + leaf 64-col) + index update
     g1   one row gather (32-col)
     g1w  one WIDE row gather (96-col unified node+leaf table)
     ew1  elementwise chain at (C=4,B,P) + (L=4,B,P) x ~same op count
          as the real body (slab+MT math, no gathers)
     ew2  the same chain doubled (C=8, L=8) — predicts 8-wide cost
     full g2 + ew1 (sanity: should land near the real loop)

If g2-g1 is large, a unified node+leaf table pays.  If ew2-ew1 is small
against the step cost, 8-wide children / 8-tri leaves cut iterations
nearly for free.

Usage: python tools/exp_step.py
"""
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


def timeit(fn, reps=3):
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def slope_us(make_loop, lo=60, hi=180):
    f_lo, f_hi = make_loop(lo), make_loop(hi)
    sync(f_lo()); sync(f_hi())
    t_lo = timeit(lambda: sync(f_lo()))
    t_hi = timeit(lambda: sync(f_hi()))
    return (t_hi - t_lo) / (hi - lo) * 1e6, t_lo, t_hi


B, P, C, L = 128, 256, 4, 4


def synth(kind):
    """Build a jitted while_loop of `n` iterations for the given atom."""
    n_nodes = 2000
    nodes = jnp.asarray(
        np.random.RandomState(0).randint(0, 2**31, (n_nodes, 32)),
        jnp.uint32)
    leaf = jnp.asarray(
        np.random.RandomState(1).rand(n_nodes, 64), jnp.float32)
    wide = jnp.concatenate(
        [nodes.astype(jnp.float32), leaf, leaf[:, :32]], axis=1)  # (N,128)
    rs = np.random.RandomState(2)
    lanes = {k: jnp.asarray(rs.rand(B, P), jnp.float32)
             for k in ("ox", "oy", "oz", "ix", "iy", "iz", "bt")}

    def make(n):
        def body(s):
            i, node, acc = s
            nxt = node
            if kind in ("g2", "g1", "full"):
                rowt = nodes[node].T              # (32, B)
                nxt = (rowt[14].astype(jnp.int32) + i) % n_nodes
                acc = acc + rowt[0].astype(jnp.float32).sum()
            if kind == "g2" or kind == "full":
                lrowt = leaf[node].T              # (64, B)
                acc = acc + lrowt[0].sum()
            if kind == "g1w":
                rowt = wide[node].T               # (128, B)
                nxt = (rowt[14].astype(jnp.int32) + i) % n_nodes
                acc = acc + rowt[0].sum() + rowt[40].sum()
            if kind in ("ew1", "ew2", "full"):
                cc = C if kind != "ew2" else 2 * C
                ll = L if kind != "ew2" else 2 * L
                # slab-test-like chain: (C,B,P) from (B,) broadcasts
                g = jnp.arange(cc, dtype=jnp.float32)[:, None, None]
                t1 = (g - lanes["ox"][None]) * lanes["ix"][None]
                t2 = (g - lanes["oy"][None]) * lanes["iy"][None]
                t3 = (g - lanes["oz"][None]) * lanes["iz"][None]
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1, t2),
                                               jnp.minimum(t2, t3)),
                                   jnp.minimum(t1, t3))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1, t2),
                                               jnp.maximum(t2, t3)),
                                   jnp.maximum(t1, t3))
                hc = (tmax >= tmin) & (tmax > 0.0)
                acc = acc + jnp.where(hc, tmin, 0.0).sum()
                # MT-like chain: (L,B,P), ~30 ops
                h = jnp.arange(ll, dtype=jnp.float32)[:, None, None]
                e1 = h + lanes["ox"][None]; e2 = h * lanes["oy"][None]
                hx = lanes["iy"][None] * e2 - lanes["iz"][None] * e1
                hy = lanes["iz"][None] * e1 - lanes["ix"][None] * e2
                hz = lanes["ix"][None] * e2 - lanes["iy"][None] * e1
                aa = e1 * hx + e2 * hy + h * hz
                fba = 1.0 / jnp.where(jnp.abs(aa) < 1e-6, 1.0, aa)
                w1 = fba * (lanes["ox"][None] * hx + lanes["oy"][None] * hy)
                w2 = fba * (lanes["oz"][None] * hz + e1 * hy)
                t = fba * (e2 * hx + h * hy)
                ok = (w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1) & (t > 1e-6)
                acc = acc + jnp.where(ok, t, 0.0).sum()
            return i + 1, nxt, acc

        def loop():
            return jax.lax.while_loop(
                lambda s: s[0] < n,
                body,
                (jnp.int32(0), jnp.zeros(B, jnp.int32), jnp.float32(0)))[2]

        return jax.jit(loop)

    return make


def main():
    # ---- real loop baseline ----
    from bench import bench_scene
    from vortex_rt_tpu.models.scene import Camera
    from vortex_rt_tpu.ops import traverse_packet as tp
    from vortex_rt_tpu.ops.traverse_wide import WideArrays

    sb = bench_scene()
    wa = WideArrays.from_scene(sb)
    print(f"nodes={wa.nodes.shape} tri_rows={wa.tri_rows.shape} "
          f"depth={wa.depth} lmax={wa.max_leaf_tris}", flush=True)

    cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0],
                         [0, 1, 0], 45.0, 1.0)
    import math
    w = h = 512
    rays = B * P
    ids = np.arange(rays) % (w * h)
    px = (ids % w + 0.5) / w
    py = (ids // w + 0.5) / h
    fwd, right, up = cam.basis()
    vh = 2.0 * math.tan(math.radians(cam.vfov) * 0.5)
    vw = vh * cam.aspect
    d = (fwd[None, :] + right[None, :] * ((px - 0.5) * vw)[:, None]
         + up[None, :] * ((0.5 - py) * vh)[:, None])
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(np.broadcast_to(
        np.asarray(cam.pos, np.float32), d.shape).copy())
    d = jnp.asarray(d, jnp.float32)

    def real(n):
        f = jax.jit(lambda wa_, o_, d_: tp.trace_packets(
            wa_, o_, d_, packet=P, max_steps=n, stats=True)[1].steps)
        return lambda: f(wa, o, d)

    steps_full = int(sync(real(400_000)()))
    print(f"real completion steps: {steps_full}", flush=True)
    lo, hi = min(60, steps_full // 3), min(180, 2 * steps_full // 3)
    us, t_lo, t_hi = slope_us(real, lo, hi)
    print(f"REAL loop: {us:.1f} us/step (t[{lo}]={t_lo*1e3:.2f}ms "
          f"t[{hi}]={t_hi*1e3:.2f}ms)", flush=True)

    for kind in ("g1", "g2", "g1w", "ew1", "ew2", "full"):
        us, t_lo, t_hi = slope_us(synth(kind))
        print(f"synth {kind:4s}: {us:6.1f} us/step "
              f"(t[60]={t_lo*1e3:.2f}ms t[180]={t_hi*1e3:.2f}ms)",
              flush=True)


if __name__ == "__main__":
    main()
