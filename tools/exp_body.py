"""Loop-BODY cost decomposition at the PRODUCTION bounce shape.

Rule 33/34 established the gather law (one (F*B)-row gather ~45 us at
F*B=16384) and the slab/bp/fronts optimum; exp_sort's round-5 run then
showed a full production iteration costs ~155 us at B=8192 x P=16 x
fronts=2 — the gather is no longer the majority.  This probe slope-
times (two max_steps points, np.asarray sync) the REAL loop and
synthetic while_loops holding single cost atoms at the same shapes:

  real      trace_packets on a config-3-scale bounce slab (no stats)
  g1        the fused (F*B)-row gather + index update, nothing else
  slab      the dequant + 6x(C,B,P) slab arithmetic + tmin/tmax folds
  mt        the (L,B,P) Moller-Trumbore chain + winner fold
  sort      the descending child sort network on (B,) lanes
  stack     the packed-word stack push/pop shift-register ops
  state     carrying the full loop state with a trivial body (loop tax)

Atoms are built from the live WideArrays tables so operand shapes,
dtypes and layouts match the real body.  us/step per atom tells which
slice of the ~155 us to attack (bf16 slab test, op fusion, ...).

Usage: python tools/exp_body.py [--slab 131072] [--packet 16]
                                [--fronts 2] [--steps 60,120]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slab", type=int, default=131072)
    ap.add_argument("--packet", type=int, default=16)
    ap.add_argument("--fronts", type=int, default=2)
    ap.add_argument("--steps", type=str, default="60,120")
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    m1, m2 = (int(x) for x in a.steps.split(","))

    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.models.scene import Scene
    from vortex_rt_tpu.ops.traverse_packet import _SORT_NET, trace_packets
    from vortex_rt_tpu.ops.traverse_wide import WideArrays, _bitcast_f32
    from vortex_rt_tpu.utils.config import RTConfig

    sc = Scene()
    sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    sb = sc.build(RTConfig(flatten=True))
    wa = WideArrays.from_scene(sb, width=8).fuse()
    r = a.slab
    p = a.packet
    b = r // p
    fb = b * a.fronts
    w_ = 8
    lmax = max(int(wa.max_leaf_tris), 1)
    n_pool = int(wa.nodes.shape[0])
    print(f"tris={sb.num_tris} slab={r} packet={p} fronts={a.fronts} "
          f"B={b} F*B={fb} pool={n_pool}", flush=True)

    rng = np.random.default_rng(0)
    # bounce-like rays (random hemisphere) + live mask ~50%
    from vortex_rt_tpu.golden.renderer import generate_rays
    cam = Scene.framing_camera(sb, 45.0, 1920 / 1080)
    o, d = generate_rays(cam, 1920, 1080)
    ii = np.arange(r) + 5 * r
    o = np.asarray(o)[ii].astype(np.float32)
    dn = rng.normal(size=(r, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True) + 1e-20
    act = jnp.asarray(rng.random(r) < 0.5)
    oj, dj = jnp.asarray(o), jnp.asarray(dn)

    def slope(fn, label):
        t1 = fn(m1)
        np.asarray(t1)  # compile+sync
        outs = []
        for m in (m1, m2):
            t0 = time.perf_counter()
            for _ in range(a.reps):
                out = fn(m)
            np.asarray(out)
            outs.append((time.perf_counter() - t0) / a.reps)
        us = (outs[1] - outs[0]) / (m2 - m1) * 1e6
        print(f"{label:8s} {us:8.1f} us/step   (t{m1}={outs[0]*1e3:.1f} "
              f"t{m2}={outs[1]*1e3:.1f} ms)", flush=True)
        return us

    # ---- real loop (compaction off via stats=False but target list —
    # max_steps caps before compaction matters at these step counts) ----
    def real(m):
        h, st = trace_packets(wa, oj, dj, packet=p, active=act,
                              max_steps=m, fronts=a.fronts)
        return h.dist.sum()

    # ---- synthetic atoms ----
    fused = wa.fused  # (N, 96) u32
    q = fused.shape[1]

    def syn(body, carry_extra=None):
        """while_loop of m iterations over (node, acc) + extras."""
        def fn(m):
            node0 = jnp.asarray(
                rng.integers(0, n_pool, fb).astype(np.int32))
            extras = carry_extra() if carry_extra else ()
            def cond(c):
                return c[0] < m
            def step(c):
                i, node, acc, *ex = c
                node, acc, ex = body(node, acc, ex)
                return (i + 1, node, acc, *ex)
            out = jax.lax.while_loop(
                cond, step, (jnp.int32(0), node0, jnp.float32(0),
                             *extras))
            return out[2] + out[1].sum()
        return fn

    def g1_body(node, acc, ex):
        rows = fused[jnp.clip(node, 0, n_pool - 1)]
        nxt = (node + rows[:, 22].astype(jnp.int32)) % n_pool
        return nxt, acc + _bitcast_f32(rows[:, 0]).sum(), ex

    # slab chain at (C,B,P): uses a gathered row's worth of data but from
    # a FIXED row (no gather cost — the arithmetic alone)
    ox, oy, oz = (dj[:, 0].reshape(b, p), dj[:, 1].reshape(b, p),
                  dj[:, 2].reshape(b, p))
    ivx, ivy, ivz = 1.0 / (ox + 2.0), 1.0 / (oy + 2.0), 1.0 / (oz + 2.0)

    def slab_body(node, acc, ex):
        rowt = fused[jnp.clip(node[:b], 0, n_pool - 1)].T[:32]
        gx, gy, gz = (_bitcast_f32(rowt[0]), _bitcast_f32(rowt[1]),
                      _bitcast_f32(rowt[2]))
        sx, sy, sz = (_bitcast_f32(rowt[3]), _bitcast_f32(rowt[4]),
                      _bitcast_f32(rowt[5]))
        qlc = jnp.stack([rowt[6 + c] for c in range(w_)])
        qhc = jnp.stack([rowt[14 + c] for c in range(w_)])

        def corner(qq, sh, g, s):
            f = ((qq >> sh) & 255).astype(jnp.float32) if sh else \
                (qq & 255).astype(jnp.float32)
            return (g[None] + f * s[None])[:, :, None]

        lx = corner(qlc, 0, gx, sx); hx = corner(qhc, 0, gx, sx)
        ly = corner(qlc, 8, gy, sy); hy = corner(qhc, 8, gy, sy)
        lz = corner(qlc, 16, gz, sz); hz = corner(qhc, 16, gz, sz)
        t1x = (lx - ox[None]) * ivx[None]; t2x = (hx - ox[None]) * ivx[None]
        t1y = (ly - oy[None]) * ivy[None]; t2y = (hy - oy[None]) * ivy[None]
        t1z = (lz - oz[None]) * ivz[None]; t2z = (hz - oz[None]) * ivz[None]
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        hc = (tmax >= tmin) & (tmax > 0.0)
        pd = jnp.min(jnp.where(hc, tmin, 3e38), axis=2)
        m_ = jnp.sum((pd < 3e38).astype(jnp.int32), axis=0)
        nxt = node.at[:b].set((node[:b] + m_) % n_pool)
        return nxt, acc + pd.sum(), ex

    def mt_body(node, acc, ex):
        lrowt = _bitcast_f32(
            fused[jnp.clip(node[:b], 0, n_pool - 1)].T[32:])

        def lf(k):
            return jnp.stack([lrowt[16 * c + k]
                              for c in range(lmax)])[:, :, None]

        v0x, v0y, v0z = lf(0), lf(1), lf(2)
        e1x, e1y, e1z = lf(3), lf(4), lf(5)
        e2x, e2y, e2z = lf(6), lf(7), lf(8)
        ld_x, ld_y, ld_z = ox[None], oy[None], oz[None]
        hx_ = ld_y * e2z - ld_z * e2y
        hy_ = ld_z * e2x - ld_x * e2z
        hz_ = ld_x * e2y - ld_y * e2x
        aa = e1x * hx_ + e1y * hy_ + e1z * hz_
        fba = 1.0 / jnp.where(jnp.abs(aa) < 1e-6, 1.0, aa)
        sx_ = ivx[None] - v0x
        sy_ = ivy[None] - v0y
        sz_ = ivz[None] - v0z
        w1 = fba * (sx_ * hx_ + sy_ * hy_ + sz_ * hz_)
        qx = sy_ * e1z - sz_ * e1y
        qy = sz_ * e1x - sx_ * e1z
        qz = sx_ * e1y - sy_ * e1x
        w2 = fba * (ld_x * qx + ld_y * qy + ld_z * qz)
        t = fba * (e2x * qx + e2y * qy + e2z * qz)
        ok = (w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1) & (t > 1e-6)
        tbest = jnp.min(jnp.where(ok, t, 3e38), axis=0)      # (B, P)
        hit_any = jnp.any(tbest < 3e38, axis=1).astype(jnp.int32)
        nxt = node.at[:b].set((node[:b] + hit_any) % n_pool)
        return nxt, acc + tbest.sum(), ex

    def sort_body(node, acc, ex):
        dists = [jnp.sin(node[:b].astype(jnp.float32) * (c + 1))
                 for c in range(w_)]
        idxs = [jnp.full(b, c, jnp.int32) for c in range(w_)]
        for a_i, b_i in _SORT_NET[w_]:
            swap = dists[a_i] < dists[b_i]
            da, db = dists[a_i], dists[b_i]
            ia, ib = idxs[a_i], idxs[b_i]
            dists[a_i] = jnp.where(swap, db, da)
            dists[b_i] = jnp.where(swap, da, db)
            idxs[a_i] = jnp.where(swap, ib, ia)
            idxs[b_i] = jnp.where(swap, ia, ib)
        nxt = node.at[:b].set((node[:b] + idxs[0]) % n_pool)
        return nxt, acc + dists[0].sum(), ex

    def stack_extra():
        return (tuple(jnp.zeros(b, jnp.int32) for _ in range(26)),
                jnp.zeros(b, jnp.int32))

    def stack_body(node, acc, ex):
        st, cnt = ex
        entry = node[:b]
        mask = (node[:b] & 1) == 0
        ns = [jnp.where(mask, entry, st[0])]
        for i in range(1, len(st)):
            ns.append(jnp.where(mask, st[i - 1], st[i]))
        st = tuple(ns)
        top = st[0]
        pop = ~mask
        ns2 = []
        for i in range(len(st) - 1):
            ns2.append(jnp.where(pop, st[i + 1], st[i]))
        ns2.append(jnp.where(pop, jnp.zeros_like(st[-1]), st[-1]))
        st = tuple(ns2)
        cnt = jnp.where(mask, cnt + 1, cnt - 1)
        nxt = node.at[:b].set((node[:b] + top) % n_pool)
        return nxt, acc + cnt.sum().astype(jnp.float32), (st, cnt)

    def state_extra():
        # the real loop's (B,P) hit fields + (B,) lanes
        return (jnp.zeros((b, p)), jnp.zeros((b, p)),
                jnp.zeros((b, p), jnp.int32), jnp.zeros(b, jnp.int32))

    def state_body(node, acc, ex):
        bt, bx, tri, sc_ = ex
        bt = bt + 1.0
        bx = bx * 0.5
        tri = tri + 1
        sc_ = sc_ ^ 1
        nxt = (node + 1) % n_pool
        return nxt, acc + bt[0, 0], (bt, bx, tri, sc_)

    atoms = [("real", real), ("g1", syn(g1_body)),
             ("slab", syn(slab_body)), ("mt", syn(mt_body)),
             ("sort", syn(sort_body)),
             ("stack", syn(stack_body, stack_extra)),
             ("state", syn(state_body, state_extra))]
    results = {}
    for label, fn in atoms:
        results[label] = slope(jax.jit(fn) if label != "real" else fn,
                               label)
    s = sum(v for k, v in results.items() if k not in ("real",))
    print(f"sum(atoms) = {s:.1f} us vs real {results['real']:.1f} us",
          flush=True)


if __name__ == "__main__":
    main()
