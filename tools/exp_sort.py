"""Bounce-ray sorting experiment (the 1080p path-trace lever).

At 1080p depth-3 the bounce wave dominates the frame ~60x
(ARCHITECTURE.md rule 18): cosine-hemisphere bounce directions are
incoherent, and a packet walks the UNION of its rays' paths.  Classic
wavefront path tracers restore coherence by sorting the bounce wave by
direction/origin before packetization; rule 9 rejected pool
*compaction* at 512x512 where traces cost ~3 ms, but a bounce trace
that costs seconds changes the calculus entirely.

This tool measures, on a slab of bunny-scene bounce rays (the exact
shape the slab-major frame traces):
  unsorted        trace_packets as the frame runs today
  octant          sorted by 3-bit direction octant
  octant+morton   octant + 12-bit origin Morton code
  seg<N>          SEGMENTED octant sort: stable argsort of
                  (lane//N) << 4 | octant (dead lanes keyed 15) — rays
                  reorder by direction only WITHIN an N-lane window, so
                  the tile-major origin locality rule 23 showed the
                  global sort destroys survives at window granularity
                  while packets still become direction-pure (round 5)
  +dead           same, with a dead-lane fraction (sorting also groups
                  dead lanes into all-dead packets that retire in 1 step)
Sort timings INCLUDE key build + argsort + 8 lane gathers + the inverse
scatter of the 5 hit fields.

Usage: python tools/exp_sort.py [--slab 32768] [--packet 32] [--dead 0.5]
                                [--segs 256,1024,4096] [--fronts 2]
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


def bounce_key(ox, oy, oz, dx, dy, dz, active, lo, inv_ext, bits=4):
    """Sort key for an incoherent wave: direction octant (3 bits, major)
    then origin Morton (3*bits), dead lanes pushed to the end."""
    oct_ = ((dx >= 0).astype(jnp.int32)
            | ((dy >= 0).astype(jnp.int32) << 1)
            | ((dz >= 0).astype(jnp.int32) << 2))
    qx = jnp.clip(((ox - lo[0]) * inv_ext[0] * (1 << bits)).astype(jnp.int32),
                  0, (1 << bits) - 1)
    qy = jnp.clip(((oy - lo[1]) * inv_ext[1] * (1 << bits)).astype(jnp.int32),
                  0, (1 << bits) - 1)
    qz = jnp.clip(((oz - lo[2]) * inv_ext[2] * (1 << bits)).astype(jnp.int32),
                  0, (1 << bits) - 1)
    m = jnp.zeros_like(qx)
    for b in range(bits):
        m = (m | (((qx >> b) & 1) << (3 * b))
             | (((qy >> b) & 1) << (3 * b + 1))
             | (((qz >> b) & 1) << (3 * b + 2)))
    key = (oct_ << (3 * bits)) | m
    return jnp.where(active, key, jnp.int32(1 << 30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slab", type=int, default=32768)
    ap.add_argument("--packet", type=int, default=32)
    ap.add_argument("--dead", type=float, default=0.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--segs", type=str, default="",
                    help="comma list of segment sizes for the segmented"
                         " octant sort (e.g. 256,1024,4096)")
    ap.add_argument("--fronts", type=int, default=1)
    a = ap.parse_args()

    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.models.scene import Scene
    from vortex_rt_tpu.ops.traverse_packet import trace_packets
    from vortex_rt_tpu.ops.traverse_wide import WideArrays

    sc = Scene()
    sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    print(f"tris={sb.num_tris} slab={a.slab} packet={a.packet} "
          f"dead={a.dead}", flush=True)

    # bounce-like rays: primary hits -> cosine-hemisphere directions.
    # Build on host for determinism; the scene is the 69k-tri blob.
    cam = Scene.framing_camera(sb, 45.0, 1920 / 1080)
    n = a.slab
    rng = np.random.default_rng(3)
    # scatter sample pixels across the full 1080p frame so origins span
    # the scene the way a real slab (contiguous tile region) does NOT --
    # run both: contiguous lane block ('tile') and frame-wide ('rand')
    ii_tile = np.arange(n) + 5 * n
    ii_rand = rng.choice(1920 * 1080, size=n, replace=False)

    from vortex_rt_tpu.golden.renderer import generate_rays

    def bounce_set(ii):
        px = ii % 1920
        py = ii // 1920
        o, d = generate_rays(cam, 1920, 1080)
        o, d = np.asarray(o)[ii], np.asarray(d)[ii]
        h, _ = trace_packets(wa, jnp.asarray(o), jnp.asarray(d), packet=256)
        dist = np.asarray(h.dist)
        hit = dist < 1e29
        t = np.minimum(dist, 20.0)[:, None]
        hp = o + d * t * 0.999
        # cosine hemisphere around +normal-ish (use -d reflected jitter):
        u1, u2 = rng.random(n), rng.random(n)
        r_ = np.sqrt(u1)
        th = 2 * np.pi * u2
        loc = np.stack([r_ * np.cos(th), r_ * np.sin(th),
                        np.sqrt(1 - u1)], axis=1)
        # frame around -d (good enough for an incoherence model)
        w = -d
        up = np.where(np.abs(w[:, 1:2]) < 0.9,
                      np.tile([[0, 1, 0]], (n, 1)),
                      np.tile([[1, 0, 0]], (n, 1)))
        ta = np.cross(up, w)
        ta /= np.linalg.norm(ta, axis=1, keepdims=True) + 1e-20
        bi = np.cross(w, ta)
        nd = loc[:, 0:1] * ta + loc[:, 1:2] * bi + loc[:, 2:3] * w
        nd /= np.linalg.norm(nd, axis=1, keepdims=True) + 1e-20
        act = hit.copy()
        if a.dead > 0:
            act &= rng.random(n) >= a.dead
        return (jnp.asarray(hp.astype(np.float32)),
                jnp.asarray(nd.astype(np.float32)),
                jnp.asarray(act))

    lo = np.asarray([m.aabb()[0] for m in sc._meshes]).min(axis=0)
    hi = np.asarray([m.aabb()[1] for m in sc._meshes]).max(axis=0)
    inv_ext = 1.0 / np.maximum(hi - lo, 1e-6)
    lo_j = jnp.asarray(lo, jnp.float32)
    ie_j = jnp.asarray(inv_ext, jnp.float32)

    @jax.jit
    def unsorted_trace(o, d, act, nz):
        h, st = trace_packets(wa, o, d, packet=a.packet, active=act,
                              max_steps=400_000 + nz, fronts=a.fronts)
        return h.dist.sum(), st

    @jax.jit
    def sorted_trace(o, d, act, nz):
        key = bounce_key(o[:, 0], o[:, 1], o[:, 2],
                         d[:, 0], d[:, 1], d[:, 2], act, lo_j, ie_j)
        perm = jnp.argsort(key)
        os_, ds_, as_ = o[perm], d[perm], act[perm]
        h, st = trace_packets(wa, os_, ds_, packet=a.packet, active=as_,
                              max_steps=400_000 + nz, fronts=a.fronts)
        # inverse scatter (the frame needs hits back in lane order)
        inv = jnp.argsort(perm)
        return h.dist[inv].sum(), st

    def make_seg_trace(seg):
        @jax.jit
        def seg_trace(o, d, act, nz):
            lane = jnp.arange(o.shape[0], dtype=jnp.int32)
            oct_ = ((o[:, 0] * 0).astype(jnp.int32)
                    | (d[:, 0] >= 0).astype(jnp.int32)
                    | ((d[:, 1] >= 0).astype(jnp.int32) << 1)
                    | ((d[:, 2] >= 0).astype(jnp.int32) << 2))
            key = ((lane // seg) << 4) | jnp.where(act, oct_, 15)
            perm = jnp.argsort(key, stable=True)
            os_, ds_, as_ = o[perm], d[perm], act[perm]
            h, st = trace_packets(wa, os_, ds_, packet=a.packet,
                                  active=as_, max_steps=400_000 + nz,
                                  fronts=a.fronts)
            inv = jnp.argsort(perm)
            return h.dist[inv].sum(), st
        return seg_trace

    def timeit(fn, args, label):
        out = fn(*args, 0)
        float(np.asarray(out[0]))  # sync (axon)
        t0 = time.perf_counter()
        for _ in range(a.reps):
            out = fn(*args, 0)
        s = float(np.asarray(out[0]))
        dt = (time.perf_counter() - t0) / a.reps
        print(f"{label}: {dt*1e3:8.2f} ms  steps={int(out[1]):7d}  "
              f"sum={s:.3e}", flush=True)
        return dt

    segs = [int(s) for s in a.segs.split(",") if s]
    seg_fns = [(s, make_seg_trace(s)) for s in segs]
    for name, ii in (("tile-slab", ii_tile), ("frame-rand", ii_rand)):
        o, d, act = bounce_set(ii)
        live = int(np.asarray(act).sum())
        print(f"-- {name}: live={live}/{n}", flush=True)
        t_u = timeit(unsorted_trace, (o, d, act), f"{name} unsorted")
        t_s = timeit(sorted_trace, (o, d, act), f"{name} sorted  ")
        print(f"   speedup {t_u/t_s:.2f}x", flush=True)
        for s, fn in seg_fns:
            t_g = timeit(fn, (o, d, act), f"{name} seg{s:<6d}")
            print(f"   speedup {t_u/t_g:.2f}x", flush=True)


if __name__ == "__main__":
    main()
