"""Union-factor step counts vs bounce_packet at the config-3 shape.

Counts loop iterations and packet-steps (stats=True: single full-width
round, no compaction) for a bounce-proxy wave over the 70k-tri blob at
packet sizes down to 1 (true per-ray walk, no unions).  Hardware time
per wave ~ iterations x fixed_overhead + packet_steps x per-packet
gather cost; this maps WHERE the union physics stops paying before
burning TPU time on compiles (ARCHITECTURE.md rules 18/30).

Usage: JAX_PLATFORMS=cpu python tools/exp_bp.py [--packets 1,4,8,32,128]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packets", default="1,4,8,16,32,128")
    ap.add_argument("--slab", type=int, default=32768)
    a = ap.parse_args()

    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.models.scene import Scene
    from vortex_rt_tpu.ops.traverse_packet import trace_packets
    from vortex_rt_tpu.ops.traverse_wide import WideArrays
    from vortex_rt_tpu.utils.config import RTConfig
    from vortex_rt_tpu.golden.renderer import generate_rays

    cfg = RTConfig(flatten=True, bvh_width=8)
    sc = Scene()
    sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    sb = sc.build(cfg)
    wa = WideArrays.from_scene(sb, width=8)
    if cfg.fused_rows:
        wa = wa.fuse()
    print(f"tris={sb.num_tris} nodes={wa.nodes.shape[0]} depth={wa.depth}",
          flush=True)

    # bounce-proxy wave: primary hits -> cosine hemisphere (exp_sort's
    # model), one contiguous 1080p lane slab
    cam = Scene.framing_camera(sb, 45.0, 1920 / 1080)
    n = a.slab
    rng = np.random.default_rng(3)
    ii = np.arange(n) + 5 * n
    o, d = generate_rays(cam, 1920, 1080)
    o, d = np.asarray(o)[ii], np.asarray(d)[ii]
    h, _ = trace_packets(wa, jnp.asarray(o), jnp.asarray(d), packet=128)
    dist = np.asarray(h.dist)
    hit = dist < 1e29
    t = np.minimum(dist, 20.0)[:, None]
    hp = (o + d * t * 0.999).astype(np.float32)
    u1, u2 = rng.random(n), rng.random(n)
    r_ = np.sqrt(u1)
    th = 2 * np.pi * u2
    loc = np.stack([r_ * np.cos(th), r_ * np.sin(th),
                    np.sqrt(1 - u1)], axis=1)
    w = -d
    up = np.where(np.abs(w[:, 1:2]) < 0.9, np.tile([[0, 1, 0]], (n, 1)),
                  np.tile([[1, 0, 0]], (n, 1)))
    ta = np.cross(up, w)
    ta /= np.linalg.norm(ta, axis=1, keepdims=True) + 1e-20
    bi = np.cross(w, ta)
    nd = (loc[:, 0:1] * ta + loc[:, 1:2] * bi + loc[:, 2:3] * w)
    nd = (nd / (np.linalg.norm(nd, axis=1, keepdims=True) + 1e-20)
          ).astype(np.float32)
    o_j, d_j = jnp.asarray(hp), jnp.asarray(nd)
    act = jnp.asarray(hit)
    print(f"live={int(hit.sum())}/{n}", flush=True)

    for p in (int(x) for x in a.packets.split(",")):
        t0 = time.time()
        h, st = trace_packets(wa, o_j, d_j, packet=p, active=act,
                              stats=True)
        steps = int(st.steps)
        psteps = int(st.packet_steps)
        b = n // p
        print(f"bp={p:4d} B={b:6d}: iters={steps:6d} "
              f"packet_steps={psteps:9d} mean_walk={psteps / max(b, 1):8.1f} "
              f"row_gathers={psteps:9d} ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
