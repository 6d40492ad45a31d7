"""Sweep BVH width x leaf size on the bench config (hardware experiment).

For each (bvh_width, max_leaf_tris) in the grid, builds the bench scene,
compiles the 16-frame burst, and reports honest ms/frame + Mrays/s with
the same anti-hoist discipline as bench.py (spp=2 seeded jitter, scalar
readback sync).  Also prints the packet-loop iteration counts via a
stats trace of the primary wave, so the iteration cut of wider nodes /
fatter leaves is visible separately from the step-cost change.

Usage: python tools/exp_width.py [--grid 4x4,8x4,8x8] [--burst 8]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="4x4,8x4,8x8,4x8")
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import bench_scene
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models.scene import Camera, RenderParams
    from vortex_rt_tpu.ops.traverse_packet import trace_packets
    from vortex_rt_tpu.utils.config import RTConfig

    cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                         45.0, 1.0)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2,
                          shadow=True, spp=2)
    w = h = 512
    base = None
    for spec in args.grid.split(","):
        bw, leaf = (int(x) for x in spec.split("x"))
        sb = bench_scene(max_leaf_tris=leaf)
        cfg = RTConfig(flatten=True, bvh_width=bw, max_leaf_tris=leaf)
        r = WavefrontRenderer.from_buffers(sb, cfg)
        print(f"[{bw}x{leaf}] nodes={r.wa.nodes.shape[0]} "
              f"leaf_rows={r.wa.tri_rows.shape[0]} depth={r.wa.depth}",
              flush=True)

        # primary-wave packet iteration count (stats trace, tiny batch)
        rays = 32768
        ids = np.arange(rays) % (w * h)
        px = (ids % w + 0.5) / w
        py = (ids // w + 0.5) / h
        fwd, right, up = cam.forward, cam.right, cam.up
        vw, vh = float(cam.viewplane[0]), float(cam.viewplane[1])
        d = (fwd[None] + right[None] * ((px - 0.5) * vw)[:, None]
             + up[None] * ((0.5 - py) * vh)[:, None])
        d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
        o = np.broadcast_to(np.asarray(cam.pos, np.float32), d.shape).copy()
        _, st = trace_packets(r.wa, o, d, packet=cfg.packet_size, stats=True)
        print(f"[{bw}x{leaf}] primary-wave: steps={int(st.steps)} "
              f"int={int(st.int_steps)} tri={int(st.tri_steps)}", flush=True)

        t0 = time.time()
        nrays = r.render_burst(cam, params, w, h, n_frames=args.burst,
                               seed0=0, rays_only=True)
        print(f"[{bw}x{leaf}] compile+first: {time.time()-t0:.1f}s",
              flush=True)
        total, t0 = 0, time.perf_counter()
        for i in range(args.reps):
            total += int(r.render_burst(cam, params, w, h,
                                        n_frames=args.burst,
                                        seed0=(i + 1) * args.burst,
                                        rays_only=True))
        dt = time.perf_counter() - t0
        ms = dt / (args.reps * args.burst) * 1e3
        mrays = total / dt / 1e6
        tag = ""
        if base is None:
            base = ms
        else:
            tag = f"  ({base / ms:.2f}x vs first)"
        print(f"[{bw}x{leaf}] {ms:.2f} ms/frame  {mrays:.1f} Mrays/s{tag}",
              flush=True)


if __name__ == "__main__":
    main()
