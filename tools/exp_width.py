"""Sweep BVH width x leaf size (x loop knobs) on the bench config.

For each grid entry, builds the bench scene, compiles the burst, and
reports honest ms/frame + Mrays/s with the same anti-hoist discipline
as bench.py (spp=2 seeded jitter, scalar readback sync).  Also prints
the packet-loop iteration counts via a stats trace of the primary wave,
so the iteration cut of wider nodes / fatter leaves is visible
separately from the step-cost change.

Grid entries are ``WxL`` with optional knob suffixes:
  +lax     lax.sort child ordering (VORTEX_RT_LAX_SORT)
  +astack  (B,S) array stack (VORTEX_RT_ARRAY_STACK)
  +fused   single-gather node+leaf rows (VORTEX_RT_FUSED_ROWS)
  +uK      unroll the while body K times (VORTEX_RT_UNROLL=K)
e.g. ``--grid 4x4,8x8,8x8+lax+astack,4x4+u4``.  Each entry runs in its OWN
subprocess: the knobs are import-time defaults, and a fresh process
also redraws the compile basin instead of silently reusing a cached
executable whose jit key does not include the knobs.

Usage: python tools/exp_width.py [--grid ...] [--burst 8]
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one(spec: str, burst: int, reps: int) -> None:
    from vortex_rt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

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
    bw, leaf = (int(x) for x in spec.split("+")[0].split("x"))
    sb = bench_scene(max_leaf_tris=leaf)
    cfg = RTConfig(flatten=True, bvh_width=bw, max_leaf_tris=leaf)
    r = WavefrontRenderer.from_buffers(sb, cfg)
    print(f"[{spec}] nodes={r.wa.nodes.shape[0]} "
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
    print(f"[{spec}] primary-wave: steps={int(st.steps)} "
          f"int={int(st.int_steps)} tri={int(st.tri_steps)}", flush=True)

    t0 = time.time()
    r.render_burst(cam, params, w, h, n_frames=burst, seed0=0,
                   rays_only=True)
    print(f"[{spec}] compile+first: {time.time()-t0:.1f}s", flush=True)
    total, t0 = 0, time.perf_counter()
    for i in range(reps):
        total += int(r.render_burst(cam, params, w, h, n_frames=burst,
                                    seed0=(i + 1) * burst,
                                    rays_only=True))
    dt = time.perf_counter() - t0
    ms = dt / (reps * burst) * 1e3
    mrays = total / dt / 1e6
    print(f"[{spec}] {ms:.2f} ms/frame  {mrays:.1f} Mrays/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="4x4,8x4,8x8,4x8")
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one:
        run_one(args.one, args.burst, args.reps)
        return

    for spec in args.grid.split(","):
        knobs = spec.split("+")[1:]
        env = dict(os.environ)
        env["VORTEX_RT_LAX_SORT"] = "1" if "lax" in knobs else "0"
        env["VORTEX_RT_ARRAY_STACK"] = "1" if "astack" in knobs else "0"
        env["VORTEX_RT_FUSED_ROWS"] = "1" if "fused" in knobs else "0"
        env["VORTEX_RT_UNROLL"] = next(
            (k[1:] for k in knobs if k.startswith("u") and k[1:].isdigit()),
            "1")
        # round-4 staged levers (tests/test_livesort.py)
        env["VORTEX_RT_LIVE_SORT"] = "1" if "live" in knobs else "0"
        env["VORTEX_RT_COMPACT_DIV"] = "2" if "c2" in knobs else "4"
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--one", spec,
             "--burst", str(args.burst), "--reps", str(args.reps)],
            env=env)
        if rc != 0:
            print(f"[{spec}] FAILED rc={rc}", flush=True)


if __name__ == "__main__":
    main()
