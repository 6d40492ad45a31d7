"""Width/leaf/knob sweep at the CONFIG-3 shape (1080p path-traced bunny).

The bench-config sweep (tools/exp_width.py) times a 1.6k-tri toy whose
tree is 7 levels deep; the scale cliff lives at 70k tris x 1080p x
depth-3 path trace (BENCH_LADDER config 3: 1.46 Mrays/s in round 3).
This sweep times exactly that frame per grid entry, in a subprocess per
entry (knobs are import-time defaults; a fresh process also redraws the
compile basin).

Grid entries are ``WxL`` plus optional ``+lax +astack +fused +uK`` knob
suffixes (see exp_width).  Extra dimensions specific to this shape:
  --bp K     bounce_packet override (default: RTConfig default)
  --spp N    samples per pass (default 2, the ladder's floor)

Per entry prints: build info, compile s, run s/frame, Mrays/s.

Usage: python tools/exp_cfg3.py [--grid 4x4,8x8] [--frames 2]
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one(spec: str, frames: int, spp: int, bp: int) -> None:
    from vortex_rt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.models.scene import RenderParams, Scene
    from vortex_rt_tpu.utils.config import RTConfig

    bw, leaf = (int(x) for x in spec.split("+")[0].split("x"))
    sc = Scene()
    sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    cfg_kw = dict(flatten=True, bvh_width=bw, max_leaf_tris=leaf)
    if bp >= 0:
        cfg_kw["bounce_packet"] = bp
    knobs = spec.split("+")[1:]
    for k in knobs:
        if k.startswith("f") and k[1:].isdigit():
            # multi-front bounce-wave walk (trace_packets fronts)
            cfg_kw["bounce_fronts"] = int(k[1:])
        if k.startswith("s") and k[1:].isdigit():
            # slab size in Ki lanes (s128 -> 131072): the while-loop
            # gather batch (rule 33 — amortize the ~13 us fixed
            # iteration latency over more packets)
            cfg_kw["slab"] = int(k[1:]) * 1024
    if "pw" in knobs:
        # route waves through the Mosaic per-ray scalar walk (width-4
        # only; incoherent bounce waves pay NO union waste there)
        cfg_kw["pallas_waves"] = "all"
    elif "pwc" in knobs:
        cfg_kw["pallas_waves"] = "coherent"
    cfg = RTConfig(**cfg_kw)
    sb = sc.build(cfg)
    r = WavefrontRenderer.from_buffers(sb, cfg)
    print(f"[{spec}] tris={sb.num_tris} nodes={r.wa.nodes.shape[0]} "
          f"depth={r.wa.depth} bp={cfg.bounce_packet}", flush=True)
    cam = Scene.framing_camera(sb, 45.0, 1920 / 1080)
    p = RenderParams(max_depth=3, spp=spp, shadow=True, pathtrace=True)

    t0 = time.time()
    n = r.render_burst(cam, p, 1920, 1080, n_frames=1, seed0=0,
                       rays_only=True)
    print(f"[{spec}] compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    total = 0
    for i in range(frames):
        total += int(r.render_burst(cam, p, 1920, 1080, n_frames=1,
                                    seed0=i + 1, rays_only=True))
    dt = time.perf_counter() - t0
    print(f"[{spec}] {dt/frames:.2f} s/frame  "
          f"{total/dt/1e6:.2f} Mrays/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="4x4,8x4,8x8")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bp", type=int, default=-1)
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one:
        run_one(args.one, args.frames, args.spp, args.bp)
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
             "--frames", str(args.frames), "--spp", str(args.spp),
             "--bp", str(args.bp)],
            env=env)
        if rc != 0:
            print(f"[{spec}] FAILED rc={rc}", flush=True)


if __name__ == "__main__":
    main()
