"""Attribute the bench burst program's first-compile cost (VERDICT r3
weak #3 / next-round #7: nonce-0 compile measured 547-626 s while
nonce-1 of the SAME program modulo one constant costs 25-45 s).

Splits the first call into its phases, per nonce, in one process:

  trace_lower_s   jax tracing + StableHLO lowering (pure host Python/MLIR)
  backend_s       XLA:TPU compilation (axon remote or local)
  first_run_s     first dispatch (H2D of scene tables + execute)
  steady_ms       per-frame time after warmup

Usage:  python tools/diag_compile.py [--frames 16] [--nonces 2]
        [--width 512] [--height 512]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--nonces", type=int, default=2)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent compile cache for the run")
    a = ap.parse_args()

    import jax

    if a.no_cache:
        jax.config.update("jax_compilation_cache_dir", None)

    from vortex_rt_tpu.engine.wavefront import (
        WavefrontRenderer, render_burst,
    )
    from vortex_rt_tpu.models.procedural import cornell_box, uv_sphere
    from vortex_rt_tpu.models.scene import RenderParams, Scene
    from vortex_rt_tpu.utils import vecmath as vm
    from vortex_rt_tpu.utils.config import RTConfig

    t0 = time.perf_counter()
    sc = Scene()
    for mesh, refl in cornell_box():
        sc.add_instance(sc.add_mesh(mesh), reflectivity=refl)
    ms = sc.add_mesh(uv_sphere((0, -0.45, -0.2), 0.35, 16, 24))
    sc.add_instance(ms, vm.mat4_translate([0.3, 0, 0]), reflectivity=0.3)
    cfg = RTConfig(flatten=True)
    sb = sc.build(cfg)
    r = WavefrontRenderer.from_buffers(sb, config=cfg)
    cam = Scene.framing_camera(sb, 45.0, a.width / a.height)
    params = RenderParams(max_depth=2, spp=2, shadow=True)
    print(f"scene+build: {time.perf_counter() - t0:.1f}s  "
          f"tris={sb.num_tris}", flush=True)

    table = r._table_for(params)
    ca, light = r._dev_args(cam, params)
    kw = dict(width=a.width, height=a.height, n_frames=a.frames,
              max_depth=params.max_depth, spp=params.spp, table=table,
              shadow=True, packet=r.config.packet_size,
              chunk=r.config.lanes,
              bounce_packet=r.config.bounce_packet,
              shadow_packet=r.config.shadow_packet,
              tile_w=r.config.tile_w, tile_h=r.config.tile_h)

    def run_nonce(nonce):
        t0 = time.perf_counter()
        lowered = render_burst.lower(r.wa, r.sa, ca, light, seed0=0,
                                     tune_nonce=nonce, **kw)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(r.wa, r.sa, ca, light, seed0=0)
        jax.block_until_ready(out)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(r.wa, r.sa, ca, light, seed0=1)
        jax.block_until_ready(out)
        t_run = time.perf_counter() - t0
        print(f"nonce={nonce}: trace_lower={t_lower:.1f}s "
              f"backend={t_comp:.1f}s first_run={t_first:.1f}s "
              f"steady={t_run * 1e3 / a.frames:.2f} ms/frame", flush=True)

    for n in range(a.nonces):
        run_nonce(n)


if __name__ == "__main__":
    main()
