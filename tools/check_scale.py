"""Scale-ladder check on real hardware: render BASELINE configs 3-4
stand-ins at 1080p, time sustained bursts, and gate with the sampled-pixel
oracle.  Usage:

    python tools/check_scale.py [bunny|atrium|waves] [--spp N] [--depth N]
    python tools/check_scale.py all

Writes nothing; prints one JSON line per config (the bench ladder records
these via tools/bench_ladder.py).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.golden.renderer import sample_pixel_parity
from vortex_rt_tpu.models import bigscenes
from vortex_rt_tpu.models.scene import RenderParams, Scene


def build(name):
    sc = Scene()
    if name == "bunny":
        sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    elif name == "atrium":
        for m, refl in bigscenes.atrium():
            sc.add_instance(sc.add_mesh(m), reflectivity=refl)
    elif name == "waves":
        sc.add_instance(sc.add_mesh(bigscenes.wavy_grid()))
    else:
        raise SystemExit(f"unknown scene {name}")
    return sc.build()


def run(name, width, height, spp, depth, burst, parity_n):
    t0 = time.time()
    sb = build(name)
    r = WavefrontRenderer.from_buffers(sb)
    cam = Scene.framing_camera(sb, 45.0, width / height, zoom=1.0)
    params = RenderParams(max_depth=depth, spp=spp, shadow=True)
    t_build = time.time() - t0

    t0 = time.time()
    img, _ = r.render_burst(cam, params, width, height, n_frames=burst)
    t_compile = time.time() - t0

    t0 = time.time()
    nrays = r.render_burst(cam, params, width, height, n_frames=burst,
                           seed0=100, rays_only=True)
    dt = time.time() - t0

    rec = dict(scene=name, tris=sb.num_tris, res=f"{width}x{height}",
               spp=spp, depth=depth,
               build_s=round(t_build, 2), compile_s=round(t_compile, 1),
               ms_per_frame=round(dt * 1e3 / burst, 2),
               mrays=round(nrays / dt / 1e6, 2))
    if spp == 1 and parity_n:
        rmse, worst, where = sample_pixel_parity(
            sb, cam, params, width, height, img, n=parity_n, seed=11)
        rec.update(parity_rmse=round(rmse, 6), parity_worst=round(worst, 4),
                   parity_at=where)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="all")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--burst", type=int, default=4)
    ap.add_argument("--parity", type=int, default=256)
    a = ap.parse_args()
    scenes = ["bunny", "atrium"] if a.scene == "all" else [a.scene]
    for s in scenes:
        run(s, a.width, a.height, a.spp, a.depth, a.burst, a.parity)


if __name__ == "__main__":
    main()
