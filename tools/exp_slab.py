"""Rule-33 exploitation sweep: slab x bounce_packet x fronts at the
config-3 shape (VERDICT r4 #1).

The law (ARCHITECTURE.md rule 33, tools/exp_gather.py): the packet
loop's chained node-row gather costs ~13 us FIXED per while-loop
iteration + ~2.5 ns/row, so at B = slab/bounce_packet ~ 1024 packets
per iteration the config-3 frame is ~88% iteration-latency floor.
B scales with slab (more packets walk per iteration; fewer lax.map
groups per frame) and 1/bounce_packet; fronts multiply the stack nodes
consumed per iteration (rule 32).  This sweep fires the grid the round-4
config.py comment left "pending" and prints one JSON row per combo.

Shape matches rule 32's measurement exactly (blob-187 ~70k tris, 1080p,
spp2 depth3 path trace, 8-wide fused flat build) so rows compose with
the existing numbers: fronts=1/slab=32768 measured 2.71 s/frame there.

Usage:
  python tools/exp_slab.py --slabs 32768,131072,262144,524288 \
      --bps 32 --fronts 2 [--spp 2] [--out artifacts/slab_sweep.json]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slabs", default="32768,131072,262144,524288")
    ap.add_argument("--bps", default="32")
    ap.add_argument("--fronts", default="2")
    ap.add_argument("--tiles", default="16",
                    help="tile_w=tile_h values; bounce packets sample "
                         "whole tiles, so smaller tiles tighten bounce-"
                         "origin locality per packet")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="")
    a = ap.parse_args()

    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.models.scene import RenderParams, Scene
    from vortex_rt_tpu.utils.config import RTConfig

    sc = Scene()
    sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    base = RTConfig(flatten=True)
    sb = sc.build(base)
    w, h = 1920, 1080
    cam = Scene.framing_camera(sb, 45.0, w / h)
    p = RenderParams(max_depth=a.depth, spp=a.spp, shadow=True,
                     pathtrace=True)
    import numpy as np

    rows = []
    for slab in [int(x) for x in a.slabs.split(",")]:
      for bp in [int(x) for x in a.bps.split(",")]:
        for fr in [int(x) for x in a.fronts.split(",")]:
            for tl in [int(x) for x in a.tiles.split(",")]:
                cfg = base.replace(slab=slab, bounce_packet=bp,
                                   bounce_fronts=fr, tile_w=tl,
                                   tile_h=tl)
                r = WavefrontRenderer.from_buffers(sb, config=cfg)
                np.asarray(r.wa.nodes[:1])  # force sync mode (rule 31)
                t0 = time.perf_counter()
                r.render_burst(cam, p, w, h, n_frames=1, seed0=100,
                               rays_only=True)
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                total = 0
                for i in range(a.reps):
                    total += r.render_burst(cam, p, w, h, n_frames=1,
                                            seed0=200 + i, rays_only=True)
                dt = time.perf_counter() - t0
                rec = dict(slab=slab, bp=bp, fronts=fr, tile=tl,
                           B=slab // bp,
                           s_per_frame=round(dt / a.reps, 3),
                           mrays=round(total / dt / 1e6, 2),
                           compile_s=round(compile_s, 1),
                           spp=a.spp, depth=a.depth,
                           res=f"{w}x{h}", tris=sb.num_tris,
                           timing="per-dispatch frames")
                print(json.dumps(rec), flush=True)
                rows.append(rec)
    if a.out:
        with open(a.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
