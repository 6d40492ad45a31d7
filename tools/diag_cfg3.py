"""Staged diagnosis of the BASELINE config-3 TPU worker crash.

Runs config 3's pieces one at a time, smallest first, printing a line
after each stage so the crash point is unambiguous in the log.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def stage(name):
    print(f"[{time.strftime('%H:%M:%S')}] STAGE {name}", flush=True)


def main():
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.models.scene import RenderParams, Scene

    stage("build scene (host)")
    sc = Scene()
    sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    sb = sc.build()
    print("tris:", sb.num_tris, flush=True)

    stage("renderer from SAH buffers")
    r = WavefrontRenderer.from_buffers(sb)
    cam = Scene.framing_camera(sb, 45.0, 1920 / 1080)

    stage("1080p spp2 d1 whitted single frame (known-good shape)")
    p = RenderParams(max_depth=1, spp=2, shadow=True)
    t0 = time.time()
    img, _ = r.render(cam, p, 1920, 1080)
    jax.block_until_ready(img)
    print(f"ok {time.time()-t0:.1f}s", flush=True)

    stage("1080p spp2 d3 PATHTRACE single frame")
    p = RenderParams(max_depth=3, spp=2, shadow=True, pathtrace=True)
    t0 = time.time()
    img, _ = r.render(cam, p, 1920, 1080)
    jax.block_until_ready(img)
    print(f"ok compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    img, _ = r.render(cam, p, 1920, 1080)
    jax.block_until_ready(img)
    print(f"ok run {time.time()-t0:.1f}s", flush=True)

    stage("1080p spp4 d3 pathtrace single frame")
    p4 = RenderParams(max_depth=3, spp=4, shadow=True, pathtrace=True)
    t0 = time.time()
    img, _ = r.render(cam, p4, 1920, 1080)
    jax.block_until_ready(img)
    print(f"ok compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    img, _ = r.render(cam, p4, 1920, 1080)
    jax.block_until_ready(img)
    dt = time.time() - t0
    print(f"ok run {dt:.1f}s/frame", flush=True)

    stage("1080p spp4 d3 pathtrace burst n=2")
    t0 = time.time()
    tot = r.render_burst(cam, p4, 1920, 1080, n_frames=2, seed0=11,
                         rays_only=True)
    print(f"ok compile+run {time.time()-t0:.1f}s rays={tot}", flush=True)

    stage("1080p spp4 d3 pathtrace burst n=8 (the ladder's reroll shape)")
    t0 = time.time()
    tot = r.render_burst(cam, p4, 1920, 1080, n_frames=8, seed0=23,
                         rays_only=True)
    print(f"ok compile+run {time.time()-t0:.1f}s rays={tot}", flush=True)

    stage("on-device LBVH build (69k tris)")
    from vortex_rt_tpu.accel.lbvh import build_wide_from_tris
    t0 = time.time()
    wa = build_wide_from_tris(sb)
    jax.block_until_ready(wa.nodes)
    print(f"ok {time.time()-t0:.1f}s nodes={wa.nodes.shape}", flush=True)

    stage("1080p spp2 d3 pathtrace on the LBVH tree")
    r.wa = wa
    t0 = time.time()
    img, _ = r.render(cam, p, 1920, 1080)
    jax.block_until_ready(img)
    print(f"ok compile+run {time.time()-t0:.1f}s", flush=True)

    stage("ALL OK")


if __name__ == "__main__":
    main()
