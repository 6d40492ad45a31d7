"""Headline benchmark: Mrays/s on the flagship wavefront render path.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever JAX platform is available (TPU under axon; CPU otherwise).
Baseline: the reference publishes no RT throughput (BASELINE.md), so
vs_baseline is measured against the BASELINE.json north-star target of
200 Mrays/s/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_MRAYS = 200.0


def main() -> None:
    from vortex_rt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models.procedural import cornell_box
    from vortex_rt_tpu.models.scene import RenderParams, Scene
    from vortex_rt_tpu.utils.config import RTConfig

    # benchmark scene (BASELINE.json config 2 ladder): Cornell box with
    # structured geometry inside (reference teapot asset when present,
    # procedural spheres otherwise), 512x512, 2 bounces
    import os

    from vortex_rt_tpu.models.procedural import uv_sphere
    from vortex_rt_tpu.utils import vecmath as vm

    sc = Scene()
    for mesh, refl in cornell_box():
        i = sc.add_mesh(mesh)
        sc.add_instance(i, reflectivity=refl)
    teapot = "/root/reference/tests/regression/raytracing/assets/teapot.obj"
    if os.path.exists(teapot):
        from vortex_rt_tpu.io.obj import load_obj

        m = sc.add_mesh(load_obj(teapot))
        lo, hi = sc._meshes[m].aabb()
        s_fit = 0.9 / max(float((hi - lo).max()), 1e-6)
        center = (lo + hi) * 0.5
        sc.add_instance(m, vm.mat4_translate([0.0, -0.4, 0.0])
                        @ vm.mat4_scale(s_fit)
                        @ vm.mat4_translate(-center))
    else:
        m = sc.add_mesh(uv_sphere((0, -0.3, 0), 0.35, 24, 48))
        sc.add_instance(m)
    sb = sc.build()

    width = height = 512
    from vortex_rt_tpu.models.scene import Camera

    cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                         45.0, 1.0)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2)
    r = WavefrontRenderer.from_buffers(sb)

    # warmup (compile)
    img, nrays = r.render(cam, params, width, height)

    iters = 5
    total_rays = 0
    t0 = time.perf_counter()
    for _ in range(iters):
        img, nrays = r.render(cam, params, width, height)
        total_rays += int(nrays)
    np.asarray(img)  # sync
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/s (wavefront+packets, cornell+teapot ~6k tris, 512x512, 2-bounce)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
