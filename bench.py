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
    from vortex_rt_tpu.models.procedural import cornell_box, random_soup
    from vortex_rt_tpu.models.scene import RenderParams, Scene
    from vortex_rt_tpu.utils.config import RTConfig

    # benchmark scene: cornell box + a dense 20k-tri soup, 256x256,
    # 2 bounces (a mid-ladder BASELINE.json config)
    rng = np.random.default_rng(0)
    sc = Scene()
    for mesh, refl in cornell_box():
        i = sc.add_mesh(mesh)
        sc.add_instance(i, reflectivity=refl)
    soup = sc.add_mesh(random_soup(rng, 20_000, extent=0.8, tri_size=0.05))
    sc.add_instance(soup)
    sb = sc.build()

    width = height = 256
    cam = Scene.framing_camera(sb, 45.0, 1.0)
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
        "metric": "Mrays/s (wavefront, 256x256, 2-bounce, ~20k tris)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
