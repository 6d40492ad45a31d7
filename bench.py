"""Headline benchmark: Mrays/s on the flagship render path.

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
    import jax

    from vortex_rt_tpu.models.procedural import cornell_box, random_soup
    from vortex_rt_tpu.models.scene import RenderParams, Scene

    # benchmark scene: cornell box + a dense random soup (tens of thousands
    # of tris) at 512x512, 2 bounces — a mid-ladder BASELINE.json config
    rng = np.random.default_rng(0)
    sc = Scene()
    for mesh, refl in cornell_box():
        i = sc.add_mesh(mesh)
        sc.add_instance(i, reflectivity=refl)
    soup = sc.add_mesh(random_soup(rng, 20_000, extent=0.8, tri_size=0.05))
    sc.add_instance(soup)
    sb = sc.build()

    width = height = 256
    max_depth = 2
    cam = Scene.framing_camera(sb, 45.0, 1.0)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=max_depth)

    try:
        from vortex_rt_tpu.engine.wavefront import WavefrontRenderer as R
    except ImportError:
        from vortex_rt_tpu.engine.megakernel import MegakernelRenderer as R
    r = R.from_buffers(sb)

    # warmup (compile)
    img, nrays = r.render(cam, params, width, height)
    jax.block_until_ready(img) if hasattr(img, "block_until_ready") else None

    iters = 5
    t0 = time.perf_counter()
    total_rays = 0
    for _ in range(iters):
        img, nrays = r.render(cam, params, width, height)
        total_rays += int(nrays)
    np.asarray(img)  # sync
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/s (512x512, 2-bounce, ~20k tris, 8 instances)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
