"""Profiling scratch: new fused frame end-to-end on the real chip."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from tools._ppack import build_scene  # noqa: E402
from vortex_rt_tpu.engine.megakernel import CameraArrays, LightArrays  # noqa
from vortex_rt_tpu.engine.wavefront import render_wavefront  # noqa: E402
from vortex_rt_tpu.models.scene import Camera, RenderParams  # noqa: E402
from vortex_rt_tpu.ops.shade_lanes import ShadeArrays  # noqa: E402
from vortex_rt_tpu.ops.traverse_wide import WideArrays  # noqa: E402


def main():
    sb = build_scene()
    wa = WideArrays.from_scene(sb)
    sa = ShadeArrays.from_scene(sb)
    w = h = 512
    cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                         45.0, 1.0)
    ca = CameraArrays.from_camera(cam)
    light = LightArrays.from_params(
        RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2))

    for pk, tw, th in ((128, 16, 8), (256, 16, 16)):
        for shadow in (False, True):
            img, nrays, steps = render_wavefront(
                wa, sa, ca, light, w, h, max_depth=2, packet=pk,
                tile_w=tw, tile_h=th, shadow=shadow)
            _ = np.asarray(nrays)
            iters = 10
            t0 = time.perf_counter()
            outs = [render_wavefront(wa, sa, ca, light, w, h, max_depth=2,
                                     packet=pk, tile_w=tw, tile_h=th,
                                     shadow=shadow, seed=i)
                    for i in range(iters)]
            total = int(np.asarray(sum(o[1] for o in outs)))
            dt = time.perf_counter() - t0
            print(f"pk={pk} shadow={shadow}: {dt/iters*1e3:.1f} ms/frame "
                  f"rays/frame={total//iters} steps={int(np.asarray(outs[0][2]))} "
                  f"{total/dt/1e6:.1f} Mrays/s", flush=True)

    # image correctness spot check vs previous behaviour: dump min/max
    img = np.asarray(outs[0][0])
    print("img range", img.min(), img.max(), img.mean(), flush=True)


if __name__ == "__main__":
    main()
