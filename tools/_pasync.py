"""Profiling scratch: does avoiding early D2H keep async dispatch mode?"""
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

    def frame(seed):
        return render_wavefront(wa, sa, ca, light, w, h, max_depth=2,
                                packet=128, tile_w=16, tile_h=8, seed=seed)

    # warm WITHOUT D2H: dispatch once, wait by sleeping
    img, nr, st = frame(0)
    time.sleep(10)

    n = 8
    t0 = time.perf_counter()
    acc = None
    for i in range(n):
        img, nr, st = frame(i)
        acc = nr if acc is None else acc + nr
        print("dispatched", i, time.perf_counter() - t0, flush=True)
    t_dispatch = time.perf_counter() - t0
    total = int(np.asarray(acc))  # first D2H of the process
    dt = time.perf_counter() - t0
    print(f"async-mode: dispatch wall {t_dispatch*1e3:.1f} ms, "
          f"to-sync {dt/n*1e3:.1f} ms/frame, {total/dt/1e6:.2f} Mrays/s",
          flush=True)

    # now in sync mode, same loop
    t0 = time.perf_counter()
    acc = None
    for i in range(n):
        img, nr, st = frame(i)
        acc = nr if acc is None else acc + nr
    total = int(np.asarray(acc))
    dt = time.perf_counter() - t0
    print(f"sync-mode:  {dt/n*1e3:.1f} ms/frame, {total/dt/1e6:.2f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
