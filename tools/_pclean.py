"""Profiling scratch: clean high-n frame timing, single sync."""
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

    def frame(seed, depth=2):
        return render_wavefront(wa, sa, ca, light, w, h, max_depth=depth,
                                packet=128, tile_w=16, tile_h=8, seed=seed)

    # warm
    img, nr, st = frame(0)
    _ = np.asarray(nr)

    for n in (10, 30):
        t0 = time.perf_counter()
        acc = None
        for i in range(n):
            img, nr, st = frame(i)
            acc = nr if acc is None else acc + nr
        total = int(np.asarray(acc))
        dt = time.perf_counter() - t0
        print(f"n={n}: {dt/n*1e3:.1f} ms/frame, {total/dt/1e6:.2f} Mrays/s",
              flush=True)

    # same but re-using seed 0 every time (constant args)
    t0 = time.perf_counter()
    acc = None
    for i in range(30):
        img, nr, st = frame(0)
        acc = nr if acc is None else acc + nr
    total = int(np.asarray(acc))
    dt = time.perf_counter() - t0
    print(f"n=30 same-args: {dt/30*1e3:.1f} ms/frame, "
          f"{total/dt/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
