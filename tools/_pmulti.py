"""Profiling scratch: K frames per dispatch via lax.map (amortize RTT)."""
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
from vortex_rt_tpu.engine.wavefront import frame_body  # noqa: E402
from vortex_rt_tpu.models.scene import Camera, RenderParams  # noqa: E402
from vortex_rt_tpu.ops.shade_lanes import ShadeArrays  # noqa: E402
from vortex_rt_tpu.ops.traverse_wide import WideArrays  # noqa: E402
from functools import partial  # noqa: E402


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

    @partial(jax.jit, static_argnames=("k", "shadow"))
    def frames(wa, sa, ca, light, seed0, k: int, shadow: bool = False):
        def one(seed):
            img, rays, steps = frame_body(
                wa, sa, ca, light, w, h, w * h, 0, max_depth=2,
                packet=128, tile_w=16, tile_h=8, seed=seed, shadow=shadow)
            return img.sum(), rays

        sums, rays = jax.lax.map(one, seed0 + jnp.arange(k))
        return sums.sum(), rays.sum()

    for shadow in (False, True):
        for k in (4, 16):
            s, r0 = frames(wa, sa, ca, light, jnp.int32(0), k, shadow)
            _ = np.asarray(s)
            t0 = time.perf_counter()
            reps = 3
            tot = 0
            for i in range(reps):
                s, r0 = frames(wa, sa, ca, light, jnp.int32(i * k), k, shadow)
                tot += int(np.asarray(r0))
            dt = time.perf_counter() - t0
            print(f"shadow={shadow} k={k}: {dt/reps/k*1e3:.1f} ms/frame, "
                  f"{tot/dt/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
