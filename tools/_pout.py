"""Profiling scratch: does a large program OUTPUT slow sync-mode dispatch?"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from tools._ppack import build_scene  # noqa: E402
from vortex_rt_tpu.engine.megakernel import CameraArrays, LightArrays  # noqa
from vortex_rt_tpu.engine.wavefront import render_burst  # noqa: E402
from vortex_rt_tpu.models.scene import Camera, RenderParams  # noqa: E402
from vortex_rt_tpu.ops.shade_lanes import ShadeArrays  # noqa: E402
from vortex_rt_tpu.ops.traverse_wide import WideArrays  # noqa: E402


from vortex_rt_tpu.engine.wavefront import frame_body  # noqa: E402


@partial(jax.jit, static_argnames=("w", "h", "k", "shadow"))
def burst_scalar(wa, sa, ca, light, seed0, w: int, h: int, k: int,
                 shadow: bool):
    def one(seed):
        img, rays, steps = frame_body(
            wa, sa, ca, light, w, h, w * h, 0, max_depth=2,
            packet=128, tile_w=16, tile_h=8, seed=seed, shadow=shadow)
        return img, rays

    imgs, rays = jax.lax.map(one, seed0 + jnp.arange(k))
    return imgs[-1], rays.sum()


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

    k = 16
    # scalar-output burst
    s, r0 = burst_scalar(wa, sa, ca, light, 0, w, h, k, True)
    _ = np.asarray(r0)
    t0 = time.perf_counter()
    tot = 0
    for i in range(3):
        s, r0 = burst_scalar(wa, sa, ca, light, i * k, w, h, k, True)
        tot += int(np.asarray(r0))
    dt = time.perf_counter() - t0
    print(f"scalar-out: {dt/3/k*1e3:.1f} ms/frame {tot/dt/1e6:.1f} Mrays/s",
          flush=True)

    # image-output burst (rays_only semantics: don't transfer the image)
    img, r0, st = render_burst(wa, sa, ca, light, w, h, n_frames=k,
                               seed0=0, max_depth=2, packet=128,
                               shadow=True, tile_w=16, tile_h=8)
    _ = np.asarray(r0)
    t0 = time.perf_counter()
    tot = 0
    for i in range(3):
        img, r0, st = render_burst(wa, sa, ca, light, w, h, n_frames=k,
                                   seed0=i * k, max_depth=2, packet=128,
                                   shadow=True, tile_w=16, tile_h=8)
        tot += int(np.asarray(r0))
    dt = time.perf_counter() - t0
    print(f"img-out:    {dt/3/k*1e3:.1f} ms/frame {tot/dt/1e6:.1f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
