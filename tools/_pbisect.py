"""Profiling scratch: bisect render_burst vs raw map probe difference."""
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
from vortex_rt_tpu.engine.wavefront import (  # noqa: E402
    WavefrontRenderer, frame_body, render_burst,
)
from vortex_rt_tpu.models.scene import Camera, RenderParams  # noqa: E402
from vortex_rt_tpu.ops.shade_lanes import ShadeArrays  # noqa: E402
from vortex_rt_tpu.ops.traverse_wide import WideArrays  # noqa: E402

K = 16
W = H = 512


def timeit(f, label, n=3):
    out = f(0)
    _ = np.asarray(jax.tree.leaves(out)[-1]).reshape(-1)[:1]
    t0 = time.perf_counter()
    outs = [f(i) for i in range(n)]
    _ = [np.asarray(jax.tree.leaves(o)[-1]).reshape(-1)[:1] for o in outs]
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms/burst ({dt/K*1e3:.2f} ms/frame)",
          flush=True)


def main():
    sb = build_scene()
    wa = WideArrays.from_scene(sb)
    sa = ShadeArrays.from_scene(sb)
    cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                         45.0, 1.0)
    ca = CameraArrays.from_camera(cam)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2, shadow=True)
    light = LightArrays.from_params(params)

    # A: pure map probe (the 85 Mrays/s shape)
    @partial(jax.jit, static_argnames=())
    def probe(wa, sa, ca, light, seed0):
        def one(seed):
            img, rays, steps = frame_body(
                wa, sa, ca, light, W, H, W * H, 0, max_depth=2,
                packet=128, tile_w=16, tile_h=8, seed=seed, shadow=True)
            return img.sum(), rays

        c, r = jax.lax.map(one, seed0 + jnp.arange(K))
        return c.sum(), r.sum()

    timeit(lambda i: probe(wa, sa, ca, light, jnp.int32(i * K)), "A probe")

    # B: module render_burst with default table
    timeit(lambda i: render_burst(wa, sa, ca, light, W, H, n_frames=K,
                                  seed0=i * K, max_depth=2, packet=128,
                                  shadow=True, tile_w=16, tile_h=8)[1],
           "B render_burst")

    # C: probe + last-frame image materialization (the delta of B over A)
    @jax.jit
    def probe_img(wa, sa, ca, light, seed0):
        def one(seed):
            img, rays, steps = frame_body(
                wa, sa, ca, light, W, H, W * H, 0, max_depth=2,
                packet=128, tile_w=16, tile_h=8, seed=seed, shadow=True)
            return img.sum(), rays

        c, r = jax.lax.map(one, seed0 + jnp.arange(K - 1))
        img, r2, s2 = frame_body(
            wa, sa, ca, light, W, H, W * H, 0, max_depth=2,
            packet=128, tile_w=16, tile_h=8, seed=seed0 + K - 1, shadow=True)
        out = img.reshape(3, H, W).transpose(1, 2, 0) + c.sum() * 1e-30
        return out, r.sum() + r2

    timeit(lambda i: probe_img(wa, sa, ca, light, jnp.int32(i * K))[1],
           "C probe+last-img")

    # D: renderer API
    r = WavefrontRenderer.from_buffers(sb)
    timeit(lambda i: r.render_burst(cam, params, W, H, n_frames=K,
                                    seed0=i * K, rays_only=True),
           "D renderer.render_burst")


if __name__ == "__main__":
    main()
