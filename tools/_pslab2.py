"""Profiling scratch: slab-size sweep for the slab-major frame."""
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import bench_scene
from vortex_rt_tpu.engine import wavefront as wf
from vortex_rt_tpu.engine.megakernel import LightArrays
from vortex_rt_tpu.models.scene import Camera, RenderParams
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer

sb = bench_scene()
cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                     45.0, 1.0)
r = WavefrontRenderer.from_buffers(sb)
WA, SA = r.wa, r.sa
LIGHT = LightArrays.from_params(RenderParams(light_pos=(0, 0.8, -0.5)))
W = H = 512
SPP = 2
CA = wf.CameraArrays.from_camera(cam)
NB = 8


def timeit(name, slab):
    def stage(wa, sa, ca, light, seed):
        img, rays, _ = wf.frame_body(wa, sa, ca, light, W, H, W * H, 0,
                                     max_depth=2, spp=SPP, seed=seed,
                                     packet=128, shadow=True,
                                     tile_w=16, tile_h=8, slab=slab)
        return img.sum()

    @jax.jit
    def prog(wa, sa, ca, light):
        return jax.lax.map(lambda s: stage(wa, sa, ca, light, s),
                           jnp.arange(NB, dtype=jnp.int32)).sum()

    float(prog(WA, SA, CA, LIGHT))
    t0 = time.perf_counter()
    for _ in range(3):
        out = prog(WA, SA, CA, LIGHT)
    float(out)
    dt = (time.perf_counter() - t0) / 3 / NB
    print(f"{name:30s} {dt * 1e3:8.2f} ms/frame "
          f"({W*H*SPP*2.08/dt/1e9:.1f} Mrays/s)", flush=True)


for slab in (8192, 16384, 32768, 65536, 131072):
    timeit(f"d2+shadow slab={slab}", slab)
