"""Profiling scratch: burst length and shadow as basin factors.
Same fb body as production render_burst via the public API."""
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from bench import bench_scene
from vortex_rt_tpu.models.scene import Camera, RenderParams
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer

sb = bench_scene()
cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                     45.0, 1.0)
r = WavefrontRenderer.from_buffers(sb)
p_ns = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2, spp=2)
p_sh = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2, shadow=True,
                    spp=2)

for name, p in (("noshadow", p_ns), ("shadow", p_sh)):
    for nb in (8, 16, 32, 64):
        t0 = time.perf_counter()
        r.render_burst(cam, p, 512, 512, n_frames=nb, rays_only=True)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = r.render_burst(cam, p, 512, 512, n_frames=nb, seed0=50,
                           rays_only=True)
        dt = time.perf_counter() - t0
        print(f"{name:9s} n={nb:3d} compile={tc:6.1f}s "
              f"{dt * 1e3 / nb:7.2f} ms/frame  "
              f"{n / dt / 1e6:6.1f} Mrays/s", flush=True)
