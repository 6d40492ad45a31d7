import time, numpy as np, jax
from vortex_rt_tpu.models.procedural import cornell_box, random_soup
from vortex_rt_tpu.models.scene import RenderParams, Scene
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.utils.config import RTConfig

rng = np.random.default_rng(0)
sc = Scene()
for mesh, refl in cornell_box():
    i = sc.add_mesh(mesh); sc.add_instance(i, reflectivity=refl)
soup = sc.add_mesh(random_soup(rng, 20000, extent=0.8, tri_size=0.05))
sc.add_instance(soup)
sb = sc.build()
r = WavefrontRenderer.from_buffers(sb, RTConfig(lanes=4096))
cam = Scene.framing_camera(sb, 45.0, 1.0)
params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2)
for W in (256, 512):
    t0=time.perf_counter(); img, nrays = r.render(cam, params, W, W)
    print(W, "compile+first", round(time.perf_counter()-t0,1), "s", flush=True)
    t0=time.perf_counter()
    N=3
    for _ in range(N): img, nrays = r.render(cam, params, W, W)
    dt=(time.perf_counter()-t0)/N
    print(W, f"frame {dt*1e3:.1f} ms, {nrays} rays, {nrays/dt/1e6:.1f} Mrays/s", flush=True)
