"""Profiling scratch: where do the bench frame's 52 ms go?

Measures on the real chip with single-sync timing: raw primary trace,
secondary trace, occlusion trace, full no-shadow frame, full shadow
frame, in and out of bursts."""
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_scene
from vortex_rt_tpu.engine import wavefront as wf
from vortex_rt_tpu.models.scene import Camera, RenderParams
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.ops.traverse_packet import trace_packets

sb = bench_scene()
cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                     45.0, 1.0)
r = WavefrontRenderer.from_buffers(sb)
wa, sa = r.wa, r.sa
W = H = 512
R = W * H
ca = wf.CameraArrays.from_camera(cam)


def timeit(name, fn, reps=8):
    fn()  # compile
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    # single scalar sync
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


@jax.jit
def prim_trace(wa, ca):
    ox, oy, oz, dx, dy, dz, pix = wf._camera_lanes_tiled(
        ca, W, H, 1, jax.random.PRNGKey(0), 16, 8, R, 0)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    h, st = trace_packets(wa, o3, d3, packet=128)
    return h.dist.sum(), st


@jax.jit
def prim_trace_x2(wa, ca):
    a = prim_trace(wa, ca)
    ox, oy, oz, dx, dy, dz, pix = wf._camera_lanes_tiled(
        ca, W, H, 1, jax.random.PRNGKey(1), 16, 8, R, 0)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    h, st = trace_packets(wa, o3, d3, packet=128)
    return a[0] + h.dist.sum(), a[1] + st


params_ns = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2)
params_sh = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2, shadow=True)
params_d1 = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=1)

t = timeit("raw primary trace", lambda: prim_trace(wa, ca))
print(f"  -> {R / t / 1e6:.1f} Mrays/s")
timeit("raw primary trace x2-in-program", lambda: prim_trace_x2(wa, ca))

for name, p, nf in [
    ("frame depth1 noshadow b8", params_d1, 8),
    ("frame depth2 noshadow b8", params_ns, 8),
    ("frame depth2 shadow   b8", params_sh, 8),
]:
    dt = timeit(name, lambda p=p, nf=nf: r.render_burst(
        cam, p, W, H, n_frames=nf, rays_only=True), reps=3)
    print(f"  -> per frame {dt / nf * 1e3:.2f} ms", flush=True)

st = np.asarray(prim_trace(wa, ca)[1])
print("primary trace steps:", st)
