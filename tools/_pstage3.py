"""Profiling scratch: HONEST stage costs — distinct frames (spp=2, seeded
jitter), map-wrapped, ONE scalar output, scalar D2H sync."""
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
from vortex_rt_tpu.engine.shaders import (
    PayloadLanes, RayLanes, ShaderContext, ShaderTable,
)
from vortex_rt_tpu.models.scene import Camera, RenderParams
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.ops.shade_lanes import shade_point
from vortex_rt_tpu.ops.traverse_packet import trace_packets

sb = bench_scene()
cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                     45.0, 1.0)
r = WavefrontRenderer.from_buffers(sb)
WA, SA = r.wa, r.sa
LIGHT = LightArrays.from_params(RenderParams(light_pos=(0, 0.8, -0.5)))
W = H = 512
SPP = 2
R = W * H * SPP
CA = wf.CameraArrays.from_camera(cam)
NB = 8
table = ShaderTable()


def gen(ca, seed):
    samp = (jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(SPP)
            + (jnp.arange(R, dtype=jnp.int32) % SPP).astype(jnp.uint32))
    return wf._camera_lanes_tiled(ca, W, H, SPP, samp, SPP, 16, 8,
                                  W * H, 0)


def s_cam(wa, sa, ca, light, seed):
    ox, oy, oz, dx, dy, dz, pix = gen(ca, seed)
    return dx.sum() + dy.sum() + pix.sum().astype(jnp.float32)


def s_trace(wa, sa, ca, light, seed):
    ox, oy, oz, dx, dy, dz, pix = gen(ca, seed)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    h, st = trace_packets(wa, o3, d3, packet=128)
    return h.dist.sum() + h.bx.sum()


def s_shade(wa, sa, ca, light, seed):
    ox, oy, oz, dx, dy, dz, pix = gen(ca, seed)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    h, st = trace_packets(wa, o3, d3, packet=128)
    tri_c = jnp.clip(h.tri, 0, sa.shade_rows.shape[0] - 1)
    inst_c = jnp.clip(h.inst, 0, sa.inst_shade.shape[0] - 1)
    sp = shade_point(sa, ox, oy, oz, dx, dy, dz, h.dist, h.bx, h.by,
                     1.0 - h.bx - h.by, tri_c, inst_c)
    ctx = ShaderContext(shade=sa, light_pos=light.light_pos,
                        light_color=light.light_color,
                        ambient=light.ambient,
                        background=light.background, max_depth=2)
    ray = RayLanes(ox, oy, oz, dx, dy, dz)
    pl = PayloadLanes(jnp.ones(R), jnp.zeros(R, jnp.int32), pix,
                      pix.astype(jnp.uint32))
    co = table.closest(ctx, sp, ray, pl)
    return co.add_r.sum() + co.sdx.sum()


def s_frame_d1(wa, sa, ca, light, seed):
    img, rays, _ = wf.frame_body(wa, sa, ca, light, W, H, W * H, 0,
                                 max_depth=1, spp=SPP, seed=seed,
                                 packet=128, tile_w=16, tile_h=8)
    return img.sum()


def s_frame_d2(wa, sa, ca, light, seed):
    img, rays, _ = wf.frame_body(wa, sa, ca, light, W, H, W * H, 0,
                                 max_depth=2, spp=SPP, seed=seed,
                                 packet=128, tile_w=16, tile_h=8)
    return img.sum()


def s_frame_d2s(wa, sa, ca, light, seed):
    img, rays, _ = wf.frame_body(wa, sa, ca, light, W, H, W * H, 0,
                                 max_depth=2, spp=SPP, seed=seed,
                                 packet=128, shadow=True,
                                 tile_w=16, tile_h=8)
    return img.sum()


def burst(stage_fn):
    @jax.jit
    def prog(wa, sa, ca, light):
        return jax.lax.map(
            lambda s: stage_fn(wa, sa, ca, light, s),
            jnp.arange(NB, dtype=jnp.int32)).sum()
    return prog


def timeit(name, prog):
    float(prog(WA, SA, CA, LIGHT))
    t0 = time.perf_counter()
    for _ in range(3):
        out = prog(WA, SA, CA, LIGHT)
    float(out)
    dt = (time.perf_counter() - t0) / 3 / NB
    print(f"{name:30s} {dt * 1e3:8.2f} ms/frame", flush=True)


timeit("camera (524k lanes)", burst(s_cam))
timeit("camera+trace", burst(s_trace))
timeit("camera+trace+shade", burst(s_shade))
timeit("frame depth1", burst(s_frame_d1))
timeit("frame depth2", burst(s_frame_d2))
timeit("frame depth2+shadow", burst(s_frame_d2s))
