"""Profiling scratch: cost of each frame stage, measured as 8x in-program
bursts with scalar reduction + real D2H sync (the only trustworthy timing
on axon)."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_scene
from vortex_rt_tpu.engine import wavefront as wf
from vortex_rt_tpu.engine.shaders import ShaderContext, ShaderTable, RayLanes, PayloadLanes
from vortex_rt_tpu.engine.megakernel import LightArrays
from vortex_rt_tpu.models.scene import Camera, RenderParams
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.ops.shade_lanes import shade_point
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.utils.config import LARGE_FLOAT

sb = bench_scene()
cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                     45.0, 1.0)
params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2)
r = WavefrontRenderer.from_buffers(sb)
wa, sa = r.wa, r.sa
light = LightArrays.from_params(params)
W = H = 512
R = W * H
N_B = 8
ca = wf.CameraArrays.from_camera(cam)
table = ShaderTable()


def burst(stage_fn):
    """8 reps of stage_fn inside one program, scalar out."""
    @jax.jit
    def prog(wa, sa, ca, light):
        def body(seed):
            return stage_fn(wa, sa, ca, light, seed)
        return jax.lax.map(body, jnp.arange(N_B, dtype=jnp.int32)).sum()
    return prog


def timeit(name, prog, reps=3):
    out = prog(wa, sa, ca, light)
    float(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = prog(wa, sa, ca, light)
    v = float(out)
    dt = (time.perf_counter() - t0) / reps / N_B
    print(f"{name:44s} {dt * 1e3:8.2f} ms/frame", flush=True)
    return dt


def gen_lanes(ca, seed):
    samp = jnp.zeros(R, jnp.uint32) + seed.astype(jnp.uint32)
    return wf._camera_lanes_tiled(ca, W, H, 1, samp, 1, 16, 8, R, 0)


def s_camera(wa, sa, ca, light, seed):
    ox, oy, oz, dx, dy, dz, pix = gen_lanes(ca, seed)
    return dx.sum() + dy.sum() + dz.sum() + pix.sum()


def s_trace(wa, sa, ca, light, seed):
    ox, oy, oz, dx, dy, dz, pix = gen_lanes(ca, seed)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    h, st = trace_packets(wa, o3, d3, packet=128)
    return h.dist.sum() + h.bx.sum() + h.tri.sum() + st


def s_shadepoint(wa, sa, ca, light, seed):
    ox, oy, oz, dx, dy, dz, pix = gen_lanes(ca, seed)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    h, st = trace_packets(wa, o3, d3, packet=128)
    tri_c = jnp.clip(h.tri, 0, sa.shade_rows.shape[0] - 1)
    inst_c = jnp.clip(h.inst, 0, sa.inst_shade.shape[0] - 1)
    sp = shade_point(sa, ox, oy, oz, dx, dy, dz, h.dist, h.bx, h.by,
                     1.0 - h.bx - h.by, tri_c, inst_c)
    return sp.nx.sum() + sp.color_r.sum() + sp.reflectivity.sum() + st


def s_shaded(wa, sa, ca, light, seed):
    ox, oy, oz, dx, dy, dz, pix = gen_lanes(ca, seed)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    h, st = trace_packets(wa, o3, d3, packet=128)
    tri_c = jnp.clip(h.tri, 0, sa.shade_rows.shape[0] - 1)
    inst_c = jnp.clip(h.inst, 0, sa.inst_shade.shape[0] - 1)
    sp = shade_point(sa, ox, oy, oz, dx, dy, dz, h.dist, h.bx, h.by,
                     1.0 - h.bx - h.by, tri_c, inst_c)
    ctx = ShaderContext(shade=sa, light_pos=light.light_pos,
                        light_color=light.light_color, ambient=light.ambient,
                        background=light.background, max_depth=2)
    ray = RayLanes(ox, oy, oz, dx, dy, dz)
    pl = PayloadLanes(jnp.ones(R), jnp.zeros(R, jnp.int32), pix,
                      pix.astype(jnp.uint32))
    co = table.closest(ctx, sp, ray, pl)
    return co.add_r.sum() + co.sdx.sum() + st


def s_frame(wa, sa, ca, light, seed):
    img, rays, steps = wf.frame_body(
        wa, sa, ca, light, W, H, R, 0, max_depth=1, spp=1,
        table=table, seed=seed, packet=128, tile_w=16, tile_h=8)
    return img.sum() + rays


def s_frame2(wa, sa, ca, light, seed):
    img, rays, steps = wf.frame_body(
        wa, sa, ca, light, W, H, R, 0, max_depth=2, spp=1,
        table=table, seed=seed, packet=128, tile_w=16, tile_h=8)
    return img.sum() + rays


timeit("camera only", burst(s_camera))
timeit("camera+trace", burst(s_trace))
timeit("camera+trace+shadepoint", burst(s_shadepoint))
timeit("camera+trace+shadepoint+closest", burst(s_shaded))
timeit("full frame depth1", burst(s_frame))
timeit("full frame depth2", burst(s_frame2))
