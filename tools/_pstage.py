"""Profiling scratch: per-stage cost of the fused frame."""
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
from vortex_rt_tpu.engine.wavefront import (  # noqa: E402
    _camera_lanes_tiled, _resolve_tiled, render_wavefront,
)
from vortex_rt_tpu.models.scene import Camera, RenderParams  # noqa: E402
from vortex_rt_tpu.ops.shade_lanes import ShadeArrays, shade_point  # noqa
from vortex_rt_tpu.ops.traverse_packet import trace_packets  # noqa: E402
from vortex_rt_tpu.ops.traverse_wide import WideArrays  # noqa: E402


def timeit(f, n=5, label=""):
    out = f(0)
    _ = np.asarray(jax.tree.leaves(out)[-1]).reshape(-1)[:1]
    t0 = time.perf_counter()
    outs = [f(i) for i in range(n)]
    _ = [np.asarray(jax.tree.leaves(o)[-1]).reshape(-1)[:1] for o in outs]
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


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

    # depth-1 frame (raygen+trace+shade+resolve)
    timeit(lambda i: render_wavefront(wa, sa, ca, light, w, h, max_depth=1,
                                      packet=128, tile_w=16, tile_h=8,
                                      seed=i)[0],
           5, "frame depth=1")
    timeit(lambda i: render_wavefront(wa, sa, ca, light, w, h, max_depth=2,
                                      packet=128, tile_w=16, tile_h=8,
                                      seed=i)[0],
           5, "frame depth=2")

    # raygen alone
    @jax.jit
    def raygen(seed):
        key = jax.random.PRNGKey(seed)
        lanes = _camera_lanes_tiled(ca, w, h, 1, key, 16, 8, w * h, 0)
        return sum(lanes[:6]).sum()

    timeit(raygen, 5, "raygen")

    # raygen + trace
    @jax.jit
    def rt(seed):
        key = jax.random.PRNGKey(seed)
        ox, oy, oz, dx, dy, dz, pix = _camera_lanes_tiled(
            ca, w, h, 1, key, 16, 8, w * h, 0)
        o3 = jnp.stack([ox, oy, oz], axis=1)
        d3 = jnp.stack([dx, dy, dz], axis=1)
        hits, st = trace_packets(wa, o3, d3, packet=128)
        return hits.dist.sum() + jnp.float32(st)

    timeit(rt, 5, "raygen+trace")

    # raygen + trace + shade_point
    @jax.jit
    def rts(seed):
        key = jax.random.PRNGKey(seed)
        ox, oy, oz, dx, dy, dz, pix = _camera_lanes_tiled(
            ca, w, h, 1, key, 16, 8, w * h, 0)
        o3 = jnp.stack([ox, oy, oz], axis=1)
        d3 = jnp.stack([dx, dy, dz], axis=1)
        hits, st = trace_packets(wa, o3, d3, packet=128)
        tri_c = jnp.clip(hits.tri, 0, sa.shade_rows.shape[0] - 1)
        inst_c = jnp.clip(hits.inst, 0, sa.inst_shade.shape[0] - 1)
        sp = shade_point(sa, ox, oy, oz, dx, dy, dz, hits.dist, hits.bx,
                         hits.by, hits.bz, tri_c, inst_c)
        return sp.px.sum() + sp.nx.sum() + sp.r.sum()

    timeit(rts, 5, "raygen+trace+shadepoint")

    # resolve alone
    lanes = jnp.arange(w * h, dtype=jnp.float32)

    @jax.jit
    def res(seed):
        return _resolve_tiled(lanes + seed, w, h, 1, 16, 8).sum()

    timeit(res, 5, "resolve")


if __name__ == "__main__":
    main()
