"""Profiling scratch: packet-engine shapes on the real chip.

Measures, on the bench scene (Cornell + teapot, 512x512):
  1. the current production path (lax.map groups of chunk/packet packets)
  2. one big trace_packets call over the whole pool
  3. per-iteration cost at two max_steps values (slope method)

Honest timing: np.asarray materialization of a scalar, per the axon rules
in docs/ARCHITECTURE.md.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vortex_rt_tpu.engine.wavefront import tile_pixel_perm, _camera_lanes
from vortex_rt_tpu.engine.megakernel import CameraArrays, LightArrays
from vortex_rt_tpu.models.procedural import cornell_box
from vortex_rt_tpu.models.scene import Camera, RenderParams, Scene
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays
from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def build_scene():
    sc = Scene()
    for mesh, refl in cornell_box():
        i = sc.add_mesh(mesh)
        sc.add_instance(i, reflectivity=refl)
    teapot = "/root/reference/tests/regression/raytracing/assets/teapot.obj"
    if os.path.exists(teapot):
        from vortex_rt_tpu.io.obj import load_obj
        m = sc.add_mesh(load_obj(teapot))
        lo, hi = sc._meshes[m].aabb()
        s_fit = 0.9 / max(float((hi - lo).max()), 1e-6)
        center = (lo + hi) * 0.5
        sc.add_instance(m, vm.mat4_translate([0.0, -0.4, 0.0])
                        @ vm.mat4_scale(s_fit)
                        @ vm.mat4_translate(-center))
    return sc.build()


def main():
    sb = build_scene()
    wa = WideArrays.from_scene(sb)
    w = h = 512
    packet = 128
    cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                         45.0, 1.0)
    ca = CameraArrays.from_camera(cam)
    perm = jnp.asarray(tile_pixel_perm(w, h, 16, 8))
    key = jax.random.PRNGKey(0)
    ox, oy, oz, dx, dy, dz, pix = _camera_lanes(ca, w, h, 1, key,
                                                pix_perm=perm)
    o3 = jnp.stack([ox, oy, oz], axis=1)
    d3 = jnp.stack([dx, dy, dz], axis=1)
    r = w * h

    def timeit(f, n=3):
        out = f()
        _ = np.asarray(jax.tree.leaves(out)[-1])  # warm + sync
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        s = np.asarray(jax.tree.leaves(out)[-1])
        dt = (time.perf_counter() - t0) / n
        return dt, s

    # 1. production grouped path
    @jax.jit
    def grouped(o3, d3):
        c = r // 4096
        def gbody(args):
            oo, dd = args
            hits, st = trace_packets(wa, oo, dd, packet=packet)
            return hits.dist, st
        dist, st = jax.lax.map(gbody, (o3.reshape(c, 4096, 3),
                                       d3.reshape(c, 4096, 3)))
        return dist.sum(), st.sum()

    dt, st = timeit(lambda: grouped(o3, d3), 3)
    print(f"grouped (64 x 32pk): {dt*1e3:.1f} ms  steps={st}  "
          f"{r/dt/1e6:.2f} Mrays/s", flush=True)

    # 2. one big call
    @jax.jit
    def big(o3, d3):
        hits, st = trace_packets(wa, o3, d3, packet=packet)
        return hits.dist.sum(), st

    dt, st = timeit(lambda: big(o3, d3), 3)
    print(f"one big (2048 pk):   {dt*1e3:.1f} ms  steps={st}  "
          f"{r/dt/1e6:.2f} Mrays/s", flush=True)

    # 3. per-iteration slope at a few packet-batch sizes
    for nb in (256, 512, 1024, 2048):
        sub_o = o3[: nb * packet]
        sub_d = d3[: nb * packet]

        def run(ms):
            @jax.jit
            def f(o, d):
                hits, st = trace_packets(wa, o, d, packet=packet,
                                         max_steps=ms)
                return hits.dist.sum(), st
            return timeit(lambda: f(sub_o, sub_d), 3)

        d100, s100 = run(100)
        d50, s50 = run(50)
        per = (d100 - d50) / 50
        print(f"B={nb}: 50it={d50*1e3:.1f}ms 100it={d100*1e3:.1f}ms "
              f"-> {per*1e6:.0f} us/iter", flush=True)


if __name__ == "__main__":
    main()
