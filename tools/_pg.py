import time
import numpy as np
import jax
import jax.numpy as jnp
from vortex_rt_tpu.models.procedural import cornell_box
from vortex_rt_tpu.models.scene import Camera, RenderParams, Scene
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays
from vortex_rt_tpu.engine.megakernel import CameraArrays
from vortex_rt_tpu.engine.wavefront import _camera_lanes, tile_pixel_perm
from vortex_rt_tpu.io.obj import load_obj
from vortex_rt_tpu.utils import vecmath as vm

sc = Scene()
for mesh, refl in cornell_box():
    i = sc.add_mesh(mesh)
    sc.add_instance(i, reflectivity=refl)
m = sc.add_mesh(load_obj(
    "/root/reference/tests/regression/raytracing/assets/teapot.obj"))
lo, hi = sc._meshes[m].aabb()
s_fit = 0.9 / max(float((hi - lo).max()), 1e-6)
center = (lo + hi) * 0.5
sc.add_instance(m, vm.mat4_translate([0.0, -0.4, 0.0])
                @ vm.mat4_scale(s_fit) @ vm.mat4_translate(-center))
sb = sc.build()
wa = WideArrays.from_scene(sb)
cam = CameraArrays.from_camera(Camera.look_at(
    [0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0], 45.0, 1.0))
W = 512
P = 256
perm = jnp.asarray(tile_pixel_perm(W, W, 16, 16))
key = jax.random.PRNGKey(0)
ox, oy, oz, dx, dy, dz, pix = _camera_lanes(cam, W, W, 1, key,
                                            pix_perm=perm)
o3 = jnp.stack([ox, oy, oz], 1)
d3 = jnp.stack([dx, dy, dz], 1)
R = W * W

def bench(f, tag):
    h = f(wa, o3, d3)
    _ = np.asarray(h[0].dist)
    t0 = time.perf_counter()
    for _ in range(3):
        h = f(wa, o3, d3)
        _ = np.asarray(h[0].dist)
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag}: {dt*1e3:.0f} ms, {R/dt/1e6:.2f} Mrays/s", flush=True)

bench(jax.jit(lambda wa, o, d: trace_packets(wa, o, d, packet=P)),
      "monolithic")

for g in (32, 128, 256):  # packet-groups per lax.map element
    rows = g * P

    def grouped(wa, o, d, rows=rows):
        c = R // rows
        def body(args):
            oo, dd = args
            h, st = trace_packets(wa, oo, dd, packet=P)
            return h.dist, h.bx, h.by, h.tri, h.inst, st
        outs = jax.lax.map(body, (o.reshape(c, rows, 3),
                                  d.reshape(c, rows, 3)))
        from vortex_rt_tpu.ops.traverse2 import Hits
        return (Hits(dist=outs[0].reshape(R), bx=outs[1].reshape(R),
                     by=outs[2].reshape(R), bz=outs[2].reshape(R),
                     tri=outs[3].reshape(R), inst=outs[4].reshape(R)),
                outs[5].sum())
    bench(jax.jit(grouped), f"grouped x{g} packets")
