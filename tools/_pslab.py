"""Profiling scratch: VMEM-resident traversal slabs.

Hypothesis: the packet while_loop is bound by loop-state HBM traffic
(~50 MB at 524k lanes -> ~300 us/iter).  Slabs whose state fits VMEM
(~16 MB) should drop per-iter cost 10-30x even though summed iteration
counts rise.  Honest timing: distinct frames via seed-dependent jitter,
map-wrapped, one scalar out."""
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import bench_scene
from vortex_rt_tpu.engine import wavefront as wf
from vortex_rt_tpu.models.scene import Camera
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.ops.traverse_packet import trace_packets

sb = bench_scene()
cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                     45.0, 1.0)
r = WavefrontRenderer.from_buffers(sb)
WA = r.wa
W = H = 512
SPP = 2
R = W * H * SPP
CA = wf.CameraArrays.from_camera(cam)
NB = 8


def gen(ca, seed):
    samp = (jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(SPP)
            + (jnp.arange(R, dtype=jnp.int32) % SPP).astype(jnp.uint32))
    return wf._camera_lanes_tiled(ca, W, H, SPP, samp, SPP, 16, 8,
                                  W * H, 0)


def make_stage(slab):
    def stage(wa, ca, seed):
        ox, oy, oz, dx, dy, dz, pix = gen(ca, seed)
        o3 = jnp.stack([ox, oy, oz], axis=1)
        d3 = jnp.stack([dx, dy, dz], axis=1)
        if slab >= R:
            h, st = trace_packets(wa, o3, d3, packet=128)
            return h.dist.sum() + h.bx.sum()
        g = R // slab

        def body(args):
            o, d = args
            h, st = trace_packets(wa, o, d, packet=128)
            return h.dist.sum() + h.bx.sum()

        return jax.lax.map(body, (o3.reshape(g, slab, 3),
                                  d3.reshape(g, slab, 3))).sum()
    return stage


def timeit(name, stage):
    @jax.jit
    def prog(wa, ca):
        return jax.lax.map(lambda s: stage(wa, ca, s),
                           jnp.arange(NB, dtype=jnp.int32)).sum()

    float(prog(WA, CA))
    t0 = time.perf_counter()
    for _ in range(3):
        out = prog(WA, CA)
    float(out)
    dt = (time.perf_counter() - t0) / 3 / NB
    print(f"{name:30s} {dt * 1e3:8.2f} ms/frame", flush=True)


for slab in (R, 131072, 65536, 32768, 16384):
    timeit(f"trace slab={slab}", make_stage(slab))
