"""Profiling scratch: bisect prog_a (fast) vs production render_burst
(slow) — same frame body, 4x apart."""
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

sb = bench_scene()
cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                     45.0, 1.0)
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer

r = WavefrontRenderer.from_buffers(sb)
WA, SA = r.wa, r.sa
LIGHT = LightArrays.from_params(RenderParams(light_pos=(0, 0.8, -0.5)))
W = H = 512
R = W * H
CA = wf.CameraArrays.from_camera(cam)
NB = 8


def fb(wa, sa, ca, light, seed):
    img, rays, steps = wf.frame_body(
        wa, sa, ca, light, W, H, R, 0, max_depth=2, spp=1,
        seed=seed, packet=128, shadow=False, tile_w=16, tile_h=8)
    return img.sum(), rays, steps


@jax.jit
def v0(wa, sa, ca, light):
    c, rr, ss = jax.lax.map(lambda s: fb(wa, sa, ca, light, s),
                            jnp.arange(NB, dtype=jnp.int32))
    return c.sum() + rr.sum()


@jax.jit
def v1(wa, sa, ca, light, seed0):
    seeds = jnp.asarray(seed0) + jnp.arange(NB, dtype=jnp.int32)
    c, rr, ss = jax.lax.map(lambda s: fb(wa, sa, ca, light, s), seeds)
    return c.sum() + rr.sum()


@jax.jit
def v2(wa, sa, ca, light):
    c, rr, ss = jax.lax.map(lambda s: fb(wa, sa, ca, light, s),
                            jnp.arange(NB, dtype=jnp.int32))
    return c.sum(), rr.sum(), ss.sum()


@jax.jit
def v3(wa, sa, ca, light, seed0):
    seeds = jnp.asarray(seed0) + jnp.arange(NB, dtype=jnp.int32)
    c, rr, ss = jax.lax.map(lambda s: fb(wa, sa, ca, light, s), seeds)
    return c.sum(), rr.sum(), ss.sum()


def _sync(out):
    # block_until_ready does NOT wait on axon; a scalar D2H does
    leaf = jax.tree.leaves(out)[0]
    float(jnp.asarray(leaf).sum() if hasattr(leaf, "sum") else leaf)


def timeit(name, fn):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:44s} {dt * 1e3 / NB:7.2f} ms/frame", flush=True)


timeit("v0 arange seeds, 1 scalar (prog_a ctrl)", lambda: v0(WA, SA, CA, LIGHT))
timeit("v1 traced seed0, 1 scalar", lambda: v1(WA, SA, CA, LIGHT, 0))
timeit("v2 arange seeds, 3 scalars", lambda: v2(WA, SA, CA, LIGHT))
timeit("v3 traced seed0, 3 scalars (burst shape)",
       lambda: v3(WA, SA, CA, LIGHT, 0))
timeit("v4 production render_burst n=8",
       lambda: wf.render_burst(WA, SA, CA, LIGHT, W, H, n_frames=NB,
                               seed0=0, max_depth=2, spp=1, packet=128,
                               shadow=False, tile_w=16, tile_h=8))


@jax.jit
def v5(wa, sa, ca, light, seed0):
    seeds = jnp.asarray(seed0) + jnp.arange(NB, dtype=jnp.int32)

    def body(carry, s):
        c, rr, ss = carry
        ci, ri, si = fb(wa, sa, ca, light, s)
        return (c + ci, rr + ri, ss + si), None

    (c, rr, ss), _ = jax.lax.scan(body, (jnp.float32(0), jnp.int32(0),
                                         jnp.int32(0)), seeds)
    return c, rr, ss


timeit("v5 scan carry-sum, 3 scalars, no outputs",
       lambda: v5(WA, SA, CA, LIGHT, 0))


@jax.jit
def v6(wa, sa, ca, light, seed0):
    """Single i32 output: exact ray count + an anti-DCE zero derived
    from the radiance checksum."""
    seeds = jnp.asarray(seed0) + jnp.arange(NB, dtype=jnp.int32)
    c, rr, ss = jax.lax.map(lambda s: fb(wa, sa, ca, light, s), seeds)
    guard = (c.sum() * jnp.float32(1e-30)).astype(jnp.int32)  # always 0
    return rr.sum() + guard


timeit("v6 single i32 out (rays+guard)", lambda: v6(WA, SA, CA, LIGHT, 0))
