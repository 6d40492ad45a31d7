"""BASELINE.json config ladder benchmark.

Runs every config the hardware can hold and prints one JSON line per
config (plus a summary file BENCH_LADDER.json at the repo root when
--write is given).  bench.py stays the single-line headline benchmark;
this is the per-round regression ladder the VERDICT asked for.

Configs (BASELINE.json):
1. small scene 256x256, primary rays only
2. Cornell box 512x512, shadow rays + 1 diffuse(reflective) bounce
3. bunny-class 69k tris, 1080p, 4 spp path trace
4. Sponza-class 260k tris, 1080p, 8 spp multi-bounce path trace
5. animated 1M tris: per-frame LBVH refit + render (single chip here;
   the multi-chip variant lives in parallel/tiles + dryrun)
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _cornell(with_teapot):
    from bench import bench_scene
    from vortex_rt_tpu.models.procedural import cornell_box
    from vortex_rt_tpu.models.scene import Scene

    if with_teapot:
        return bench_scene()
    sc = Scene()
    for mesh, refl in cornell_box():
        sc.add_instance(sc.add_mesh(mesh), reflectivity=refl)
    return sc.build()


def _bench_burst(r, cam, params, w, h, burst, draws, reps=3):
    from vortex_rt_tpu.runtime.warmup import reroll

    nonce, ms = reroll(r, cam, params, w, h, n_frames=burst, draws=draws,
                       target_ms_per_frame=8.0 * max(w * h, 1) / (512 * 512),
                       verbose=True)
    total = 0
    t0 = time.perf_counter()
    for i in range(reps):
        total += r.render_burst(cam, params, w, h, n_frames=burst,
                                seed0=100 + i * burst, rays_only=True)
    dt = time.perf_counter() - t0
    return dict(mrays=round(total / dt / 1e6, 2),
                ms_per_frame=round(dt * 1e3 / (reps * burst), 2),
                tune_nonce=nonce)


def config1(draws):
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models.scene import RenderParams, Scene

    sb = _cornell(False)
    r = WavefrontRenderer.from_buffers(sb)
    cam = Scene.framing_camera(sb, 45.0, 1.0)
    p = RenderParams(max_depth=1)
    rec = dict(config=1, scene="cornell", tris=sb.num_tris, res="256x256",
               spp=1, depth=1, shadow=False)
    rec.update(_bench_burst(r, cam, p, 256, 256, 16, draws))
    return rec


def config2(draws):
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models.scene import Camera, RenderParams

    sb = _cornell(True)
    r = WavefrontRenderer.from_buffers(sb)
    cam = Camera.look_at([0.05, 0.02, -3.2], [0.0, -0.05, 0.0], [0, 1, 0],
                         45.0, 1.0)
    p = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2, shadow=True)
    rec = dict(config=2, scene="cornell+teapot", tris=sb.num_tris,
               res="512x512", spp=1, depth=2, shadow=True)
    rec.update(_bench_burst(r, cam, p, 512, 512, 16, draws))
    return rec


def _scale_cfg(num, scene, spp, depth, draws, burst=4):
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.models.scene import RenderParams, Scene

    sc = Scene()
    if scene == "bunny":
        sc.add_instance(sc.add_mesh(bigscenes.blob(n=187)))
    else:
        for m, refl in bigscenes.atrium():
            sc.add_instance(sc.add_mesh(m), reflectivity=refl)
    sb = sc.build()
    r = WavefrontRenderer.from_buffers(sb)
    cam = Scene.framing_camera(sb, 45.0, 1920 / 1080)
    p = RenderParams(max_depth=depth, spp=spp, shadow=True, pathtrace=True)
    rec = dict(config=num, scene=scene, tris=sb.num_tris, res="1920x1080",
               spp=spp, depth=depth, shadow=True, pathtrace=True)
    rec.update(_bench_burst(r, cam, p, 1920, 1080, burst, draws))
    return rec


def config5(draws):
    """Animated 1M tris: per-frame LBVH refit + primary render."""
    from vortex_rt_tpu.accel.lbvh import build_lbvh_topo, pad_tris, refit_lbvh
    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.ops.traverse_packet import trace_packets
    from vortex_rt_tpu.accel.lbvh import wide_arrays_from_lbvh

    m = bigscenes.wavy_grid(n=708)
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    t0 = time.time()
    dv = [jnp.asarray(v) for v in (v0, v1, v2)]
    lb, topo = build_lbvh_topo(*dv, leaf_size=4)
    jax.block_until_ready(lb.nodes)
    t_build = time.time() - t0

    base_y = dv[0][:, 1], dv[1][:, 1], dv[2][:, 1]

    @jax.jit
    def frame(topo, v0, v1, v2, t):
        # animate: ripple in y (matches wavy_grid's vertex-y-only motion)
        def move(v, y0):
            y = y0 + 0.3 * jnp.sin(0.7 * v[:, 0] + 2.1 * t) \
                * jnp.cos(0.5 * v[:, 2] - 1.3 * t)
            return v.at[:, 1].set(y)

        w0 = move(v0, base_y[0])
        w1 = move(v1, base_y[1])
        w2 = move(v2, base_y[2])
        lb = refit_lbvh(topo, w0, w1, w2, leaf_size=4)
        wa = wide_arrays_from_lbvh(lb)
        # primary wave over a 512x512 ortho grid looking down
        n = 512 * 512
        ii = jnp.arange(n, dtype=jnp.int32)
        x = (ii % 512).astype(jnp.float32) / 512.0 * 18.0 - 9.0
        z = (ii // 512).astype(jnp.float32) / 512.0 * 18.0 - 9.0
        o = jnp.stack([x, jnp.full(n, 10.0), z], axis=1)
        d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
        h, st = trace_packets(wa, o, d, packet=128)
        return h.dist.sum(), st

    t0 = time.time()
    jax.block_until_ready(frame(topo, *dv, jnp.float32(0.0))[0])
    t_compile = time.time() - t0
    reps = 4
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = frame(topo, *dv, jnp.float32(0.1 * i))
    float(out[0])
    dt = (time.perf_counter() - t0) / reps
    return dict(config=5, scene="waves-1M", tris=int(v0.shape[0]),
                res="512x512", build_s=round(t_build, 2),
                compile_s=round(t_compile, 1),
                refit_plus_render_ms=round(dt * 1e3, 1),
                mrays=round(512 * 512 / dt / 1e6, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--write", action="store_true",
                    help="write BENCH_LADDER.json at the repo root")
    a = ap.parse_args()
    fns = {1: config1, 2: config2,
           3: lambda d: _scale_cfg(3, "bunny", 4, 3, d),
           4: lambda d: _scale_cfg(4, "atrium", 8, 3, d),
           5: config5}
    out = []
    for c in [int(x) for x in a.configs.split(",")]:
        try:
            rec = fns[c](a.draws)
        except Exception as e:  # keep the ladder running past one failure
            rec = dict(config=c, error=repr(e)[:300])
        print(json.dumps(rec), flush=True)
        out.append(rec)
    if a.write:
        with open("/root/repo/BENCH_LADDER.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
