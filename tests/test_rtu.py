"""RT-unit instruction-level facade: the reference's kernel loop, ported.

This test reproduces the structure of the reference's persistent wavefront
kernel (tests/regression/raytracing/kernel.cpp:50-123): traceRay per pixel,
then a getWork/dispatch loop calling miss/closest/anyhit handlers that use
getAttr + commit — exercising the queue scheduling and commit semantics
end-to-end against the golden renderer.
"""

import numpy as np

from vortex_rt_tpu.engine import rtu
from vortex_rt_tpu.engine.rtu import RTUnit, decode_work
from vortex_rt_tpu.golden.renderer import brute_force_hits, generate_rays
from vortex_rt_tpu.models.procedural import quad, random_soup
from vortex_rt_tpu.models.scene import Camera, Scene
from vortex_rt_tpu.ops.traverse_wide import WideArrays
from vortex_rt_tpu.utils.config import (
    LARGE_FLOAT, SHADER_ANY, SHADER_CLOSEST, SHADER_MISS,
)


def test_decode_work():
    words = np.asarray([(1 << 28) | 5, (1 << 29) | 9, (1 << 31) | 1],
                       np.uint32)
    ty, ids = decode_work(words)
    assert ty.tolist() == [SHADER_MISS, SHADER_CLOSEST, SHADER_ANY]
    assert ids.tolist() == [5, 9, 1]


def _drain(unit, on_any=None, on_closest=None, on_miss=None, max_rounds=64):
    rounds = 0
    while True:
        work = unit.get_work()
        if work.size == 0:
            break
        rounds += 1
        assert rounds < max_rounds
        ty, ids = decode_work(work)
        t = int(ty[0])
        assert (ty == t).all()  # one queue per getWork
        if t == SHADER_ANY and on_any:
            on_any(unit, work)
        elif t == SHADER_CLOSEST and on_closest:
            on_closest(unit, work)
        elif t == SHADER_MISS and on_miss:
            on_miss(unit, work)
        else:
            unit.commit(work, rtu.VX_RT_COMMIT_TERM)


def test_rtu_kernel_loop_matches_oracle(rng):
    sc = Scene()
    sc.add_mesh(random_soup(rng, 150))
    sb = sc.build()
    unit = RTUnit(WideArrays.from_scene(sb), anyhit=True)
    cam = Camera.look_at([0.2, -0.1, -25], [0, 0, 0], [0, 1, 0], 30.0, 1.0)
    o, d = generate_rays(cam, 8, 8)
    ids = unit.trace_ray(o, d, payload_addr=np.arange(64))
    assert (ids >= 1).all() and len(set(ids.tolist())) == 64

    results = {}

    def on_any(u, work):
        u.commit(work, rtu.VX_RT_COMMIT_ACCEPT)  # shipped anyhit behavior

    def on_closest(u, work):
        _, rid = decode_work(work)
        dist = u.get_attr(work, rtu.VX_RT_HIT_DIST)
        tri = u.get_attr(work, rtu.VX_RT_HIT_TRI_IDX)
        blas = u.get_attr(work, rtu.VX_RT_HIT_BLAS_IDX)
        pay = u.get_attr(work, rtu.VX_RT_RAY_PAYLOAD_ADDR)
        for k in range(len(rid)):
            results[int(pay[k])] = (float(dist[k]), int(tri[k]), int(blas[k]))
        u.commit(work, rtu.VX_RT_COMMIT_TERM)

    def on_miss(u, work):
        pay = u.get_attr(work, rtu.VX_RT_RAY_PAYLOAD_ADDR)
        for p in pay:
            results[int(p)] = (LARGE_FLOAT, -1, -1)
        u.commit(work, rtu.VX_RT_COMMIT_TERM)

    _drain(unit, on_any, on_closest, on_miss, max_rounds=512)
    assert unit.active_rays() == 0
    assert len(results) == 64

    ref = brute_force_hits(o, d, sb)
    for p in range(64):
        dist, tri, blas = results[p]
        if ref["dist"][p] < LARGE_FLOAT:
            assert abs(dist - ref["dist"][p]) < 1e-3 * max(ref["dist"][p], 1)
        else:
            assert dist >= LARGE_FLOAT


def test_rtu_anyhit_cont_rejects():
    sc = Scene()
    near = sc.add_mesh(quad((-2, -2, 1), (2, -2, 1), (2, 2, 1), (-2, 2, 1)))
    far = sc.add_mesh(quad((-2, -2, 3), (2, -2, 3), (2, 2, 3), (-2, 2, 3)))
    sc.add_instance(near)
    sc.add_instance(far)
    sb = sc.build()
    unit = RTUnit(WideArrays.from_scene(sb), anyhit=True)
    o = np.array([[0.0, 0.1, -1.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    unit.trace_ray(o, d)

    final = {}

    def on_any(u, work):
        blas = u.get_attr(work, rtu.VX_RT_HIT_BLAS_IDX)
        actions_cont = blas == 0
        # commit per subgroup
        w = np.asarray(work)
        u.commit(w[actions_cont], rtu.VX_RT_COMMIT_CONT)
        u.commit(w[~actions_cont], rtu.VX_RT_COMMIT_ACCEPT)

    def on_closest(u, work):
        final["dist"] = float(u.get_attr(work, rtu.VX_RT_HIT_DIST)[0])
        final["blas"] = int(u.get_attr(work, rtu.VX_RT_HIT_BLAS_IDX)[0])
        u.commit(work, rtu.VX_RT_COMMIT_TERM)

    _drain(unit, on_any, on_closest, None, max_rounds=32)
    assert final["blas"] == 1
    assert abs(final["dist"] - 4.0) < 1e-4


def test_rtu_getwork_longest_queue(rng):
    """schedule_work picks the longest queue (rt_unit.cpp:125-136)."""
    sc = Scene()
    sc.add_mesh(quad((-1, -1, 2), (1, -1, 2), (1, 1, 2), (-1, 1, 2)))
    sb = sc.build()
    unit = RTUnit(WideArrays.from_scene(sb), anyhit=False, lanes=4)
    # 3 hitting rays, 5 missing rays -> MISS queue longer -> served first
    o = np.zeros((8, 3), np.float32)
    o[:, 2] = -1
    d = np.zeros((8, 3), np.float32)
    d[:3, 2] = 1.0   # toward the quad
    d[3:, 2] = -1.0  # away
    unit.trace_ray(o, d)
    ty, ids = decode_work(unit.get_work())
    assert (ty == SHADER_MISS).all() and len(ids) == 4  # lane-capped pop
    ty2, ids2 = decode_work(unit.get_work())
    assert len(ids2) + len(ids) >= 7


def test_rtu_queue_capacity_spill(rng):
    """queue_capacity bounds each shader queue (ShaderQueue CAPACITY,
    sim/simx/types.h:1844); overflow spills losslessly and drains as
    get_work frees slots."""
    from vortex_rt_tpu.models.procedural import uv_sphere
    from vortex_rt_tpu.models.scene import Scene

    sc = Scene()
    sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 8, 12))
    sb = sc.build()
    unit = RTUnit(WideArrays.from_scene(sb), anyhit=False, lanes=8,
                  queue_capacity=16)
    n = 48  # all miss -> all land in the MISS queue, 3x the capacity
    o = np.tile(np.array([[0, 0, -5]], np.float32), (n, 1))
    d = np.tile(np.array([[0, 1, 0]], np.float32), (n, 1))
    ids = unit.trace_ray(o, d)
    seen = set()
    while True:
        work = unit.get_work()
        if work.size == 0:
            break
        assert all(len(q) <= unit.queue_capacity for q in unit._queues)
        seen.update(int(w) & 0x0FFFFFFF for w in work)
    assert seen == {int(i) for i in ids}
