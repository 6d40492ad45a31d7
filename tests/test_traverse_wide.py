"""Wide quantized restart-trail traversal: parity + any-hit semantics."""

import jax
import numpy as np

from vortex_rt_tpu.accel.qbvh import KIND_INSTANCE, KIND_INTERNAL, KIND_TRIS
from vortex_rt_tpu.golden.renderer import brute_force_hits, generate_rays
from vortex_rt_tpu.models.procedural import box, quad, random_soup, uv_sphere
from vortex_rt_tpu.models.scene import Camera, Scene
from vortex_rt_tpu.ops.traverse_wide import WideArrays, commit, trace_rays_wide
from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.config import (
    COMMIT_ACCEPT, COMMIT_CONT, COMMIT_TERM, LARGE_FLOAT,
)


def _random_rays(rng, n, extent=14.0):
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _check_parity(sb, o, d, rtol=2e-4):
    ref = brute_force_hits(o, d, sb)
    wa = WideArrays.from_scene(sb)
    hits, state, perf = jax.jit(
        lambda wa, o, d: trace_rays_wide(wa, o, d))(wa, o, d)
    got_t = np.asarray(hits.dist)
    ref_t = ref["dist"]
    np.testing.assert_array_equal(got_t < LARGE_FLOAT, ref_t < LARGE_FLOAT)
    h = ref_t < LARGE_FLOAT
    scale = np.maximum(np.abs(ref_t[h]), 1.0)
    np.testing.assert_array_less(np.abs(got_t[h] - ref_t[h]) / scale, rtol)
    margin = np.abs(got_t - ref_t) < 1e-6
    unique = h & margin
    tri_match = np.asarray(hits.tri)[unique] == ref["tri"][unique]
    inst_match = np.asarray(hits.inst)[unique] == ref["inst"][unique]
    assert (tri_match & inst_match).mean() > 0.99
    assert bool(np.asarray(state.done).all())
    return hits, perf


def test_qbvh_structure(rng):
    sc = Scene()
    sc.add_mesh(random_soup(rng, 400))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    kind = np.asarray(wa.kind)
    nch = np.asarray(wa.nchild)
    assert (nch[kind == KIND_INTERNAL] >= 2).all()
    assert (nch[kind == KIND_INTERNAL] <= 4).all()
    # every triangle appears in exactly one leaf row slot
    tids = wa.leaf_tids
    valid = tids[tids >= 0]
    assert np.array_equal(np.sort(valid), np.arange(sb.num_tris))
    # leaf rows referenced by tri-leaf nodes, one each
    lf = np.asarray(wa.left_first)
    leaf_nodes = np.nonzero(kind == KIND_TRIS)[0]
    assert np.array_equal(np.sort(lf[leaf_nodes]), np.arange(len(leaf_nodes)))
    assert wa.depth < 31


def test_quantized_boxes_conservative(rng):
    """Dequantized child boxes must contain the true child bounds."""
    sc = Scene()
    sc.add_mesh(random_soup(rng, 200))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    kind = np.asarray(wa.kind)
    org = np.asarray(wa.origin)
    scl = np.asarray(wa.scale)
    qlo = np.asarray(wa.qlo).astype(np.float32)
    qhi = np.asarray(wa.qhi).astype(np.float32)
    lf = np.asarray(wa.left_first)
    nch = np.asarray(wa.nchild)
    k = wa.num_tlas
    # recompute child true bounds from the leaf rows
    tri_rows = np.asarray(wa.tri_rows)
    ld = np.asarray(wa.leaf_data)

    def leaf_bounds(i):
        row = tri_rows[lf[i]]
        pts = []
        for c in range(ld[i]):
            v0 = row[16 * c : 16 * c + 3]
            pts += [v0, v0 + row[16 * c + 3 : 16 * c + 6],
                    v0 + row[16 * c + 6 : 16 * c + 9]]
        pts = np.stack(pts)
        return pts.min(0), pts.max(0)

    checked = 0
    for i in np.nonzero(kind == KIND_INTERNAL)[0]:
        if i < k:
            continue  # BLAS only (true bounds recoverable from tris)
        for c in range(nch[i]):
            child = lf[i] + c
            deq_lo = org[i] + qlo[i, 3 * c : 3 * c + 3] * scl[i]
            deq_hi = org[i] + qhi[i, 3 * c : 3 * c + 3] * scl[i]
            if kind[child] == KIND_TRIS:
                blo, bhi = leaf_bounds(child)
                assert (deq_lo <= blo + 1e-5).all()
                assert (deq_hi >= bhi - 1e-5).all()
                checked += 1
    assert checked > 0


def test_wide_parity_soup(rng):
    sc = Scene()
    sc.add_mesh(random_soup(rng, 300))
    sb = sc.build()
    o, d = _random_rays(rng, 512)
    _check_parity(sb, o, d)


def test_wide_parity_instances(rng):
    sc = Scene()
    mb = sc.add_mesh(box((0, 0, 0), 1.0))
    ms = sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 8, 12))
    sc.add_instance(mb, vm.mat4_translate([-3, 0, 0]))
    sc.add_instance(ms, vm.mat4_translate([3, 0, 0]) @ vm.mat4_scale(1.5))
    sc.add_instance(mb, vm.mat4_translate([0, 3, 0])
                    @ vm.mat4_rotate([0, 0, 1], 0.6) @ vm.mat4_scale(0.7))
    sb = sc.build()
    o, d = _random_rays(rng, 512, extent=8.0)
    _check_parity(sb, o, d)


def test_wide_parity_camera(rng):
    sc = Scene()
    sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 12, 16))
    sb = sc.build()
    cam = Camera.look_at([0.3, -0.2, -4], [0, 0.05, 0], [0, 1, 0], 40.0, 1.0)
    o, d = generate_rays(cam, 32, 32)
    _check_parity(sb, o, d)


def test_wide_inside_box(rng):
    sc = Scene()
    sc.add_mesh(box((0, 0, 0), 2.0))
    sb = sc.build()
    o = np.zeros((64, 3), np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hits, _ = _check_parity(sb, o, d)
    assert (np.asarray(hits.dist) < LARGE_FLOAT).all()


def test_suspend_accept_matches_autoaccept(rng):
    """Driving every suspension with COMMIT_ACCEPT must reproduce the
    auto-accept result (the reference's shipped anyhit behavior)."""
    sc = Scene()
    sc.add_mesh(random_soup(rng, 200))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    o, d = _random_rays(rng, 128)
    hits_auto, _, _ = trace_rays_wide(wa, o, d)

    hits, state, _ = trace_rays_wide(wa, o, d, suspend=True)
    rounds = 0
    while bool(np.asarray(state.suspended).any()):
        action = np.where(np.asarray(state.suspended),
                          COMMIT_ACCEPT, COMMIT_CONT).astype(np.int32)
        state = commit(state, action)
        hits, state, _ = trace_rays_wide(wa, o, d, state=state, suspend=True)
        rounds += 1
        assert rounds < 200
    assert rounds > 0  # suspensions actually happened
    np.testing.assert_allclose(np.asarray(hits.dist),
                               np.asarray(hits_auto.dist), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hits.tri),
                                  np.asarray(hits_auto.tri))


def test_suspend_cont_rejects_surface():
    """Two parallel quads; CONT-rejecting the near surface must yield the
    far one — and must terminate (the reference algorithm would livelock)."""
    sc = Scene()
    near = sc.add_mesh(quad((-2, -2, 1), (2, -2, 1), (2, 2, 1), (-2, 2, 1)))
    far = sc.add_mesh(quad((-2, -2, 3), (2, -2, 3), (2, 2, 3), (-2, 2, 3)))
    sc.add_instance(near)
    sc.add_instance(far)
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    o = np.tile(np.array([[0.0, 0.1, -1.0]], np.float32), (8, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (8, 1))

    hits, state, _ = trace_rays_wide(wa, o, d, suspend=True)
    rounds = 0
    while bool(np.asarray(state.suspended).any()):
        sus = np.asarray(state.suspended)
        p_inst = np.asarray(state.pend_inst)
        # reject intersections with the near instance, accept the far one
        action = np.where(p_inst == 0, COMMIT_CONT, COMMIT_ACCEPT)
        action = np.where(sus, action, COMMIT_CONT).astype(np.int32)
        state = commit(state, action)
        hits, state, _ = trace_rays_wide(wa, o, d, state=state, suspend=True)
        rounds += 1
        assert rounds < 50, "anyhit CONT livelocked"
    d_ = np.asarray(hits.dist)
    assert np.allclose(d_, 4.0, atol=1e-4), d_  # far quad at z=3, origin z=-1
    assert (np.asarray(hits.inst) == 1).all()


def test_suspend_term_stops_ray():
    sc = Scene()
    sc.add_mesh(quad((-2, -2, 1), (2, -2, 1), (2, 2, 1), (-2, 2, 1)))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    o = np.tile(np.array([[0.0, 0.1, -1.0]], np.float32), (4, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    hits, state, _ = trace_rays_wide(wa, o, d, suspend=True)
    assert bool(np.asarray(state.suspended).all())
    state = commit(state, np.full(4, COMMIT_TERM, np.int32))
    assert bool(np.asarray(state.done).all())
    # best hit unchanged (TERM leaves dist at its committed value = miss)
    assert (np.asarray(state.best_t) == LARGE_FLOAT).all()


def test_wide_matches_binary_engine(rng):
    from vortex_rt_tpu.ops.traverse2 import TraversalArrays, trace_rays

    sc = Scene()
    sc.add_mesh(random_soup(rng, 500, extent=5.0, tri_size=1.5))
    sb = sc.build()
    o, d = _random_rays(rng, 512, extent=8.0)
    ta = TraversalArrays.from_scene(sb)
    wa = WideArrays.from_scene(sb)
    h2, _ = trace_rays(ta, o, d)
    hw, _, _ = trace_rays_wide(wa, o, d)
    np.testing.assert_allclose(np.asarray(hw.dist), np.asarray(h2.dist),
                               rtol=2e-4, atol=1e-6)


def test_coincident_instance_centroids_all_hit():
    """Instances whose world-AABB centroids coincide must all stay
    hittable (regression: oversize TLAS leaves silently dropped all but
    the first instance)."""
    sc = Scene()
    qz = sc.add_mesh(quad((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)))
    qx = sc.add_mesh(quad((0, -1, -1), (0, 1, -1), (0, 1, 1), (0, -1, 1)))
    sc.add_instance(qz)
    sc.add_instance(qx)
    sb = sc.build()
    o = np.array([[0.3, 0.1, -3.0],   # hits only the z=0 quad
                  [-3.0, 0.1, 0.3]],  # hits only the x=0 quad
                 np.float32)
    d = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
    _check_parity(sb, o, d)
    wa = WideArrays.from_scene(sb)
    hits, _, _ = trace_rays_wide(wa, o, d)
    assert (np.asarray(hits.dist) < LARGE_FLOAT).all()
    assert np.asarray(hits.inst).tolist() == [0, 1]
