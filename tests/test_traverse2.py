"""Property tests: batched BVH traversal vs brute-force oracle.

The reference cross-validates its RT path by rendering the same scene on
host and device (raycast -c); we assert something stronger — per-ray hit
parity (distance + triangle id) against an exhaustive intersector.
"""

import jax
import numpy as np

from vortex_rt_tpu.golden.renderer import brute_force_hits, generate_rays
from vortex_rt_tpu.models.procedural import box, random_soup, uv_sphere
from vortex_rt_tpu.models.scene import Camera, Scene
from vortex_rt_tpu.ops.traverse2 import TraversalArrays, trace_rays
from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.config import LARGE_FLOAT


def _random_rays(rng, n, extent=14.0):
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _check_parity(sb, o, d, rtol=2e-4):
    ref = brute_force_hits(o, d, sb)
    ta = TraversalArrays.from_scene(sb)
    hits, perf = jax.jit(lambda ta, o, d: trace_rays(ta, o, d))(ta, o, d)
    got_t = np.asarray(hits.dist)
    ref_t = ref["dist"]
    # same hit/miss classification
    np.testing.assert_array_equal(got_t < LARGE_FLOAT, ref_t < LARGE_FLOAT)
    h = ref_t < LARGE_FLOAT
    scale = np.maximum(np.abs(ref_t[h]), 1.0)
    np.testing.assert_array_less(np.abs(got_t[h] - ref_t[h]) / scale, rtol)
    # where the closest hit is unique by a margin, ids must agree exactly
    margin = np.abs(got_t - ref_t) < 1e-6
    unique = h & margin
    tri_match = np.asarray(hits.tri)[unique] == ref["tri"][unique]
    inst_match = np.asarray(hits.inst)[unique] == ref["inst"][unique]
    assert (tri_match & inst_match).mean() > 0.995
    assert int(perf.steps) > 0
    return hits, perf


def test_soup_single_instance(rng):
    sc = Scene()
    sc.add_mesh(random_soup(rng, 300))
    sb = sc.build()
    o, d = _random_rays(rng, 512)
    _check_parity(sb, o, d)


def test_soup_hit_rate_sane(rng):
    sc = Scene()
    sc.add_mesh(random_soup(rng, 500, extent=5.0, tri_size=2.0))
    sb = sc.build()
    # aim rays at the cloud so most hit
    o = np.tile(np.array([[0.0, 0.0, -30.0]], np.float32), (256, 1))
    tgt = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    d = np.asarray(vm.normalize(tgt - o), np.float32)
    hits, _ = _check_parity(sb, o, d)
    assert (np.asarray(hits.dist) < LARGE_FLOAT).mean() > 0.5


def test_instances_with_transforms(rng):
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


def test_camera_rays_sphere(rng):
    sc = Scene()
    sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 12, 16))
    sb = sc.build()
    cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 40.0, 1.0)
    o, d = generate_rays(cam, 32, 32)
    _check_parity(sb, o, d)


def test_ray_origin_inside_box(rng):
    sc = Scene()
    sc.add_mesh(box((0, 0, 0), 2.0))
    sb = sc.build()
    o = np.zeros((64, 3), np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hits, _ = _check_parity(sb, o, d)
    assert (np.asarray(hits.dist) < LARGE_FLOAT).all()


def test_perf_counters_monotone(rng):
    """More triangles => more traversal work, and counters are nonzero."""
    o, d = _random_rays(rng, 128)
    work = []
    for n in (64, 512):
        sc = Scene()
        sc.add_mesh(random_soup(rng, n))
        sb = sc.build()
        ta = TraversalArrays.from_scene(sb)
        _, perf = trace_rays(ta, o, d)
        work.append(int(np.asarray(perf.nodes_visited).sum()))
    assert work[0] > 0 and work[1] > work[0]
