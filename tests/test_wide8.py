"""8-wide BVH packets: bit-exact parity with the 4-wide flat engine.

The closest-hit result is tree-shape-independent (same Moller-Trumbore
math, same lexicographic (t, packed tid) tie-break), so the 8-wide walk
must reproduce the 4-wide walk's hits EXACTLY — any deviation is a
traversal soundness bug (missed child, wrong pop order, stack clobber).
Capability match: RT_BVH_WIDTH is a build knob in the reference
(hw/VX_config.toml:244); we support 4 and 8 on the flattened build.
"""

import numpy as np
import pytest

from vortex_rt_tpu.golden.renderer import brute_force_hits, generate_rays
from vortex_rt_tpu.models.procedural import box, random_soup, uv_sphere
from vortex_rt_tpu.models.scene import Camera, Scene
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays
from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.config import LARGE_FLOAT, RTConfig


def _flat_scene(rng, ntris=300):
    sc = Scene()
    mb = sc.add_mesh(box((0, 0, 0), 1.0))
    ms = sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 10, 14))
    mr = sc.add_mesh(random_soup(rng, ntris))
    sc.add_instance(mb, vm.mat4_translate([-3, 0, 0]))
    sc.add_instance(ms, vm.mat4_translate([3, 0, 0]) @ vm.mat4_scale(1.5))
    sc.add_instance(mr, vm.mat4_translate([0, 0, 4]))
    return sc


def _pair(sb, leaf8=False):
    wa4 = WideArrays.from_scene(sb, width=4)
    wa8 = WideArrays.from_scene(sb, width=8)
    assert wa8.width == 8
    # 8-wide collapse must shrink the internal-node count
    n_int4 = int((wa4.kind == 0).sum())
    n_int8 = int((wa8.kind == 0).sum())
    assert n_int8 < n_int4
    return wa4, wa8


def _assert_exact(h4, h8):
    np.testing.assert_array_equal(np.asarray(h4.dist), np.asarray(h8.dist))
    np.testing.assert_array_equal(np.asarray(h4.tri), np.asarray(h8.tri))
    np.testing.assert_array_equal(np.asarray(h4.inst), np.asarray(h8.inst))


def test_wide8_requires_flat(rng):
    sc = _flat_scene(rng, 50)
    sb = sc.build(RTConfig())  # TLAS mode
    with pytest.raises(AssertionError):
        WideArrays.from_scene(sb, width=8)


def test_wide8_camera_parity(rng):
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    cam = Camera.look_at([0.3, -0.6, -7], [0, 0, 0.5], [0, 1, 0], 45.0, 1.0)
    o, d = generate_rays(cam, 32, 32)
    h4, s4 = trace_packets(wa4, o, d, packet=64)
    h8, s8 = trace_packets(wa8, o, d, packet=64)
    _assert_exact(h4, h8)
    assert int(s8) < int(s4)  # shallower tree -> fewer loop iterations
    ref = brute_force_hits(o, d, sb)
    np.testing.assert_array_equal(np.asarray(h8.dist) < LARGE_FLOAT,
                                  ref["dist"] < LARGE_FLOAT)


def test_wide8_incoherent_parity(rng):
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    o = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h4, _ = trace_packets(wa4, o, d, packet=32)
    h8, _ = trace_packets(wa8, o, d, packet=32)
    _assert_exact(h4, h8)


def test_wide8_leaf8_parity(rng):
    """8-wide nodes with 8-triangle leaves (the iteration-cut combo)."""
    sc8 = _flat_scene(np.random.default_rng(7))
    sc4 = _flat_scene(np.random.default_rng(7))  # identical geometry
    sb = sc8.build(RTConfig(flatten=True, max_leaf_tris=8))
    wa8 = WideArrays.from_scene(sb, width=8)
    assert wa8.max_leaf_tris == 8
    sb4 = sc4.build(RTConfig(flatten=True))
    wa4 = WideArrays.from_scene(sb4, width=4)
    cam = Camera.look_at([0.3, -0.6, -7], [0, 0, 0.5], [0, 1, 0], 45.0, 1.0)
    o, d = generate_rays(cam, 24, 24)
    h4, _ = trace_packets(wa4, o, d, packet=32)
    h8, _ = trace_packets(wa8, o, d, packet=32)
    # different Scene objects but same geometry/build determinism
    _assert_exact(h4, h8)


def test_wide8_occlusion_parity(rng):
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    o = rng.uniform(-6, 6, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = rng.uniform(0.5, 12.0, 256).astype(np.float32)
    h4, _ = trace_packets(wa4, o, d, packet=32, t_max=tmax, occlusion=True)
    h8, _ = trace_packets(wa8, o, d, packet=32, t_max=tmax, occlusion=True)
    np.testing.assert_array_equal(np.asarray(h4.dist), np.asarray(h8.dist))


def test_wide8_mixed_wave_parity(rng):
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    o = rng.uniform(-6, 6, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(256, 8.0, np.float32)
    h4, _ = trace_packets(wa4, o, d, packet=32, t_max=tmax, occl_split=128)
    h8, _ = trace_packets(wa8, o, d, packet=32, t_max=tmax, occl_split=128)
    np.testing.assert_array_equal(np.asarray(h4.dist), np.asarray(h8.dist))
    np.testing.assert_array_equal(np.asarray(h4.tri), np.asarray(h8.tri))


def test_wide8_compaction_path(rng):
    """Enough packets (b >= 64) to trigger straggler-compaction rounds."""
    sb = _flat_scene(rng, 800).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    cam = Camera.look_at([0.3, -0.6, -7], [0, 0, 0.5], [0, 1, 0], 45.0, 1.0)
    o, d = generate_rays(cam, 64, 64)  # 4096 rays / packet 32 = 128 packets
    h4, _ = trace_packets(wa4, o, d, packet=32)
    h8, _ = trace_packets(wa8, o, d, packet=32)
    _assert_exact(h4, h8)


def test_lax_sort_parity(rng):
    """lax.sort child ordering is hit-bit-identical to the sorting
    network at both widths (traversal order among equal-tmin children
    cannot change the closest hit — every unpruned child is visited)."""
    sb = _flat_scene(rng, 800).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    o = rng.uniform(-6, 6, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for wa in (wa4, wa8):
        hn, _ = trace_packets(wa, o, d, packet=32, lax_sort=False)
        hl, _ = trace_packets(wa, o, d, packet=32, lax_sort=True)
        _assert_exact(hn, hl)


def test_array_stack_parity(rng):
    """(B, S) array stack is bit-identical to the per-level tuple stack
    in closest-hit, occlusion, and mixed waves, through compaction."""
    sb = _flat_scene(rng, 800).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    o = rng.uniform(-6, 6, (2048, 3)).astype(np.float32)
    d = rng.normal(size=(2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(2048, 8.0, np.float32)
    for wa in (wa4, wa8):
        hn, sn = trace_packets(wa, o, d, packet=32, array_stack=False)
        ha, sa = trace_packets(wa, o, d, packet=32, array_stack=True)
        _assert_exact(hn, ha)
        assert int(sn) == int(sa)
        hn2, _ = trace_packets(wa, o, d, packet=32, t_max=tmax,
                               occl_split=1024, array_stack=False)
        ha2, _ = trace_packets(wa, o, d, packet=32, t_max=tmax,
                               occl_split=1024, array_stack=True)
        np.testing.assert_array_equal(np.asarray(hn2.dist),
                                      np.asarray(ha2.dist))


def test_knobs_end_to_end_frame(rng, monkeypatch):
    """Full wavefront frame with lax_sort + array_stack defaults on is
    bit-identical to the knobs-off frame (the env-knob path the
    hardware sweep drives through bench.py/the ladder)."""
    import vortex_rt_tpu.ops.traverse_packet as tp
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models.procedural import cornell_box
    from vortex_rt_tpu.models.scene import RenderParams

    sc = Scene()
    for mesh, refl in cornell_box():
        sc.add_instance(sc.add_mesh(mesh), reflectivity=refl)
    sb = sc.build(RTConfig(flatten=True))
    cam = Scene.framing_camera(sb, 45.0, 1.0)
    params = RenderParams(max_depth=2, shadow=True)
    imgs = {}
    for on in (False, True):
        monkeypatch.setattr(tp, "_LAX_SORT_DEFAULT", on)
        monkeypatch.setattr(tp, "_ARRAY_STACK_DEFAULT", on)
        r = WavefrontRenderer.from_buffers(
            sb, RTConfig(flatten=True, bvh_width=8 if on else 4))
        img, _ = r.render(cam, params, 32, 32)
        imgs[on] = np.asarray(img)
    np.testing.assert_array_equal(imgs[False], imgs[True])


def test_unroll_parity(rng):
    """k-fold while-body unrolling is bit-identical at both widths and
    in every mode: a sub-step on a done packet is the identity on all
    state but the step counter, so grouping k sub-steps per iteration
    replays the exact same node sequence."""
    sb = _flat_scene(rng, 800).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    o = rng.uniform(-6, 6, (2048, 3)).astype(np.float32)
    d = rng.normal(size=(2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(2048, 8.0, np.float32)
    for wa in (wa4, wa8):
        h1, s1 = trace_packets(wa, o, d, packet=32, unroll=1)
        for k in (2, 4):
            hk, sk = trace_packets(wa, o, d, packet=32, unroll=k)
            _assert_exact(h1, hk)
            # the counter tallies SUB-steps, so it stays ~equal; each
            # compaction round may overshoot its exit by < k sub-steps
            assert int(sk) <= int(s1) + 4 * k
        hm1, _ = trace_packets(wa, o, d, packet=32, t_max=tmax,
                               occl_split=1024, unroll=1)
        hm4, _ = trace_packets(wa, o, d, packet=32, t_max=tmax,
                               occl_split=1024, unroll=4)
        np.testing.assert_array_equal(np.asarray(hm1.dist),
                                      np.asarray(hm4.dist))


def test_fused_rows_parity(rng):
    """Single-gather fused node+leaf rows are bit-identical to the
    two-gather layout at both widths, incl. the mixed wave."""
    sb = _flat_scene(rng, 800).build(RTConfig(flatten=True))
    wa4, wa8 = _pair(sb)
    o = rng.uniform(-6, 6, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(1024, 8.0, np.float32)
    for wa in (wa4, wa8):
        wf = wa.fuse()
        assert wf.fused.shape == (wa.nodes.shape[0],
                                  32 + 16 * wa.max_leaf_tris)
        h0, s0 = trace_packets(wa, o, d, packet=32)
        h1, s1 = trace_packets(wf, o, d, packet=32)
        _assert_exact(h0, h1)
        assert int(s0) == int(s1)
        h2, _ = trace_packets(wa, o, d, packet=32, t_max=tmax,
                              occl_split=512)
        h3, _ = trace_packets(wf, o, d, packet=32, t_max=tmax,
                              occl_split=512)
        np.testing.assert_array_equal(np.asarray(h2.dist),
                                      np.asarray(h3.dist))
