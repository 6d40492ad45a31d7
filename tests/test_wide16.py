"""16-wide BVH packets: bit-exact parity with the 8-wide flat engine.

RT_BVH_WIDTH is a build knob in the reference (hw/VX_config.toml:244);
the packet engine supports 4/8/16 on the flattened build.  16-wide is a
MEASURED-NOT-ADOPTED capability (round 5): at the config-3 scale the
collapse cuts gathered rows only ~10% (the tree is leaf-dominated:
tri_steps don't shrink, int_steps -14%) while the (16,B,P) slab chain
doubles per-row compute — see docs/ARCHITECTURE.md.  The engine support
stays because hits are bit-identical and wider rows are free per gather
DESCRIPTOR (rule 33), so deeper scenes may yet want it.

The closest-hit result is tree-shape-independent (same Moller-Trumbore
math, same lexicographic (t, packed tid) tie-break), so the 16-wide walk
must reproduce the 8-wide walk's hits EXACTLY — any deviation is a
traversal soundness bug (missed child, wrong pop order, stack-word
clobber across the three packed stack registers).
"""

import numpy as np
import pytest

from vortex_rt_tpu.golden.renderer import generate_rays
from vortex_rt_tpu.models.procedural import box, random_soup, uv_sphere
from vortex_rt_tpu.models.scene import Camera, Scene
from vortex_rt_tpu.ops.traverse_packet import _SORT_NET, trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays
from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.config import RTConfig


def _flat_scene(rng, ntris=300):
    sc = Scene()
    mb = sc.add_mesh(box((0, 0, 0), 1.0))
    ms = sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 10, 14))
    mr = sc.add_mesh(random_soup(rng, ntris))
    sc.add_instance(mb, vm.mat4_translate([-3, 0, 0]))
    sc.add_instance(ms, vm.mat4_translate([3, 0, 0]) @ vm.mat4_scale(1.5))
    sc.add_instance(mr, vm.mat4_translate([0, 0, 4]))
    return sc


def _pair(sb):
    wa8 = WideArrays.from_scene(sb, width=8)
    wa16 = WideArrays.from_scene(sb, width=16)
    assert wa16.width == 16
    assert wa16.nodes.shape[1] == 40  # 16-wide packed row
    n_int8 = int((wa8.kind == 0).sum())
    n_int16 = int((wa16.kind == 0).sum())
    assert n_int16 < n_int8
    return wa8, wa16


def _assert_exact(a, b):
    for f in ("dist", "bx", "by", "tri", "inst"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)))


def test_batcher16_network_sorts():
    net = _SORT_NET[16]
    rng = np.random.default_rng(0)
    for _ in range(100):
        vals = list(rng.random(16))
        for x, y in net:
            if vals[x] < vals[y]:  # descending
                vals[x], vals[y] = vals[y], vals[x]
        assert all(vals[i] >= vals[i + 1] for i in range(15))


def test_wide16_requires_flat(rng):
    sc = _flat_scene(rng, 50)
    sb = sc.build(RTConfig())  # TLAS mode
    with pytest.raises(AssertionError):
        WideArrays.from_scene(sb, width=16)


def test_wide16_camera_parity(rng):
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    wa8, wa16 = _pair(sb)
    cam = Camera.look_at([0.3, -0.6, -7], [0, 0, 0.5], [0, 1, 0], 45.0, 1.0)
    o, d = generate_rays(cam, 32, 32)
    h8, s8 = trace_packets(wa8, o, d, packet=64)
    h16, s16 = trace_packets(wa16, o, d, packet=64)
    _assert_exact(h8, h16)
    assert int(s16) < int(s8)  # shallower tree -> fewer loop iterations


def test_wide16_incoherent_parity(rng):
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    wa8, wa16 = _pair(sb)
    o = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h8, _ = trace_packets(wa8, o, d, packet=32)
    h16, _ = trace_packets(wa16, o, d, packet=32)
    _assert_exact(h8, h16)


def test_wide16_fronts_parity(rng):
    """Multi-front walk at width 16 (three stack registers shared by the
    fronts) stays bit-identical to the single-front walk."""
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    _, wa16 = _pair(sb)
    wa16 = wa16.fuse()
    o = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h1, _ = trace_packets(wa16, o, d, packet=16, fronts=1)
    h2, _ = trace_packets(wa16, o, d, packet=16, fronts=2)
    _assert_exact(h1, h2)


def test_wide16_occlusion_parity(rng):
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    wa8, wa16 = _pair(sb)
    o = rng.uniform(-6, 6, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = rng.uniform(0.5, 12.0, 256).astype(np.float32)
    h8, _ = trace_packets(wa8, o, d, packet=32, t_max=tmax, occlusion=True)
    h16, _ = trace_packets(wa16, o, d, packet=32, t_max=tmax,
                           occlusion=True)
    np.testing.assert_array_equal(np.asarray(h8.dist), np.asarray(h16.dist))


def test_wide16_lax_sort_parity(rng):
    """lax.sort child ordering (the 63-comparator network's alternative)
    keeps hits bit-identical at width 16."""
    sb = _flat_scene(rng).build(RTConfig(flatten=True))
    _, wa16 = _pair(sb)
    o = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h_net, _ = trace_packets(wa16, o, d, packet=32, lax_sort=False)
    h_ls, _ = trace_packets(wa16, o, d, packet=32, lax_sort=True)
    _assert_exact(h_net, h_ls)
