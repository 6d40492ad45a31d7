"""Flattened single-BVH build (RTConfig.flatten) parity.

Flattening bakes instance transforms into world-space triangles at
build time and traces ONE BVH with packed (inst << tri_bits) | tri
leaf ids (models/scene.py + traverse_wide.WideArrays.from_scene).  The
gates here: identical hit/instance/triangle ids vs the TLAS build,
t within transform-bake rounding, occlusion-mode agreement, and the
full wavefront frame matching the golden oracle on the SAME flattened
buffers (the oracle's object-space math is world-space under identity
transforms, so parity stays bit-tight)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vortex_rt_tpu.golden.renderer import generate_rays, render_golden
from vortex_rt_tpu.models.procedural import cornell_box, uv_sphere
from vortex_rt_tpu.models.scene import Camera, RenderParams, Scene
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays, trace_lanes
from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.config import RTConfig


def _scene():
    sc = Scene()
    for mesh, refl in cornell_box():
        sc.add_instance(sc.add_mesh(mesh), reflectivity=refl)
    m = sc.add_mesh(uv_sphere((0, -0.3, 0), 0.35, 12, 24))
    sc.add_instance(m, vm.mat4_translate([0.2, -0.1, 0.1])
                    @ vm.mat4_scale(0.8))
    return sc


def _rays(cam, n=64):
    o, d = generate_rays(cam, n, n)
    return jnp.asarray(np.asarray(o)), jnp.asarray(np.asarray(d))


CAM = Camera.look_at([0.05, 0.02, -3.2], [0, -0.05, 0], [0, 1, 0],
                     45.0, 1.0)


def test_flat_matches_tlas_build():
    sc = _scene()
    sb_t = sc.build(RTConfig(flatten=False))
    sb_f = sc.build(RTConfig(flatten=True))
    assert sb_f.flat and sb_f.tri_inst is not None
    assert np.allclose(sb_f.inst_transform,
                       np.eye(4, dtype=np.float32)[None])
    wa_t = WideArrays.from_scene(sb_t)
    wa_f = WideArrays.from_scene(sb_f)
    assert wa_f.num_tlas == 0 and wa_f.tri_bits > 0
    o, d = _rays(CAM)
    ht, _ = trace_packets(wa_t, o, d, packet=64)
    hf, _ = trace_packets(wa_f, o, d, packet=64)
    dt, df = np.asarray(ht.dist), np.asarray(hf.dist)
    hit = dt < 1e29
    np.testing.assert_array_equal(hit, df < 1e29)
    # t differs only by the transform-bake rounding (world-space verts
    # vs object-space ray transform)
    assert np.abs(dt[hit] - df[hit]).max() < 1e-4
    np.testing.assert_array_equal(np.asarray(ht.tri)[hit],
                                  np.asarray(hf.tri)[hit])
    np.testing.assert_array_equal(np.asarray(ht.inst)[hit],
                                  np.asarray(hf.inst)[hit])


def test_flat_occlusion_mode():
    sc = _scene()
    sb_f = sc.build(RTConfig(flatten=True))
    wa_f = WideArrays.from_scene(sb_f)
    o, d = _rays(CAM)
    hf, _ = trace_packets(wa_f, o, d, packet=64)
    ref = np.asarray(hf.dist)
    t_max = np.where(ref < 1e29, ref * 1.2, np.float32(5.0)).astype(
        np.float32)
    act = np.arange(o.shape[0]) % 4 != 0
    of, _ = trace_packets(wa_f, o, d, packet=64, active=jnp.asarray(act),
                          t_max=jnp.asarray(t_max), occlusion=True)
    occ = np.asarray(of.dist) < 1.0
    # every live lane with a real hit inside the clamp must be occluded
    np.testing.assert_array_equal(occ, act & (ref < 1e29))


def test_flat_wavefront_matches_golden():
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.utils.image import rmse

    sc = _scene()
    cfg = RTConfig(flatten=True)
    sb = sc.build(cfg)
    r = WavefrontRenderer.from_buffers(sb, config=cfg)
    p = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2, shadow=True)
    img, _ = r.render(CAM, p, 64, 64)
    ref = render_golden(sb, CAM, p, 64, 64)
    e = rmse(np.asarray(img), np.asarray(ref))
    assert e < 3e-3, e


def test_flat_per_ray_engine_auto_accept():
    """Auto-accept per-ray traversal works on flat arrays (packed-id
    unpack at return); the suspension protocol must reject them (packed
    ids cannot cross the mid-walk any-hit shader boundary)."""
    sc = _scene()
    sb_f = sc.build(RTConfig(flatten=True))
    wa_f = WideArrays.from_scene(sb_f)
    o, d = _rays(CAM, 8)
    hp, _ = trace_packets(wa_f, o, d, packet=64)
    hw, _, _ = trace_lanes(wa_f, o[:, 0], o[:, 1], o[:, 2],
                           d[:, 0], d[:, 1], d[:, 2])
    np.testing.assert_allclose(np.asarray(hw.dist), np.asarray(hp.dist))
    np.testing.assert_array_equal(np.asarray(hw.tri), np.asarray(hp.tri))
    np.testing.assert_array_equal(np.asarray(hw.inst),
                                  np.asarray(hp.inst))
    with pytest.raises(AssertionError, match="packet engine"):
        trace_lanes(wa_f, o[:, 0], o[:, 1], o[:, 2],
                    d[:, 0], d[:, 1], d[:, 2], suspend=True)
