"""Packet traversal: parity with the per-ray engine and the oracle."""

import numpy as np

from vortex_rt_tpu.golden.renderer import brute_force_hits, generate_rays
from vortex_rt_tpu.models.procedural import box, random_soup, uv_sphere
from vortex_rt_tpu.models.scene import Camera, Scene
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays, trace_rays_wide
from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.config import LARGE_FLOAT


def _check(sb, o, d, packet=64):
    wa = WideArrays.from_scene(sb)
    hp, steps = trace_packets(wa, o, d, packet=packet)
    hr, _, _ = trace_rays_wide(wa, o, d)
    # packet results must match the per-ray engine exactly (same math,
    # same tie-breaks — only the visit schedule differs)
    np.testing.assert_allclose(np.asarray(hp.dist), np.asarray(hr.dist),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hr.tri))
    np.testing.assert_array_equal(np.asarray(hp.inst), np.asarray(hr.inst))
    # and hit/miss classification must match the oracle
    ref = brute_force_hits(o, d, sb)
    np.testing.assert_array_equal(np.asarray(hp.dist) < LARGE_FLOAT,
                                  ref["dist"] < LARGE_FLOAT)
    assert int(steps) > 0
    return hp


def test_packet_coherent_camera(rng):
    sc = Scene()
    sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 12, 16))
    sc.add_mesh(box((0.5, 0.3, 0.5), 0.4))
    sb = sc.build()
    cam = Camera.look_at([0.3, -0.2, -4], [0, 0.05, 0], [0, 1, 0], 40.0, 1.0)
    o, d = generate_rays(cam, 32, 32)
    _check(sb, o, d, packet=64)


def test_packet_incoherent_random(rng):
    sc = Scene()
    sc.add_mesh(random_soup(rng, 300))
    sb = sc.build()
    o = rng.uniform(-14, 14, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _check(sb, o, d, packet=64)


def test_packet_instances(rng):
    sc = Scene()
    mb = sc.add_mesh(box((0, 0, 0), 1.0))
    ms = sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 8, 12))
    sc.add_instance(mb, vm.mat4_translate([-3, 0, 0]))
    sc.add_instance(ms, vm.mat4_translate([3, 0, 0]) @ vm.mat4_scale(1.5))
    sc.add_instance(mb, vm.mat4_translate([0, 3, 0])
                    @ vm.mat4_rotate([0, 0, 1], 0.6))
    sb = sc.build()
    o = rng.uniform(-8, 8, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _check(sb, o, d, packet=32)


def test_packet_dead_lanes(rng):
    """Masked-off pool lanes stay misses and don't disturb live rays."""
    sc = Scene()
    sc.add_mesh(box((0, 0, 0), 1.0))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    o = np.zeros((64, 3), np.float32)
    o[:, 2] = -3
    d = np.zeros((64, 3), np.float32)
    d[:, 2] = 1
    alive = np.arange(64) % 2 == 0
    hp, _ = trace_packets(wa, o, d, packet=16, active=alive)
    dist = np.asarray(hp.dist)
    assert np.allclose(dist[alive], 2.0, atol=1e-5)
    assert (dist[~alive] >= LARGE_FLOAT).all()


def test_packet_trail_restart_regression(rng):
    """Deep/wide trees overflow the 5-entry short stack and force trail
    restarts; the packet visit set must be restart-stable (this exact
    scene caught a best_t-dependent visit-order bug)."""
    from vortex_rt_tpu.models.procedural import cornell_box
    from vortex_rt_tpu.utils.config import RTConfig

    sc = Scene()
    for mesh, refl in cornell_box():
        i = sc.add_mesh(mesh)
        sc.add_instance(i, reflectivity=refl)
    sb = sc.build(RTConfig(sah_bins=4))
    cam = Camera.look_at([0.11, 0.07, -3.2], [0.02, -0.01, 0], [0, 1, 0],
                         45.0, 1.0)
    o, d = generate_rays(cam, 20, 20)
    o = np.concatenate([o, np.zeros((112, 3), np.float32)])
    d = np.concatenate([d, np.tile(np.array([[0, 1, 0]], np.float32),
                                   (112, 1))])
    act = np.arange(512) < 400
    wa = WideArrays.from_scene(sb)
    hp, _ = trace_packets(wa, o, d, packet=128, active=act)
    hr, _, _ = trace_rays_wide(wa, o[:400], d[:400])
    np.testing.assert_allclose(np.asarray(hp.dist)[:400],
                               np.asarray(hr.dist), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hp.tri)[:400],
                                  np.asarray(hr.tri))


def test_packet_occlusion_mode(rng):
    """Occlusion mode = bounded any-hit query: occluded iff the closest
    hit lies strictly inside the clamp (rt_unit.cpp:190-213 ACCEPT+stop)."""
    sc = Scene()
    sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 12, 16))
    sc.add_mesh(box((1.2, 0.3, 0.5), 0.4))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    o = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = rng.uniform(0.5, 8.0, 256).astype(np.float32)
    act = rng.uniform(size=256) < 0.9

    ho, st_occ = trace_packets(wa, o, d, packet=64, active=act,
                               t_max=t_max, occlusion=True)
    hc, st_clo = trace_packets(wa, o, d, packet=64, active=act)
    want = act & (np.asarray(hc.dist) < t_max)
    got = np.asarray(ho.dist) < LARGE_FLOAT
    np.testing.assert_array_equal(got, want)
    # first-hit-exits must do no more work than the closest-hit search
    assert int(st_occ) <= int(st_clo)


def test_packet_t_max_clamp(rng):
    """A t_max clamp must hide all geometry beyond it (closest mode)."""
    sc = Scene()
    sc.add_mesh(box((0, 0, 5), 1.0))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    o = np.zeros((64, 3), np.float32)
    d = np.tile(np.array([[0, 0, 1]], np.float32), (64, 1))
    near = np.full(64, 3.0, np.float32)   # box front face at z=4
    far = np.full(64, 10.0, np.float32)
    h_near, _ = trace_packets(wa, o, d, packet=64, t_max=near)
    h_far, _ = trace_packets(wa, o, d, packet=64, t_max=far)
    assert (np.asarray(h_near.dist) >= LARGE_FLOAT).all()
    assert np.allclose(np.asarray(h_far.dist), 4.0, atol=1e-5)


def test_packet_mixed_occlusion_split():
    """occl_split merged wave == separate occlusion + closest traces.

    The wavefront engine overlaps shadow wave k with bounce wave k+1 in
    ONE while_loop (per-packet mode flag); results must be bit-identical
    to tracing the two waves separately."""
    import jax.numpy as jnp

    from vortex_rt_tpu.models.procedural import cornell_box, uv_sphere
    from vortex_rt_tpu.models.scene import Camera, Scene
    from vortex_rt_tpu.golden.renderer import generate_rays
    from vortex_rt_tpu.ops.traverse_packet import trace_packets

    sc = Scene()
    for mesh, refl in cornell_box():
        sc.add_instance(sc.add_mesh(mesh), reflectivity=refl)
    sc.add_instance(sc.add_mesh(uv_sphere((0, -0.3, 0), 0.35, 10, 20)))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    cam = Camera.look_at([0.05, 0.02, -3.2], [0, -0.05, 0], [0, 1, 0],
                         45.0, 1.0)
    o, d = generate_rays(cam, 64, 64)
    o, d = jnp.asarray(np.asarray(o)), jnp.asarray(np.asarray(d))
    n = o.shape[0]
    # occlusion half: clamped shadow-ish rays; closest half: plain rays
    h0, _ = trace_packets(wa, o, d, packet=64)
    ref = np.asarray(h0.dist)
    t_max = np.where(ref < 1e29, ref * 1.1, 4.0).astype(np.float32)
    act = np.arange(n) % 3 != 0
    ho, _ = trace_packets(wa, o, d, packet=64, active=jnp.asarray(act),
                          t_max=jnp.asarray(t_max), occlusion=True)
    hc, _ = trace_packets(wa, o, d, packet=64)
    om = np.r_[act, np.ones(n, bool)]
    tm = np.r_[t_max, np.full(n, np.float32(1e30))].astype(np.float32)
    hm, _ = trace_packets(wa, jnp.concatenate([o, o]),
                          jnp.concatenate([d, d]), packet=64,
                          active=jnp.asarray(om), t_max=jnp.asarray(tm),
                          occl_split=n)
    dm = np.asarray(hm.dist)
    np.testing.assert_array_equal(dm[:n], np.asarray(ho.dist))
    np.testing.assert_array_equal(dm[n:], np.asarray(hc.dist))
    np.testing.assert_array_equal(np.asarray(hm.tri)[n:],
                                  np.asarray(hc.tri))
    np.testing.assert_array_equal(np.asarray(hm.inst)[n:],
                                  np.asarray(hc.inst))
