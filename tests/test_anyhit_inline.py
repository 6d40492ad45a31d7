"""In-loop alpha-test any-hit (trace_packets alpha_ref): parity with the
per-ray suspension protocol and the wavefront fallback path.

The reference's any-hit runs as a mid-traversal shader callback
(rt_unit.cpp:190-213 CONT/ACCEPT; shaders/anyhit.cpp).  The packet
engine cannot suspend per-ray, but the alpha test is a pure
per-candidate predicate, so it evaluates INSIDE the traversal loop —
these tests pin that the two paths accept/reject identical candidate
sets (identical final hits, identical images)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vortex_rt_tpu.engine.shaders import ShaderTable, alpha_test_anyhit
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.models.procedural import (
    box, checkerboard_texture, quad, uv_sphere,
)
from vortex_rt_tpu.models.scene import Camera, Material, RenderParams, Scene
from vortex_rt_tpu.ops.shade_lanes import ShadeArrays, shade_point
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import (
    WideArrays, commit, init_state_lanes, trace_lanes,
)
from vortex_rt_tpu.utils.config import COMMIT_CONT, LARGE_FLOAT, RTConfig

THR = 0.35


def _cutout_scene():
    """Two checkered quads stacked in front of a solid sphere: rays can
    punch through up to two rejected surfaces before an accepted hit."""
    tex = checkerboard_texture(n=4, c0=0xFFFFFF, c1=0x101010, cell=3)
    sc = Scene()
    q1 = quad((-1.5, -1.5, 0), (1.5, -1.5, 0), (1.5, 1.5, 0), (-1.5, 1.5, 0),
              Material(diffuse=(1, 1, 1), diffuse_tex=tex))
    q2 = quad((-2, -2, 1.0), (2, -2, 1.0), (2, 2, 1.0), (-2, 2, 1.0),
              Material(diffuse=(1, 1, 1), diffuse_tex=tex))
    # dark untextured material (lum < THR): always cut out
    q3 = quad((-0.5, -0.5, 1.7), (0.5, -0.5, 1.7), (0.5, 0.5, 1.7),
              (-0.5, 0.5, 1.7), Material(diffuse=(0.1, 0.1, 0.1)))
    sc.add_instance(sc.add_mesh(q1))
    sc.add_instance(sc.add_mesh(q2))
    sc.add_instance(sc.add_mesh(q3))
    sc.add_instance(sc.add_mesh(uv_sphere((0, 0, 2.6), 0.8, 10, 14)))
    sc.add_instance(sc.add_mesh(box((1.2, 1.0, 2.4), 0.5)))
    return sc


def _camera_rays(w=48, h=48):
    from vortex_rt_tpu.golden.renderer import generate_rays

    cam = Camera.look_at([0.15, -0.1, -3.0], [0, 0, 1], [0, 1, 0],
                         50.0, 1.0)
    return cam, generate_rays(cam, w, h)


def _suspension_hits(wa: WideArrays, sa: ShadeArrays, o, d, thr):
    """The production per-ray suspension loop (wavefront._trace_pool's
    anyhit branch, verbatim semantics) with the alpha-test shader."""
    ox, oy, oz = (jnp.asarray(o[:, k]) for k in range(3))
    dx, dy, dz = (jnp.asarray(d[:, k]) for k in range(3))

    def cond(s):
        return jnp.any(~s.done)

    def body(s):
        _, s, _ = trace_lanes(wa, ox, oy, oz, dx, dy, dz, state=s,
                              suspend=True)
        sp = shade_point(
            sa, ox, oy, oz, dx, dy, dz,
            s.pend_t, s.pend_bx, s.pend_by, 1.0 - s.pend_bx - s.pend_by,
            jnp.clip(s.pend_tri, 0, sa.shade_rows.shape[0] - 1),
            jnp.clip(s.pend_inst, 0, sa.inst_shade.shape[0] - 1))
        alpha = (0.2126 * sp.color_r + 0.7152 * sp.color_g
                 + 0.0722 * sp.color_b)
        action = jnp.where(alpha < thr, jnp.int32(COMMIT_CONT),
                           jnp.int32(1)).astype(jnp.int32)  # ACCEPT
        return commit(s, jnp.where(s.suspended, action, COMMIT_CONT))

    st = init_state_lanes(ox, oy, oz, dx, dy, dz)
    st = jax.lax.while_loop(cond, body, st)
    return st


def test_inline_alpha_matches_suspension_engine():
    """trace_packets(alpha_ref) returns the identical accepted-hit set
    (dist, tri, inst — bit-for-bit) as the per-ray suspension protocol
    running alpha_test_anyhit through CONT/ACCEPT commits."""
    sb = _cutout_scene().build()
    wa = WideArrays.from_scene(sb).with_alpha(sb)
    sa = ShadeArrays.from_scene(sb)
    _, (o, d) = _camera_rays()

    hp, _ = trace_packets(wa, o, d, packet=64, alpha_ref=THR)
    st = _suspension_hits(wa, sa, o, d, THR)

    np.testing.assert_array_equal(np.asarray(hp.dist),
                                  np.asarray(st.best_t))
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(st.tri))
    np.testing.assert_array_equal(np.asarray(hp.inst),
                                  np.asarray(st.best_inst))
    # the cutout must actually fire: some rays' closest accepted hit is
    # NOT their geometric closest hit
    hp0, _ = trace_packets(wa, o, d, packet=64)
    changed = (np.asarray(hp0.dist) != np.asarray(hp.dist)).sum()
    assert changed > 50, f"alpha test never rejected anything ({changed})"


def test_inline_alpha_flattened_build():
    """Same parity on the flattened (single-BVH, packed-id) build — the
    layout the perf path uses (rule 22); suspension needs the TLAS build,
    so compare in-loop flat vs in-loop TLAS (both already pinned to the
    suspension engine by the test above)."""
    sc = _cutout_scene()
    sb_t = sc.build()
    sb_f = sc.build(RTConfig(flatten=True))
    wa_t = WideArrays.from_scene(sb_t).with_alpha(sb_t)
    wa_f = WideArrays.from_scene(sb_f).with_alpha(sb_f)
    _, (o, d) = _camera_rays()

    ht, _ = trace_packets(wa_t, o, d, packet=64, alpha_ref=THR)
    hf, _ = trace_packets(wa_f, o, d, packet=64, alpha_ref=THR)
    np.testing.assert_allclose(np.asarray(hf.dist), np.asarray(ht.dist),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hf.tri), np.asarray(ht.tri))
    np.testing.assert_array_equal(np.asarray(hf.inst), np.asarray(ht.inst))


def test_inline_alpha_occlusion_mode():
    """Occlusion (shadow) queries respect the cutout: a surface whose
    alpha is below threshold does not occlude."""
    sb = _cutout_scene().build()
    wa = WideArrays.from_scene(sb).with_alpha(sb)
    _, (o, d) = _camera_rays(32, 32)
    t_max = np.full(o.shape[0], 10.0, np.float32)

    h_occ, _ = trace_packets(wa, o, d, packet=64, t_max=jnp.asarray(t_max),
                             occlusion=True, alpha_ref=THR)
    h_clo, _ = trace_packets(wa, o, d, packet=64, alpha_ref=THR)
    occluded = np.asarray(h_occ.dist) == 0.0
    has_hit = np.asarray(h_clo.dist) < 10.0
    np.testing.assert_array_equal(occluded, has_hit)
    # and it must differ from the no-alpha occlusion on cut-out lanes
    h_occ0, _ = trace_packets(wa, o, d, packet=64,
                              t_max=jnp.asarray(t_max), occlusion=True)
    assert (np.asarray(h_occ0.dist) == 0.0).sum() > occluded.sum()


def _checker_pred(u, v, alpha):
    """Non-alpha stateless any-hit: a procedural uv checkerboard cutout
    (keep only even cells) that ALSO drops near-black surfaces — mixes
    uv and alpha inputs so both predicate operands are exercised."""
    cu = jnp.floor(u * 6.0).astype(jnp.int32)
    cv = jnp.floor(v * 6.0).astype(jnp.int32)
    return (((cu + cv) % 2) == 0) & (alpha >= 0.05)


def test_stateless_predicate_matches_suspension_engine():
    """trace_packets(anyhit_pred=...) with a NON-alpha predicate returns
    the identical accepted-hit set as the per-ray suspension protocol
    running the same decision through CONT/ACCEPT commits — the packet-
    speed generalization of the reference's arbitrary any-hit shaders
    (rt_unit.cpp:190-213, VERDICT r4 #6)."""
    from vortex_rt_tpu.utils.config import COMMIT_ACCEPT

    sb = _cutout_scene().build()
    wa = WideArrays.from_scene(sb).with_alpha(sb)
    sa = ShadeArrays.from_scene(sb)
    _, (o, d) = _camera_rays()

    hp, _ = trace_packets(wa, o, d, packet=64, anyhit_pred=_checker_pred)

    # suspension loop with the identical decision
    ox, oy, oz = (jnp.asarray(o[:, k]) for k in range(3))
    dx, dy, dz = (jnp.asarray(d[:, k]) for k in range(3))

    def cond(s):
        return jnp.any(~s.done)

    def body(s):
        _, s, _ = trace_lanes(wa, ox, oy, oz, dx, dy, dz, state=s,
                              suspend=True)
        sp = shade_point(
            sa, ox, oy, oz, dx, dy, dz,
            s.pend_t, s.pend_bx, s.pend_by, 1.0 - s.pend_bx - s.pend_by,
            jnp.clip(s.pend_tri, 0, sa.shade_rows.shape[0] - 1),
            jnp.clip(s.pend_inst, 0, sa.inst_shade.shape[0] - 1))
        alpha = (0.2126 * sp.color_r + 0.7152 * sp.color_g
                 + 0.0722 * sp.color_b)
        action = jnp.where(_checker_pred(sp.u, sp.v, alpha),
                           jnp.int32(COMMIT_ACCEPT),
                           jnp.int32(COMMIT_CONT)).astype(jnp.int32)
        return commit(s, jnp.where(s.suspended, action, COMMIT_CONT))

    st = init_state_lanes(ox, oy, oz, dx, dy, dz)
    st = jax.lax.while_loop(cond, body, st)

    np.testing.assert_array_equal(np.asarray(hp.dist),
                                  np.asarray(st.best_t))
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(st.tri))
    np.testing.assert_array_equal(np.asarray(hp.inst),
                                  np.asarray(st.best_inst))
    # the checker cutout must fire, and differently from the alpha test
    hp0, _ = trace_packets(wa, o, d, packet=64)
    hpa, _ = trace_packets(wa, o, d, packet=64, alpha_ref=THR)
    assert (np.asarray(hp0.dist) != np.asarray(hp.dist)).sum() > 50
    assert (np.asarray(hpa.dist) != np.asarray(hp.dist)).sum() > 50


def test_wavefront_stateless_predicate_frame():
    """Full wavefront frames with a stateless_anyhit table: the packet
    in-loop path (auto-selected) renders the same image as the per-ray
    suspension fallback (packet=0) running the same shader through the
    commit protocol."""
    from vortex_rt_tpu.engine.shaders import stateless_anyhit

    sb = _cutout_scene().build()
    cam, _ = _camera_rays()
    p = RenderParams(light_pos=(0.5, 1.5, -1.0), max_depth=2, shadow=True)
    w = h = 48

    table = ShaderTable(anyhit=stateless_anyhit(_checker_pred, "checker"))
    r_fast = WavefrontRenderer.from_buffers(sb, RTConfig(), table=table)
    assert r_fast.wa.alpha_rows is not None  # tables auto-built
    img_fast, rays_fast = r_fast.render(cam, p, w, h)

    cfg_slow = RTConfig(packet_size=0, bounce_packet=0, lanes=512)
    r_slow = WavefrontRenderer.from_buffers(sb, cfg_slow, table=table)
    img_slow, rays_slow = r_slow.render(cam, p, w, h)

    np.testing.assert_allclose(img_fast, img_slow, atol=2e-6)
    assert rays_fast == rays_slow

    # the predicate cutout changes the image vs the solid render
    r_solid = WavefrontRenderer.from_buffers(sb, RTConfig())
    img_solid, _ = r_solid.render(cam, p, w, h)
    assert np.abs(img_fast - img_solid).max() > 0.05


def test_wavefront_inline_alpha_matches_suspension_frame():
    """Full wavefront frames: the packet in-loop alpha path (default for
    alpha_test_anyhit tables) renders the same image as the per-ray
    suspension fallback (packet=0), shadows on."""
    sb = _cutout_scene().build()
    cam, _ = _camera_rays()
    p = RenderParams(light_pos=(0.5, 1.5, -1.0), max_depth=2, shadow=True)
    w = h = 48

    table = ShaderTable(anyhit=alpha_test_anyhit(THR))
    r_fast = WavefrontRenderer.from_buffers(sb, RTConfig(), table=table)
    assert r_fast.wa.alpha_rows is not None  # tables auto-built
    img_fast, rays_fast = r_fast.render(cam, p, w, h)

    cfg_slow = RTConfig(packet_size=0, bounce_packet=0, lanes=512)
    r_slow = WavefrontRenderer.from_buffers(sb, cfg_slow, table=table)
    img_slow, rays_slow = r_slow.render(cam, p, w, h)

    np.testing.assert_allclose(img_fast, img_slow, atol=2e-6)
    assert rays_fast == rays_slow

    # and the cutout changes the image vs the no-anyhit render
    r_solid = WavefrontRenderer.from_buffers(sb, RTConfig())
    img_solid, _ = r_solid.render(cam, p, w, h)
    assert np.abs(img_fast - img_solid).max() > 0.05


def test_inline_alpha_fused_rows_parity():
    """Fused rows that carry the alpha fields (with_alpha after fuse —
    round 5): the any-hit leaf step reads uv/texture-window fields from
    the node-row gather already in hand instead of a second gather at
    the same chain depth.  Hits must be bit-identical to the separate
    alpha_rows gather (same values, same candidate decisions), in both
    the single-front and multi-front bodies."""
    sc = _cutout_scene()
    sb = sc.build(RTConfig(flatten=True))
    wa_sep = WideArrays.from_scene(sb, width=8).with_alpha(sb)
    wa_fused = WideArrays.from_scene(sb, width=8).fuse().with_alpha(sb)
    assert wa_fused.fused is not None
    lmax = max(int(wa_fused.max_leaf_tris), 1)
    assert int(wa_fused.fused.shape[1]) == 32 + 24 * lmax
    _, (o, d) = _camera_rays()

    for fr in (1, 2):
        hs, _ = trace_packets(wa_sep, o, d, packet=16, alpha_ref=THR,
                              fronts=fr)
        hf, _ = trace_packets(wa_fused, o, d, packet=16, alpha_ref=THR,
                              fronts=fr)
        np.testing.assert_array_equal(np.asarray(hs.dist),
                                      np.asarray(hf.dist))
        np.testing.assert_array_equal(np.asarray(hs.tri),
                                      np.asarray(hf.tri))
        np.testing.assert_array_equal(np.asarray(hs.bx), np.asarray(hf.bx))


def test_fuse_after_with_alpha_also_carries_alpha():
    """Both call orders produce the alpha-extended fused table."""
    sc = _cutout_scene()
    sb = sc.build(RTConfig(flatten=True))
    wa_a = WideArrays.from_scene(sb, width=8).with_alpha(sb).fuse()
    wa_b = WideArrays.from_scene(sb, width=8).fuse().with_alpha(sb)
    np.testing.assert_array_equal(np.asarray(wa_a.fused),
                                  np.asarray(wa_b.fused))
