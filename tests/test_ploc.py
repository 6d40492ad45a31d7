"""PLOC builder (LBVH v3, accel/ploc.py): hit correctness, tree
quality vs SAH and vs the v2 radix tree, and the level-sweep refit.

The quality target (VERDICT r3 #3): close the 2.07x packet-step gap of
v2 — PLOC's free nearest-neighbor merging over the same cut-leaf
clusters attacks exactly the internal-overlap half of the gap."""

import numpy as np
import pytest

import jax.numpy as jnp

from vortex_rt_tpu.accel.lbvh import (
    build_wide_from_tris, pad_tris, tree_surface_area,
    wide_arrays_from_lbvh,
)
from vortex_rt_tpu.accel.ploc import (
    build_ploc_topo, build_wide_ploc, refit_ploc,
)
from vortex_rt_tpu.models import bigscenes
from vortex_rt_tpu.models.scene import Scene
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays


def _ortho_rays(n_side=48, span=18.0, y0=10.0):
    n = n_side * n_side
    ii = np.arange(n)
    x = (ii % n_side + 0.5) / n_side * span - span / 2
    z = (ii // n_side + 0.5) / n_side * span - span / 2
    o = np.stack([x, np.full(n, y0), z], 1).astype(np.float32)
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    return jnp.asarray(o), jnp.asarray(d)


def _tilted_rays(n_side=40, span=20.0, y0=12.0):
    """Oblique rays: see down-tree overlap that axis rays can miss."""
    n = n_side * n_side
    ii = np.arange(n)
    x = (ii % n_side + 0.5) / n_side * span - span / 2
    z = (ii // n_side + 0.5) / n_side * span - span / 2
    o = np.stack([x - 0.2 * span, np.full(n, y0), z - 0.2 * span], 1)
    d = np.tile(np.array([[0.25, -1.0, 0.2]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o.astype(np.float32)),
            jnp.asarray(d.astype(np.float32)))


@pytest.fixture(scope="module")
def grid100k():
    return bigscenes.wavy_grid(n=224)  # 2*224^2 = 100,352 tris


@pytest.fixture(scope="module")
def blob10k():
    return bigscenes.blob(n=70)


def _scene_of(mesh):
    sc = Scene()
    sc.add_instance(sc.add_mesh(mesh))
    return sc.build()


def test_ploc_hits_match_sah(blob10k):
    """Closest hits (dist + tri id) identical to the host SAH tree —
    tree topology must never change intersections."""
    sb = _scene_of(blob10k)
    wa_sah = WideArrays.from_scene(sb)
    wa_ploc = build_wide_ploc(sb)

    # blob: unit-radius organic mesh at the origin — tight ray spans
    for o, d in (_ortho_rays(32, span=2.4, y0=4.0),
                 _tilted_rays(32, span=2.6, y0=4.0)):
        h1, _ = trace_packets(wa_sah, o, d, packet=64)
        h2, _ = trace_packets(wa_ploc, o, d, packet=64)
        np.testing.assert_allclose(np.asarray(h1.dist),
                                   np.asarray(h2.dist),
                                   rtol=1e-5, atol=1e-5)
        hit = np.asarray(h1.dist) < 1e29
        assert hit.sum() > 100
        agree = (np.asarray(h1.tri)[hit]
                 == np.asarray(h2.tri)[hit]).mean()
        assert agree > 0.995, f"tri-id agreement {agree}"


def test_ploc_width8(blob10k):
    sb = _scene_of(blob10k)
    wa4 = build_wide_ploc(sb, width=4)
    wa8 = build_wide_ploc(sb, width=8)
    o, d = _tilted_rays(32, span=2.6, y0=4.0)
    h4, _ = trace_packets(wa4, o, d, packet=64)
    h8, _ = trace_packets(wa8, o, d, packet=64)
    np.testing.assert_array_equal(np.asarray(h4.dist),
                                  np.asarray(h8.dist))
    np.testing.assert_array_equal(np.asarray(h4.tri), np.asarray(h8.tri))


def test_ploc_quality_beats_v2_and_nears_sah(grid100k):
    """The round-4 quality gate, HARD (replaces v2's xfail aspiration):
    PLOC packet-steps <= 1.5x the SAH tree's, and strictly better than
    the v2 radix tree's on the same scene/rays."""
    sb = _scene_of(grid100k)
    wa_sah = WideArrays.from_scene(sb)
    wa_v2 = build_wide_from_tris(sb)
    wa_v3 = build_wide_ploc(sb)

    o, d = _tilted_rays(48)   # 2304 rays = 18 x 128-ray packets
    _, st_sah = trace_packets(wa_sah, o, d, packet=128, stats=True)
    _, st_v2 = trace_packets(wa_v2, o, d, packet=128, stats=True)
    _, st_v3 = trace_packets(wa_v3, o, d, packet=128, stats=True)

    r_v3 = int(st_v3.packet_steps) / max(int(st_sah.packet_steps), 1)
    r_v2 = int(st_v2.packet_steps) / max(int(st_sah.packet_steps), 1)
    assert r_v3 < r_v2, (r_v3, r_v2)
    assert r_v3 <= 1.5, (
        f"PLOC visits {r_v3:.2f}x SAH packet-steps (v2: {r_v2:.2f}x)")


def test_ploc_refit_matches_build(grid100k):
    """Level-sweep refit on unchanged geometry reproduces the packed
    tree bit-for-bit; after motion, boxes stay valid (same hits as a
    fresh PLOC build on the moved geometry is NOT required — topology
    is stale by design — but hit parity vs SAH on moved geometry is)."""
    m = grid100k
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    dv = [jnp.asarray(v) for v in (v0, v1, v2)]
    lb, ptopo = build_ploc_topo(*dv, leaf_size=4)
    lb2 = refit_ploc(ptopo, *dv, leaf_size=4)
    np.testing.assert_array_equal(np.asarray(lb.nodes),
                                  np.asarray(lb2.nodes))

    def ripple(v, t):
        y = v[:, 1] + 0.3 * jnp.sin(0.7 * v[:, 0] + 2.1 * t) \
            * jnp.cos(0.5 * v[:, 2] - 1.3 * t)
        return v.at[:, 1].set(y)

    moved = [ripple(v, 0.4) for v in dv]
    lb3 = refit_ploc(ptopo, *moved, leaf_size=4)
    wa3 = wide_arrays_from_lbvh(lb3)

    sc = Scene()
    import dataclasses as _dc
    mesh2 = _dc.replace(
        m, v0=np.asarray(moved[0])[: m.v0.shape[0]],
        v1=np.asarray(moved[1])[: m.v1.shape[0]],
        v2=np.asarray(moved[2])[: m.v2.shape[0]])
    sc.add_instance(sc.add_mesh(mesh2))
    wa_sah = WideArrays.from_scene(sc.build())

    o, d = _ortho_rays(32)
    h1, _ = trace_packets(wa_sah, o, d, packet=64)
    h2, _ = trace_packets(wa3, o, d, packet=64)
    np.testing.assert_allclose(np.asarray(h1.dist), np.asarray(h2.dist),
                               rtol=1e-4, atol=1e-4)


def test_ploc_area_below_v2(grid100k):
    """Summed node surface area (the SAH cost proxy) must drop vs v2."""
    sb = _scene_of(grid100k)
    a_v2 = tree_surface_area(np.asarray(build_wide_from_tris(sb).nodes))
    a_v3 = tree_surface_area(np.asarray(build_wide_ploc(sb).nodes))
    assert a_v3 < a_v2, (a_v3, a_v2)
