"""8-wide LBVH: device-build collapse at width 8, packet parity vs width 4.

The width-8 collapse adopts great-grandchildren (depth stride 3) above
the subtree cut; hit results are tree-shape-independent, so the 8-wide
LBVH must match the 4-wide LBVH's packet hits EXACTLY on identical
geometry (ids are Morton-global either way)."""

import jax.numpy as jnp
import numpy as np

from vortex_rt_tpu.accel.lbvh import (
    build_lbvh, build_lbvh_topo, pad_tris, refit_lbvh, wide_arrays_from_lbvh,
)
from vortex_rt_tpu.golden.renderer import brute_force_hits
from vortex_rt_tpu.models.procedural import random_soup, uv_sphere
from vortex_rt_tpu.models.scene import Scene
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.utils.config import LARGE_FLOAT


def _build(sb, width, leaf=4):
    v0, v1, v2 = pad_tris(sb.v0, sb.v1, sb.v2, leaf)
    lb = build_lbvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                    leaf_size=leaf, width=width)
    return wide_arrays_from_lbvh(lb, leaf, width=width)


def test_lbvh8_packet_parity(rng):
    sc = Scene()
    sc.add_mesh(random_soup(rng, 500))
    sb = sc.build()
    wa4 = _build(sb, 4)
    wa8 = _build(sb, 8)
    assert wa8.width == 8

    def n_internal(wa):
        # the packed pool is fixed-size (2l-1 rows); unused rows are all
        # zero and decode as kind==0, so count only nonzero-meta internals
        meta = np.asarray(wa.nodes[:, 6 + 2 * wa.width])
        return int(((meta != 0) & ((meta >> 29) == 0)).sum())

    assert n_internal(wa8) < n_internal(wa4)
    o = rng.uniform(-14, 14, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h4, s4 = trace_packets(wa4, o, d, packet=32)
    h8, s8 = trace_packets(wa8, o, d, packet=32)
    np.testing.assert_array_equal(np.asarray(h4.dist), np.asarray(h8.dist))
    np.testing.assert_array_equal(np.asarray(h4.tri), np.asarray(h8.tri))
    assert int(s8) < int(s4)
    ref = brute_force_hits(o, d, sb)
    np.testing.assert_array_equal(np.asarray(h8.dist) < LARGE_FLOAT,
                                  ref["dist"] < LARGE_FLOAT)


def test_lbvh8_leaf8(rng):
    """Width 8 with 8-triangle subtree-cut leaves."""
    sc = Scene()
    sc.add_mesh(random_soup(rng, 500))
    sb = sc.build()
    wa4 = _build(sb, 4, leaf=4)
    wa8 = _build(sb, 8, leaf=8)
    assert wa8.max_leaf_tris == 8
    o = rng.uniform(-14, 14, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h4, _ = trace_packets(wa4, o, d, packet=32)
    h8, _ = trace_packets(wa8, o, d, packet=32)
    np.testing.assert_array_equal(np.asarray(h4.dist), np.asarray(h8.dist))
    np.testing.assert_array_equal(np.asarray(h4.tri), np.asarray(h8.tri))


def test_lbvh8_refit(rng):
    """Refit keeps the 8-wide topology; hits follow the moved geometry."""
    m = uv_sphere((0, 0, 0), 1.0, 10, 14)
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    _, topo = build_lbvh_topo(jnp.asarray(v0), jnp.asarray(v1),
                              jnp.asarray(v2), leaf_size=4, width=8)
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (32, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (32, 1))
    for shift in (0.0, 2.0):
        w0 = jnp.asarray(v0) + shift
        w1 = jnp.asarray(v1) + shift
        w2 = jnp.asarray(v2) + shift
        lb = refit_lbvh(topo, w0, w1, w2, leaf_size=4, width=8)
        wa = wide_arrays_from_lbvh(lb, 4, width=8)
        hits, _ = trace_packets(wa, o, d, packet=32)
        dist = np.asarray(hits.dist)
        if shift == 0.0:
            assert np.all(dist < LARGE_FLOAT)       # sphere dead ahead
            np.testing.assert_allclose(dist, 4.0, atol=0.05)
        else:
            assert np.all(dist == LARGE_FLOAT)      # moved out of the beam
