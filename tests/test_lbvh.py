"""On-device LBVH: structure, refit, and hit parity vs the oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from vortex_rt_tpu.accel.lbvh import (
    build_lbvh, build_lbvh_topo, morton3d, pad_tris, refit_lbvh,
    wide_arrays_from_lbvh,
)
from vortex_rt_tpu.accel.qbvh import KIND_INSTANCE, KIND_INTERNAL, KIND_TRIS
from vortex_rt_tpu.golden.renderer import brute_force_hits
from vortex_rt_tpu.models.procedural import random_soup, uv_sphere
from vortex_rt_tpu.models.scene import Scene
from vortex_rt_tpu.ops.traverse_wide import trace_rays_wide
from vortex_rt_tpu.utils.config import LARGE_FLOAT


def test_morton_ordering():
    """Morton codes preserve octant ordering."""
    m000 = int(morton3d(jnp.array([0.1]), jnp.array([0.1]), jnp.array([0.1]))[0])
    m111 = int(morton3d(jnp.array([0.9]), jnp.array([0.9]), jnp.array([0.9]))[0])
    assert m000 < m111
    # x is the highest interleaved bit
    mx = int(morton3d(jnp.array([0.9]), jnp.array([0.0]), jnp.array([0.0]))[0])
    my = int(morton3d(jnp.array([0.0]), jnp.array([0.9]), jnp.array([0.0]))[0])
    mz = int(morton3d(jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.9]))[0])
    assert mx > my > mz


def _lbvh_structure_ok(nodes, tri_rows, leaf_size, t):
    """Host-side structural validation of the packed 4-wide pool.

    v2 (subtree-cut) semantics: leaves hold 1..leaf_size triangles (a
    maximal Karras subtree's contiguous Morton range); every GLOBAL
    triangle id must be referenced exactly once across all leaves."""
    nodes = np.asarray(nodes)
    rows = np.asarray(tri_rows)
    meta = nodes[:, 14]
    kind = meta >> 29
    nch = (meta >> 26) & 7
    left = (meta & ((1 << 26) - 1)).astype(np.int64)
    # flat layout (no TLAS wrapper): the tree root sits at node 0
    assert kind[0] in (KIND_INTERNAL, KIND_TRIS)
    covered = np.zeros(t, np.int32)
    stack = [0]
    seen = set()
    max_w = 0
    while stack:
        x = stack.pop()
        assert x not in seen, "cycle in LBVH"
        seen.add(x)
        if kind[x] == KIND_TRIS:
            cnt = int(nodes[x, 15])
            assert 1 <= cnt <= leaf_size
            row = rows[int(left[x])]
            for c in range(cnt):
                tid = row[16 * c + 9 : 16 * c + 10].view(np.int32)[0]
                assert 0 <= tid < t
                covered[tid] += 1
        else:
            assert kind[x] == KIND_INTERNAL
            assert 2 <= nch[x] <= 4
            max_w = max(max_w, int(nch[x]))
            stack += [int(left[x]) + c for c in range(int(nch[x]))]
    assert (covered == 1).all()
    # the collapse really produces wide nodes (not a renamed binary tree)
    assert max_w >= 3
    # unreferenced pool slots (skipped/below-cut internals) must be zero
    for x in range(1, nodes.shape[0]):
        if x not in seen:
            assert (nodes[x] == 0).all()


def test_lbvh_structure(rng):
    m = random_soup(rng, 128)
    lb = build_lbvh(jnp.asarray(m.v0), jnp.asarray(m.v1), jnp.asarray(m.v2),
                    leaf_size=4)
    _lbvh_structure_ok(lb.nodes, lb.tri_rows, 4, 128)


def test_lbvh_boxes_contain_children(rng):
    """Every dequantized child box must contain its subtree's triangles."""
    m = random_soup(rng, 64)
    lb = build_lbvh(jnp.asarray(m.v0), jnp.asarray(m.v1), jnp.asarray(m.v2),
                    leaf_size=4)
    nodes = np.asarray(lb.nodes)
    rows = np.asarray(lb.tri_rows)
    # unpack leaf rows to per-leaf triangle point sets
    leaf_pts = []
    for j in range(rows.shape[0]):
        pts = []
        for c in range(4):
            base = 16 * c
            tid = rows[j, base + 9 : base + 10].view(np.int32)[0]
            v0 = rows[j, base : base + 3]
            e1 = rows[j, base + 3 : base + 6]
            e2 = rows[j, base + 6 : base + 9]
            if np.any(e1 != 0) or np.any(e2 != 0) or tid >= 0:
                pts += [v0, v0 + e1, v0 + e2]
        # v2 pools size rows to T; unused rows stay empty
        leaf_pts.append(np.stack(pts) if pts else np.zeros((0, 3)))
    meta = nodes[:, 14]
    kind = meta >> 29
    left = (meta & ((1 << 26) - 1)).astype(np.int64)

    nch = (meta >> 26) & 7

    def subtree_pts(x):
        if kind[x] == KIND_TRIS:
            return [leaf_pts[left[x]]]
        out = []
        for c in range(int(nch[x])):
            out += subtree_pts(int(left[x]) + c)
        return out

    for x in range(1, nodes.shape[0]):
        if kind[x] != KIND_INTERNAL:
            continue
        org = nodes[x, 0:3].view(np.float32)
        scl = nodes[x, 3:6].view(np.float32)
        for c in range(int(nch[x])):
            ql = nodes[x, 6 + c]
            qh = nodes[x, 10 + c]
            lo = org + np.array([(ql >> s) & 255 for s in (0, 8, 16)]) * scl
            hi = org + np.array([(qh >> s) & 255 for s in (0, 8, 16)]) * scl
            pts = np.concatenate(subtree_pts(int(left[x]) + c))
            assert (lo <= pts.min(0) + 1e-4).all()
            assert (hi >= pts.max(0) - 1e-4).all()


def test_lbvh_hit_parity(rng):
    """LBVH traversal must agree with the brute-force oracle (different
    tree than SAH, same closest hits)."""
    sc = Scene()
    sc.add_mesh(random_soup(rng, 256))
    sb = sc.build()
    wa = wide_arrays_from_lbvh(
        build_lbvh(jnp.asarray(sb.v0), jnp.asarray(sb.v1),
                   jnp.asarray(sb.v2), leaf_size=4))
    o = rng.uniform(-14, 14, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hits, state, _ = trace_rays_wide(wa, jnp.asarray(o), jnp.asarray(d))
    ref = brute_force_hits(o, d, sb)
    got = np.asarray(hits.dist)
    np.testing.assert_array_equal(got < LARGE_FLOAT, ref["dist"] < LARGE_FLOAT)
    h = ref["dist"] < LARGE_FLOAT
    np.testing.assert_allclose(got[h], ref["dist"][h], rtol=2e-4)
    assert bool(np.asarray(state.done).all())


def test_lbvh_rebuild_animated(rng):
    """Per-frame rebuild: move the geometry, rebuild, hits follow."""
    m = uv_sphere((0, 0, 0), 1.0, 8, 12)
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (16, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (16, 1))
    build = jax.jit(lambda a, b, c: build_lbvh(a, b, c, leaf_size=4))
    for shift in (0.0, 2.5):
        off = np.array([0, 0, shift], np.float32)
        lb = build(jnp.asarray(v0 + off), jnp.asarray(v1 + off),
                   jnp.asarray(v2 + off))
        wa = wide_arrays_from_lbvh(lb)
        hits, _, _ = trace_rays_wide(wa, jnp.asarray(o), jnp.asarray(d))
        t = float(np.asarray(hits.dist)[0])
        assert abs(t - (4.0 + shift)) < 0.05, (shift, t)


def test_lbvh_refit_fast_path(rng):
    """refit_lbvh keeps topology and tracks moving geometry; its result
    must equal a full rebuild when positions only translate (the Morton
    order is translation-invariant up to quantization)."""
    m = uv_sphere((0, 0, 0), 1.0, 8, 12)
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    lb0, topo = build_lbvh_topo(jnp.asarray(v0), jnp.asarray(v1),
                                jnp.asarray(v2), leaf_size=4)
    o = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (16, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (16, 1))
    for shift in (0.0, 1.5):
        off = np.array([0, 0, shift], np.float32)
        lb = refit_lbvh(topo, jnp.asarray(v0 + off), jnp.asarray(v1 + off),
                        jnp.asarray(v2 + off), leaf_size=4)
        _lbvh_structure_ok(lb.nodes, lb.tri_rows, 4, v0.shape[0])
        wa = wide_arrays_from_lbvh(lb)
        hits, _, _ = trace_rays_wide(wa, jnp.asarray(o), jnp.asarray(d))
        t = float(np.asarray(hits.dist)[0])
        assert abs(t - (4.0 + shift)) < 0.05, (shift, t)


def test_lbvh_refit_parity_with_oracle(rng):
    """Refit trees (deformed geometry, stale topology) still produce
    exact closest hits — refit only loosens box quality, never wrongness."""
    m = random_soup(rng, 256)
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    _, topo = build_lbvh_topo(jnp.asarray(v0), jnp.asarray(v1),
                              jnp.asarray(v2), leaf_size=4)
    # deform: squash y, shear x by z
    def deform(v):
        w = v.copy()
        w[:, 1] *= 0.5
        w[:, 0] += 0.3 * w[:, 2]
        return w
    dv0, dv1, dv2 = deform(v0), deform(v1), deform(v2)
    lb = refit_lbvh(topo, jnp.asarray(dv0), jnp.asarray(dv1),
                    jnp.asarray(dv2), leaf_size=4)
    wa = wide_arrays_from_lbvh(lb)
    sc = Scene()
    from vortex_rt_tpu.models.scene import make_mesh
    sc.add_mesh(make_mesh(dv0, dv1, dv2))
    sb = sc.build()
    o = rng.uniform(-14, 14, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hits, state, _ = trace_rays_wide(wa, jnp.asarray(o), jnp.asarray(d))
    ref = brute_force_hits(o, d, sb)
    got = np.asarray(hits.dist)
    np.testing.assert_array_equal(got < LARGE_FLOAT,
                                  ref["dist"] < LARGE_FLOAT)
    h = ref["dist"] < LARGE_FLOAT
    np.testing.assert_allclose(got[h], ref["dist"][h], rtol=2e-4)
    assert bool(np.asarray(state.done).all())


def test_refit_compact_pools(rng):
    """refit_lbvh(pool_rows=, leaf_rows= from compact_sizes) emits exact
    PREFIXES of the worst-case 2T-1 / T tables (ids are prefix sums), so
    the compact refit is bit-identical where it overlaps and every
    downstream consumer just sees smaller tables (VERDICT r4 #5: the
    1M-tri refit paid ~7x pool padding per frame)."""
    from vortex_rt_tpu.accel.lbvh import compact_plan

    m = random_soup(rng, 600)
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    dv = [jnp.asarray(v) for v in (v0, v1, v2)]
    for width in (4, 8):
        _, topo = build_lbvh_topo(*dv, leaf_size=4, width=width)
        pool, rows, surv_idx = compact_plan(topo, pad=64)
        t = v0.shape[0]
        assert pool < 2 * t - 1 and rows <= t
        full = refit_lbvh(topo, *dv, leaf_size=4, width=width)
        comp = refit_lbvh(topo, *dv, leaf_size=4, width=width,
                          pool_rows=pool, leaf_rows=rows,
                          surv_idx=surv_idx)
        assert comp.nodes.shape == (pool, 32)
        assert comp.tri_rows.shape[0] == rows
        np.testing.assert_array_equal(np.asarray(comp.nodes),
                                      np.asarray(full.nodes[:pool]))
        np.testing.assert_array_equal(np.asarray(comp.tri_rows),
                                      np.asarray(full.tri_rows[:rows]))
        # nothing truncated: no node record landed beyond the compact
        # bound (rows beyond it hold only the -1 empty-slot tid
        # sentinel — never referenced, since every KIND_TRIS left id is
        # a used-prefix row)
        assert not np.asarray(full.nodes[pool:]).any()
        tails = np.asarray(full.tri_rows[rows:]).reshape(-1, 16)
        assert not tails[:, :9].any()
        # and the compact tree traces identically (per-ray engine is
        # 4-wide only; width 8 is covered by the exact prefix equality)
        if width == 4:
            r = np.random.default_rng(5)
            o = r.uniform(-14, 14, (64, 3)).astype(np.float32)
            d = r.normal(size=(64, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            hf, _, _ = trace_rays_wide(
                wide_arrays_from_lbvh(full, 4, width=width),
                jnp.asarray(o), jnp.asarray(d))
            hc, _, _ = trace_rays_wide(
                wide_arrays_from_lbvh(comp, 4, width=width),
                jnp.asarray(o), jnp.asarray(d))
            np.testing.assert_array_equal(np.asarray(hc.dist),
                                          np.asarray(hf.dist))


def test_pad_tris():
    v = np.zeros((5, 3), np.float32)
    a, b, c = pad_tris(v, v + 1, v + 2, 4)
    assert a.shape[0] == 8
    # padding is degenerate (all three verts identical)
    assert (a[5:] == b[5:]).all() and (b[5:] == c[5:]).all()


def test_sah_sweep_method_parity(rng):
    """build_lbvh_topo(method='sah') produces a sound tree: same hits
    as the karras tree and the refit fast path reproduces the build."""
    m = random_soup(rng, 300)
    v0, v1, v2 = pad_tris(m.v0, m.v1, m.v2, 4)
    dv = [jnp.asarray(v) for v in (v0, v1, v2)]
    lb_k, _ = build_lbvh_topo(*dv, leaf_size=4, method="karras")
    lb_s, topo_s = build_lbvh_topo(*dv, leaf_size=4, method="sah")
    _lbvh_structure_ok(lb_s.nodes, lb_s.tri_rows, 4, v0.shape[0])
    r = np.random.default_rng(11)
    o = r.uniform(-2, 2, (512, 3)).astype(np.float32)
    d = r.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hk, _, _ = trace_rays_wide(wide_arrays_from_lbvh(lb_k),
                               jnp.asarray(o), jnp.asarray(d))
    hs, _, _ = trace_rays_wide(wide_arrays_from_lbvh(lb_s),
                               jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(hs.dist), np.asarray(hk.dist),
                               rtol=1e-6)
    lb_s2 = refit_lbvh(topo_s, *dv, leaf_size=4)
    np.testing.assert_array_equal(np.asarray(lb_s2.nodes),
                                  np.asarray(lb_s.nodes))
