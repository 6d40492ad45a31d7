"""On-device LBVH: Morton sort + Karras hierarchy + 4-wide collapse +
refit + packed emit.

New capability beyond the reference (whose BVH build is host-side binned
SAH, bvh.cpp:30-109): a fully device-side (jittable) linear BVH so animated
scenes rebuild per frame without host round-trips — BASELINE.json configs
3 and 5 and the north-star requirement.

Pipeline (all jax.numpy, one jit):
1. 30-bit Morton codes of TRIANGLE centroids over the scene AABB (bit
   interleave via magic-number expansion)
2. stable sort by Morton code (ties break by index, matching the
   augmented-key convention Karras requires)
3. Karras 2012 binary radix tree over ALL triangles: per-internal-node
   range + split found with fixed-step doubling/binary searches, fully
   vectorized over nodes — no sequential build
4. **subtree-cut leaves**: every maximal Karras subtree covering
   <= ``leaf_size`` triangles becomes one wide leaf (its triangle range
   is contiguous in Morton order, so a leaf is a gather of adjacent
   sorted slots).  This replaces v1's fixed Morton-order 4-chunks, which
   crossed cluster boundaries and cost 6.5x the SAH builder's leaf-box
   area (measured on a 100k wavy grid; the quality gate in
   tests/test_lbvh_quality.py)
5. bottom-up AABB refit as a fixed-point sweep (children-ready masking)
6. **collapse to the reference's 4-wide node shape** (rt_traversal.h
   BVH_WIDTH=4): above-cut internal nodes at even depth survive and
   adopt their grandchildren (arity 2-4), odd-depth internals vanish,
   cut subtrees attach as leaves.  Halves traversal depth and fills the
   quantized child slots the engine tests per step — the static
   builder's qbvh.collapse_flat, re-derived as vectorized device
   arithmetic (prefix-sum slot allocation, no recursion)
7. quantize + pack directly into the traversal engine's 64-byte node
   records (ops.traverse_wide layout) — the tree goes from vertex
   buffers to traversal-ready without leaving the device

**Refit fast path** (config 5 animation): ``build_lbvh_topo`` returns the
topology (Morton order, child lists, slot assignment); ``refit_lbvh``
keeps it and only recomputes leaf boxes -> refit sweep -> requantize —
no argsort, no Karras searches.  Valid while the motion keeps the Morton
clustering acceptable (vertex-position animation); rebuild when quality
decays.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vortex_rt_tpu.accel.qbvh import KIND_INSTANCE, KIND_INTERNAL, KIND_TRIS

_LEFT_BITS = 26


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(x, y, z):
    """30-bit Morton code of coordinates in [0, 1)."""
    def q(c):
        return jnp.clip(c * 1024.0, 0.0, 1023.0).astype(jnp.uint32)

    return (_expand_bits(q(x)) * 4 + _expand_bits(q(y)) * 2
            + _expand_bits(q(z)))


class LBVHNodes(NamedTuple):
    """Packed traversal arrays for a single-mesh LBVH scene."""

    nodes: jnp.ndarray     # (1 + 2L-1, 32) u32: [0]=instance leaf, rest BLAS
    tri_rows: jnp.ndarray  # (L, 64) f32: one leaf per row, Morton order
    num_leaves: jnp.ndarray


class LBVHTopo(NamedTuple):
    """Fixed topology for the refit fast path (config 5 animation).

    All arrays are device-resident; shapes depend only on the triangle
    count T, so ``refit_lbvh`` re-jits only when the mesh size changes.
    Node-id convention: Karras internals 0..T-2, triangle leaves
    (T-1)+j."""

    order: jnp.ndarray      # (T,) Morton triangle permutation
    lchild: jnp.ndarray     # (T-1,) Karras left child (old ids)
    rchild: jnp.ndarray     # (T-1,)
    surv: jnp.ndarray       # (T-1,) bool: survives the wide collapse
    ch_old: jnp.ndarray     # (T-1, width) old ids of wide children (-1=none)
    arity: jnp.ndarray      # (T-1,)
    base: jnp.ndarray       # (T-1,) new id of first wide child (survivors)
    newid: jnp.ndarray      # (2T-1,) new id of surviving/cut nodes
    row_lo: jnp.ndarray     # (T,) first sorted-tri slot of leaf row j
    row_cnt: jnp.ndarray    # (T,) tri count of leaf row j (0 = unused)
    leaf_newid: jnp.ndarray  # (T,) wide-pool id of leaf row j (-1 unused)
    lo: jnp.ndarray         # (T-1,) Karras internal leaf-range start
    hi: jnp.ndarray         # (T-1,) inclusive range end (refit RMQ)


def _clz32(x):
    return jax.lax.clz(x.astype(jnp.int32))


def _karras(lcodes, l):
    """Vectorized Karras 2012 ranges/splits -> (lchild, rchild) old ids
    (internal k in [0, l-1), leaf j at (l-1)+j)."""
    i_idx = jnp.arange(l - 1, dtype=jnp.int32)

    def delta(i, j):
        valid = (j >= 0) & (j < l)
        jj = jnp.clip(j, 0, l - 1)
        x = lcodes[i] ^ lcodes[jj]
        d = jnp.where(x == 0,
                      32 + _clz32(i ^ jj),
                      _clz32(x.astype(jnp.int32)))
        return jnp.where(valid, d, -1)

    d_plus = delta(i_idx, i_idx + 1)
    d_minus = delta(i_idx, i_idx - 1)
    d = jnp.where(d_plus >= d_minus, 1, -1).astype(jnp.int32)
    delta_min = delta(i_idx, i_idx - d)

    lmax_s = jnp.full(l - 1, 2, jnp.int32)
    for _ in range(31):
        probe = delta(i_idx, i_idx + lmax_s * d)
        grow = probe > delta_min
        lmax_s = jnp.where(grow, jnp.minimum(lmax_s * 2, 2**28), lmax_s)
    ln = jnp.zeros(l - 1, jnp.int32)
    step = lmax_s
    for _ in range(32):
        step = step // 2
        ok = (step > 0) & (delta(i_idx, i_idx + (ln + step) * d) > delta_min)
        ln = jnp.where(ok, ln + step, ln)
    j_end = i_idx + ln * d

    delta_node = delta(i_idx, j_end)
    s = jnp.zeros(l - 1, jnp.int32)
    step = ln
    for _ in range(32):
        step = (step + 1) // 2
        cand = s + step
        ok = (cand < ln) & (delta(i_idx, i_idx + cand * d) > delta_node)
        s = jnp.where(ok, cand, s)
        step = jnp.where(step > 1, step, 0)
    gamma = i_idx + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i_idx, j_end)
    hi = jnp.maximum(i_idx, j_end)
    left_is_leaf = lo == gamma
    right_is_leaf = hi == gamma + 1
    lchild = jnp.where(left_is_leaf, (l - 1) + gamma, gamma)
    rchild = jnp.where(right_is_leaf, (l - 1) + gamma + 1, gamma + 1)
    return lchild, rchild, lo, hi


def _half_area(mn, mx):
    e = jnp.maximum(mx - mn, 0.0)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] \
        + e[..., 2] * e[..., 0]


def _sah_sweep_tree(lmin, lmax, l):
    """LBVH v3: sweep-SAH splits over the Morton order.

    Builds the binary tree over CONTIGUOUS ranges of the Morton-sorted
    triangle array (so subtree-cut leaves, the even-depth collapse, and
    the range-query refit all still apply), but each range splits at
    its SAH-minimal position instead of the radix median — segmented
    prefix/suffix box scans evaluate SAH for every candidate split of
    every active range in O(l) per level.  Split positions are
    restricted to the middle half of each range (both sides
    >= max(1, len // 4)), bounding depth by ~log_{4/3}(l) (~48 at 1M
    tris; < 25 after the even-depth collapse) at a negligible SAH cost.

    Measured (100k wavy grid, coherent 128-packets): this lands at
    1.17x host-SAH packet-steps vs 1.10x for the v2 radix-median tree
    — the window restriction + greedy SAH over one fixed (Morton)
    ordering gives up more than the SAH split gains, so v2 stays the
    default.  Kept as the measured alternative (method='sah').

    Returns (lchild, rchild, lo, hi) in the Karras id layout (internal
    k in [0, l-1), root internal 0, leaf j at (l-1)+j)."""
    i_idx = jnp.arange(l, dtype=jnp.int32)
    inf = jnp.float32(3e38)

    def seg_box_scan(flags, reverse):
        def comb(a, b):
            fa, mna, mxa = a
            fb, mnb, mxb = b
            mn = jnp.where(fb[..., None], mnb, jnp.minimum(mna, mnb))
            mx = jnp.where(fb[..., None], mxb, jnp.maximum(mxa, mxb))
            return fa | fb, mn, mx
        _, mn, mx = jax.lax.associative_scan(
            comb, (flags, lmin, lmax), reverse=reverse)
        return mn, mx

    def seg_argmin_scan(flags, cost):
        def comb(a, b):
            fa, ca, pa = a
            fb, cb, pb = b
            better = (cb < ca) | ((cb == ca) & (pb < pa))
            keep_b = fb | better
            return (fa | fb, jnp.where(keep_b, cb, ca),
                    jnp.where(keep_b, pb, pa))
        _, c, p = jax.lax.associative_scan(comb, (flags, cost, i_idx))
        return c, p

    def cond(st):
        seg_lo, seg_hi, *_ = st
        return jnp.logical_and(jnp.any(seg_hi > seg_lo), st[-1] < 96)

    def body(st):
        seg_lo, seg_hi, node_id, next_id, lch, rch, nlo, nhi, it = st
        length = seg_hi - seg_lo + 1
        active_pos = length > 1
        # segmented prefix/suffix box unions
        f_fwd = i_idx == seg_lo
        f_bwd = i_idx == seg_hi
        pmn, pmx = seg_box_scan(f_fwd, reverse=False)
        smn, smx = seg_box_scan(f_bwd, reverse=True)
        sa_pre = _half_area(pmn, pmx)                 # union seg_lo..i
        sa_suf = _half_area(smn, smx)                 # union i..seg_hi
        sa_next = jnp.concatenate([sa_suf[1:], jnp.zeros(1)])
        cnt_l = (i_idx - seg_lo + 1).astype(jnp.float32)
        cnt_r = (seg_hi - i_idx).astype(jnp.float32)
        cost = sa_pre * cnt_l + sa_next * cnt_r
        minside = jnp.maximum(1, length // 4)
        valid = (active_pos & (i_idx < seg_hi)
                 & (cnt_l >= minside) & (cnt_r >= minside))
        cost = jnp.where(valid, cost, inf)
        _, argp = seg_argmin_scan(f_fwd, cost)
        split = argp[seg_hi]                          # per-position

        # representative = segment's first position; allocate child ids
        rep = f_fwd & active_pos
        left_int = split > seg_lo                      # left range len>1
        right_int = seg_hi > split + 1
        contrib = jnp.where(rep,
                            left_int.astype(jnp.int32)
                            + right_int.astype(jnp.int32), 0)
        base = next_id + jnp.cumsum(contrib) - contrib
        lid = jnp.where(left_int, base, (l - 1) + seg_lo)
        rid = jnp.where(right_int,
                        base + left_int.astype(jnp.int32),
                        (l - 1) + seg_hi)
        # record the split at the segment's internal node
        m = jnp.where(rep, node_id, l - 1)             # l-1 drops
        lch = lch.at[m].set(jnp.where(rep, lid, 0), mode="drop")
        rch = rch.at[m].set(jnp.where(rep, rid, 0), mode="drop")
        nlo = nlo.at[m].set(jnp.where(rep, seg_lo, 0), mode="drop")
        nhi = nhi.at[m].set(jnp.where(rep, seg_hi, 0), mode="drop")

        # propagate new segment state to every position (gather the
        # representative's values via seg_lo)
        lid_all = lid[seg_lo]
        rid_all = rid[seg_lo]
        left = i_idx <= split
        seg_lo2 = jnp.where(active_pos,
                            jnp.where(left, seg_lo, split + 1), seg_lo)
        seg_hi2 = jnp.where(active_pos,
                            jnp.where(left, split, seg_hi), seg_hi)
        node2 = jnp.where(active_pos,
                          jnp.where(left, lid_all, rid_all), node_id)
        next_id2 = next_id + jnp.sum(contrib)
        return (seg_lo2, seg_hi2, node2, next_id2, lch, rch, nlo, nhi,
                it + 1)

    zi = jnp.zeros(l - 1, jnp.int32)
    st = (jnp.zeros(l, jnp.int32), jnp.full(l, l - 1, jnp.int32),
          jnp.zeros(l, jnp.int32), jnp.int32(1),
          zi, zi, zi, zi, jnp.int32(0))
    _, _, _, _, lch, rch, nlo, nhi, _ = jax.lax.while_loop(cond, body, st)
    return lch, rch, nlo, nhi


def _range_refit(lmin, lmax, lo, hi):
    """Internal-node AABBs as range-min/max over Morton-sorted leaf boxes.

    Every Karras internal covers the CONTIGUOUS sorted-leaf range
    [lo, hi], so its box is a range reduction — answered with two
    overlapping power-of-two windows from a sparse table (overlap-safe:
    min/max are idempotent).  One pyramid build (log2 T contiguous
    halving steps) + 4 gathers replaces the old fixed-point sweep whose
    traffic was O(T * tree_depth) random gathers per call (measured
    2.3 s at 1M tris; this path is one pass).

    Returns ((T-1, 3) bmin, bmax) for the internals, leaf-major ids."""
    l = lmin.shape[0]
    k_top = int(np.floor(np.log2(max(l, 2))))
    mins, maxs, offs = [lmin], [lmax], [0]
    for k in range(1, k_top + 1):
        h = 1 << (k - 1)
        prev_min, prev_max = mins[-1], maxs[-1]
        m = l - (1 << k) + 1
        if m <= 0:
            break
        offs.append(offs[-1] + prev_min.shape[0])
        mins.append(jnp.minimum(prev_min[:m], prev_min[h:h + m]))
        maxs.append(jnp.maximum(prev_max[:m], prev_max[h:h + m]))
    # one (rows, 6) table: the two window reads become 2 gathers
    # instead of 4 (descriptor count prices the gather, rule 36)
    flat6 = jnp.concatenate([jnp.concatenate(mins),
                             jnp.concatenate(maxs)], axis=1)
    off_arr = jnp.asarray(offs, jnp.int32)

    length = hi - lo + 1
    k = 31 - jax.lax.clz(length.astype(jnp.int32))   # floor(log2(len))
    base = off_arr[k]
    ia = base + lo
    ib = base + hi - (jnp.int32(1) << k) + 1
    wa_ = flat6[ia]
    wb_ = flat6[ib]
    bmin = jnp.minimum(wa_[:, 0:3], wb_[:, 0:3])
    bmax = jnp.maximum(wa_[:, 3:6], wb_[:, 3:6])
    return bmin, bmax


def _collapse_wide(lchild, rchild, lo, hi, l, max_leaf, width=4):
    """Subtree-cut + depth-stride collapse of the binary Karras tree.

    An internal node whose range covers <= ``max_leaf`` triangles is
    "leafish"; MAXIMAL leafish nodes (leafish with a non-leafish parent)
    become wide leaves — their triangle ranges are contiguous in Morton
    order, so every leaf is a cluster the radix tree itself chose
    (near-SAH leaf quality) instead of a fixed Morton 4-chunk.  Above
    the cut, internals at depth % log2(width) == 0 survive and adopt
    their depth-2 (width 4: grandchildren) or depth-3 (width 8:
    great-grandchildren) descendants, clipped at the cut.

    Returns (surv, ch_old, arity, base, newid, row_lo, row_cnt,
    leaf_newid) — see LBVHTopo."""
    assert width in (4, 8)
    n_nodes = 2 * l - 1
    i_idx = jnp.arange(l - 1, dtype=jnp.int32)
    parent = jnp.zeros(n_nodes, jnp.int32).at[lchild].set(i_idx)
    parent = parent.at[rchild].set(i_idx)

    size_int = hi - lo + 1
    leafish = size_int <= max_leaf          # (l-1,) internals only

    # top-down depth sweep over internal nodes (above-cut nodes form a
    # connected top component, so their depths are exact)
    depth = jnp.zeros(l - 1, jnp.int32)
    ready = (i_idx == 0)

    def body(c):
        depth, it, ready = c
        p = parent[: l - 1]
        can = ready[p] & ~ready & (i_idx != 0)
        depth = jnp.where(can, depth[p] + 1, depth)
        return depth, it + 1, ready | can

    depth, _, _ = jax.lax.while_loop(
        lambda c: jnp.logical_and(~c[2].all(), c[1] < 192), body,
        (depth, jnp.int32(0), ready))

    stride = 2 if width == 4 else 3
    surv = ~leafish & ((depth % stride) == 0)

    def is_lf(c):
        """Old id -> becomes a wide leaf (triangle leaf or cut subtree)."""
        return (c >= l - 1) | leafish[jnp.clip(c, 0, l - 2)]

    is_leaf_l = is_lf(lchild)
    is_leaf_r = is_lf(rchild)
    lc_s = jnp.clip(lchild, 0, l - 2)   # safe internal index
    rc_s = jnp.clip(rchild, 0, l - 2)
    a_left = jnp.where(is_leaf_l, 1, 2)
    a_right = jnp.where(is_leaf_r, 1, 2)
    arity4 = a_left + a_right

    left0 = jnp.where(is_leaf_l, lchild, lchild[lc_s])
    left1 = jnp.where(is_leaf_l, -1, rchild[lc_s])
    right0 = jnp.where(is_leaf_r, rchild, lchild[rc_s])
    right1 = jnp.where(is_leaf_r, -1, rchild[rc_s])

    def slot4(t):
        in_left = t < a_left
        li = jnp.where(t == 0, left0, left1)
        u = t - a_left
        ri = jnp.where(u == 0, right0, jnp.where(u == 1, right1, -1))
        return jnp.where(in_left, li, jnp.where(t < arity4, ri, -1))

    ch4 = jnp.stack([slot4(jnp.full(l - 1, t, jnp.int32))
                     for t in range(4)], axis=1)

    if width == 4:
        ch_old, arity = ch4, arity4
    else:
        # depth-3 expansion per node = concat over its two binary
        # children c of ([c] if c is a wide leaf else c's own depth-2
        # expansion ch4[c]); ch4 rows carry -1 beyond arity4, so a
        # bounded column select reads valid ids for every t < arity
        a_l8 = jnp.where(is_leaf_l, 1, arity4[lc_s])
        a_r8 = jnp.where(is_leaf_r, 1, arity4[rc_s])
        arity = a_l8 + a_r8
        ch4_l = ch4[lc_s]                       # (l-1, 4)
        ch4_r = ch4[rc_s]

        def sel4(m, t):
            tc = jnp.clip(t, 0, 3)
            r = m[:, 0]
            for i in (1, 2, 3):
                r = jnp.where(tc == i, m[:, i], r)
            return r

        def slot8(t):
            lt = jnp.where(is_leaf_l,
                           jnp.where(t == 0, lchild, -1),
                           sel4(ch4_l, t))
            u = t - a_l8
            rt = jnp.where(is_leaf_r,
                           jnp.where(u == 0, rchild, -1),
                           sel4(ch4_r, u))
            return jnp.where(t < a_l8, lt,
                             jnp.where(t < arity, rt, -1))

        ch_old = jnp.stack([slot8(jnp.full(l - 1, t, jnp.int32))
                            for t in range(8)], axis=1)

    # new ids: root = 0; survivor children get contiguous slots after an
    # exclusive prefix sum of survivor arities
    contrib = jnp.where(surv, arity, 0)
    base = 1 + jnp.cumsum(contrib) - contrib  # exclusive prefix + root slot

    newid = jnp.full(n_nodes, -1, jnp.int32).at[0].set(0)
    for t in range(width):
        idx = ch_old[:, t]
        val = base + t
        ok = surv & (idx >= 0)
        newid = newid.at[jnp.where(ok, idx, n_nodes)].set(
            jnp.where(ok, val, 0), mode="drop")

    # ---- leaf rows: one row per MAXIMAL leafish node, numbered by a
    # prefix sum in node-id order ----
    par_int = jnp.clip(parent[: l - 1], 0, l - 2)
    max_int = leafish & ~leafish[par_int]
    par_tri = jnp.clip(parent[l - 1:], 0, l - 2)
    max_tri = ~leafish[par_tri]            # tri leaf directly under cut
    is_max = jnp.concatenate([max_int, max_tri])          # (2l-1,)
    row_of = jnp.cumsum(is_max.astype(jnp.int32)) - 1     # id per maximal
    node_lo = jnp.concatenate([lo, jnp.arange(l, dtype=lo.dtype)])
    node_cnt = jnp.concatenate([size_int,
                                jnp.ones(l, size_int.dtype)])
    tgt = jnp.where(is_max, row_of, l)
    row_lo = jnp.zeros(l, jnp.int32).at[tgt].set(
        node_lo.astype(jnp.int32), mode="drop")
    row_cnt = jnp.zeros(l, jnp.int32).at[tgt].set(
        node_cnt.astype(jnp.int32), mode="drop")
    leaf_newid = jnp.full(l, -1, jnp.int32).at[tgt].set(newid, mode="drop")
    return surv, ch_old, arity, base, newid, row_lo, row_cnt, leaf_newid


def _f32bits(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)


def _pack_wide(topo: LBVHTopo, bmin, bmax, l, leaf_size,
               root_offset: int = 0, width: int = 4,
               pool_rows: int = 0, surv_idx=None, leaf_rows: int = 0):
    """Quantize + scatter wide records (old boxes -> new-id pool).

    Same e = ceil(log2(extent/255)) floor/ceil quantization rule as the
    reference (bvh.cpp:215-264) and the static packer (accel.qbvh).
    ``width`` selects the packed row layout (ops.traverse_wide
    _row_layout): 4-wide meta at word 14, 8-wide at word 22.

    ``pool_rows`` (static) sizes the output pool.  The default 2l-1
    reserves a slot per BINARY node, but the depth-stride collapse uses
    only ~1/4 (w=4) / ~1/7 (w=8) of them — ids are contiguous by
    construction (prefix sums), so a compact pool is a pure size cap.
    compact_sizes() computes the exact bound host-side; the per-frame
    refit then scatters into (and later gathers/fuses over) a pool
    several times smaller (VERDICT r4 #5).

    ``surv_idx`` ((S,) i32, -1 padded, from compact_plan) restricts the
    whole quantize chain to SURVIVOR internal nodes: only ~1/8 of the
    l-1 binary internals survive the width-8 collapse, and the gather /
    quantize / scatter chain is linear in the rows it runs over.
    ``leaf_rows`` (static) likewise slices the leaf-record scatter to
    the used contiguous prefix.  Both are bit-identical to the full
    chain (survivor records land at the same new ids; non-survivors
    were never scattered)."""
    w = width
    lb = _LEFT_BITS if w == 4 else 25
    qoff, hoff = 6, 6 + w
    moff, loff = 6 + 2 * w, 6 + 2 * w + 1
    n_nodes = pool_rows if pool_rows else 2 * l - 1
    if surv_idx is not None:
        si = jnp.clip(surv_idx, 0, l - 2)
        pad_row = surv_idx < 0
        surv = jnp.where(pad_row, False, topo.surv[si])
        ch_old = jnp.where(pad_row[:, None], -1, topo.ch_old[si])
        arity = topo.arity[si]
        base = topo.base[si]
        sid_rows = topo.newid[si]
    else:
        surv, ch_old, arity, base = (topo.surv, topo.ch_old, topo.arity,
                                     topo.base)
        sid_rows = topo.newid[: l - 1]
    # ch_old ids live in the BINARY box space (2l-1 rows of bmin/bmax),
    # independent of the (possibly compact) output pool size.  One
    # (2l-1, 6) row gather instead of two (2l-1, 3) (rule 36)
    ch_s = jnp.clip(ch_old, 0, 2 * l - 2)
    cbox = jnp.concatenate([bmin, bmax], axis=1)[ch_s]   # (S, w, 6)
    cmin = cbox[..., 0:3]
    cmax = cbox[..., 3:6]
    present = (ch_old >= 0)[..., None]
    org = jnp.where(present, cmin, jnp.inf).min(1)
    top = jnp.where(present, cmax, -jnp.inf).max(1)
    extent = jnp.maximum(top - org, 1e-30)
    e = jnp.clip(jnp.ceil(jnp.log2(extent / 255.0)), -126, 127)
    scale = jnp.exp2(e).astype(jnp.float32)

    def qpack(b, lo_side):
        q = (b - org[:, None, :]) / scale[:, None, :]
        # expand every box one quantization LSB outward: a ray with a
        # zero direction component lying EXACTLY on a child boundary
        # otherwise computes slab tmax = 0 through the eps-reciprocal
        # and culls the child (v2's subtree splits land exactly on
        # octant planes, so axis rays hit this; measured total-miss on
        # the uv_sphere axis test).  Conservative bounding never changes
        # the closest hit — only ~1.6% more box area
        q = jnp.floor(q) - 1 if lo_side else jnp.ceil(q) + 1
        q = jnp.clip(q, 0, 255).astype(jnp.uint32)
        return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)

    rec = jnp.zeros((n_nodes, 32), jnp.uint32)
    # survivor internal records, scattered at their new ids
    srec = jnp.zeros((surv.shape[0], 32), jnp.uint32)
    srec = srec.at[:, 0].set(_f32bits(org[:, 0]))
    srec = srec.at[:, 1].set(_f32bits(org[:, 1]))
    srec = srec.at[:, 2].set(_f32bits(org[:, 2]))
    srec = srec.at[:, 3].set(_f32bits(scale[:, 0]))
    srec = srec.at[:, 4].set(_f32bits(scale[:, 1]))
    srec = srec.at[:, 5].set(_f32bits(scale[:, 2]))
    qlo = qpack(cmin, True)
    qhi = qpack(cmax, False)
    for c in range(w):
        srec = srec.at[:, qoff + c].set(jnp.where(ch_old[:, c] >= 0,
                                                  qlo[:, c], 0))
        srec = srec.at[:, hoff + c].set(jnp.where(ch_old[:, c] >= 0,
                                                  qhi[:, c], 0))
    # left_first in the merged pool (root_offset = 1 when a TLAS root
    # record is prepended, 0 for the flat single-tree layout)
    merged_left = (base + root_offset).astype(jnp.uint32)
    srec = srec.at[:, moff].set(
        merged_left | (arity.astype(jnp.uint32) << lb)
        | (jnp.uint32(KIND_INTERNAL) << 29))
    rec = rec.at[jnp.where(surv, sid_rows, n_nodes)].set(
        jnp.where(surv[:, None], srec, 0), mode="drop")

    # leaf records (one per cut-subtree row) at their new ids; used rows
    # are the contiguous prefix (row ids are a prefix sum), so a static
    # ``leaf_rows`` cap is exact
    lr = leaf_rows if leaf_rows else l
    leaf_first = jnp.arange(lr, dtype=jnp.uint32)
    lrec = jnp.zeros((lr, 32), jnp.uint32)
    lrec = lrec.at[:, moff].set(
        leaf_first | (jnp.uint32(1) << lb)
        | (jnp.uint32(KIND_TRIS) << 29))
    lrec = lrec.at[:, loff].set(topo.row_cnt[:lr].astype(jnp.uint32))
    lid = topo.leaf_newid[:lr]
    used = lid >= 0
    rec = rec.at[jnp.where(used, lid, n_nodes)].set(
        jnp.where(used[:, None], lrec, 0), mode="drop")
    return rec


def _leaf_rows(v0, v1, v2, order, row_lo, row_cnt, l, leaf_size=4,
               n_rows: int = 0):
    """(l, 16*leaf_size) packed leaf rows: row j holds the ``row_cnt[j]``
    triangles at sorted slots row_lo[j].. (contiguous Morton range of one
    cut subtree); empty slots are zero-area degenerates (never hit).

    ``n_rows`` (static) caps the table to the rows actually used (row
    ids are a prefix sum over maximal cut nodes, so used rows are the
    contiguous prefix): the slot gathers and the output table shrink
    ~3x at leaf_size 4 (compact_sizes)."""
    if n_rows:
        l = n_rows
        row_lo = row_lo[:n_rows]
        row_cnt = row_cnt[:n_rows]
    t = v0.shape[0]
    k = jnp.arange(leaf_size, dtype=jnp.int32)
    idx = jnp.clip(row_lo[:, None] + k[None, :], 0, t - 1)
    tid = order[idx]                            # (l, leaf_size) global ids
    valid = k[None, :] < row_cnt[:, None]
    # ONE (T, 9) row gather instead of three (T, 3) gathers: gathers
    # cost per DESCRIPTOR, not per byte (ARCHITECTURE rule 36 — one
    # (T,3) row gather beats three (T,) streams 1.7x), and the slot
    # gather runs over l*leaf_size rows — the refit's biggest stream
    v9 = jnp.concatenate([v0, v1, v2], axis=1)[tid]     # (l, L, 9)
    sv0 = v9[..., 0:3]
    se1 = v9[..., 3:6] - sv0
    se2 = v9[..., 6:9] - sv0
    zero = ~valid[..., None]
    sv0 = jnp.where(zero, 0.0, sv0)
    se1 = jnp.where(zero, 0.0, se1)
    se2 = jnp.where(zero, 0.0, se2)
    tids = jax.lax.bitcast_convert_type(
        jnp.where(valid, tid, -1), jnp.float32)
    rows = jnp.zeros((l, 16 * leaf_size), jnp.float32)
    for c in range(leaf_size):
        rows = rows.at[:, 16 * c: 16 * c + 3].set(sv0[:, c])
        rows = rows.at[:, 16 * c + 3: 16 * c + 6].set(se1[:, c])
        rows = rows.at[:, 16 * c + 6: 16 * c + 9].set(se2[:, c])
        rows = rows.at[:, 16 * c + 9].set(tids[:, c])
    return rows


def _tlas_root():
    tlas = jnp.zeros((1, 32), jnp.uint32)
    tlas = tlas.at[0, 14].set(jnp.uint32(0)
                              | (jnp.uint32(KIND_INSTANCE) << 29))
    eye = jnp.asarray(
        np.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], np.float32)
        .view(np.uint32))
    tlas = tlas.at[0, 16:28].set(eye)
    tlas = tlas.at[0, 28].set(jnp.uint32(1))
    return tlas


def _leaf_boxes(v0, v1, v2, order):
    """Per-TRIANGLE boxes in sorted order (the Karras leaves).  One
    (T, 6) row gather instead of two (T, 3) — descriptor count, not
    bytes, prices the gather (rule 36)."""
    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    box6 = jnp.concatenate([tmin, tmax], axis=1)[order]
    return box6[:, 0:3], box6[:, 3:6]


@partial(jax.jit, static_argnames=("leaf_size", "method", "width"))
def build_lbvh_topo(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
                    leaf_size: int = 4, method: str = "karras",
                    width: int = 4):
    """Device BVH build -> (LBVHNodes, LBVHTopo).  ``leaf_size`` is the
    MAXIMUM triangles per wide leaf (subtree-cut leaves are 1..leaf_size
    contiguous Morton slots).

    ``method``: 'karras' (default) is the v2 radix-median tree;
    'sah' splits every contiguous Morton range at its sweep-SAH-minimal
    position instead (_sah_sweep_tree).  Measured on the 100k wavy
    grid: karras is already 1.10x host-SAH packet-steps after v2's
    subtree-cut leaves, and the sweep-SAH variant lands WORSE (1.17x —
    the middle-half split window plus greedy SAH over the Morton order
    does not beat the radix median), so karras stays the default and
    'sah' remains as the measured alternative."""
    t = v0.shape[0]
    l = t  # triangle-granular Karras leaves
    assert l > leaf_size, "scene smaller than one leaf"

    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    cen = (v0 + v1 + v2) / 3.0
    smin = tmin.min(0)
    smax = tmax.max(0)
    ext = jnp.maximum(smax - smin, 1e-30)
    n = (cen - smin) / ext
    codes = morton3d(n[:, 0], n[:, 1], n[:, 2])
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)

    if method == "sah":
        lmin_s, lmax_s = _leaf_boxes(v0, v1, v2, order)
        lchild, rchild, lo, hi = _sah_sweep_tree(lmin_s, lmax_s, l)
    else:
        lcodes = codes[order]
        lchild, rchild, lo, hi = _karras(lcodes, l)
    (surv, ch_old, arity, base, newid, row_lo, row_cnt,
     leaf_newid) = _collapse_wide(lchild, rchild, lo, hi, l, leaf_size,
                                  width=width)
    topo = LBVHTopo(order=order, lchild=lchild, rchild=rchild, surv=surv,
                    ch_old=ch_old, arity=arity, base=base, newid=newid,
                    row_lo=row_lo, row_cnt=row_cnt, leaf_newid=leaf_newid,
                    lo=lo, hi=hi)
    return refit_lbvh(topo, v0, v1, v2, leaf_size=leaf_size,
                      width=width), topo


def compact_sizes(topo: LBVHTopo, pad: int = 256):
    """Host-side exact pool bounds for the compact refit path.

    Returns (pool_rows, leaf_rows): the wide-node pool slots and leaf
    rows the collapse actually assigned (both id spaces are contiguous
    prefix sums).  Padded up to ``pad`` so minor topology changes
    rebucket rarely.  One D2H sync per topology build (not per frame)."""
    pool = max(int(jnp.max(topo.newid)), int(jnp.max(topo.leaf_newid))) + 1
    rows = int(jnp.sum((topo.row_cnt > 0).astype(jnp.int32)))
    up = lambda v: ((v + pad - 1) // pad) * pad
    return up(pool), up(max(rows, 1))


def compact_plan(topo: LBVHTopo, pad: int = 256):
    """compact_sizes + the survivor index list for the fully compacted
    per-frame repack: (pool_rows, leaf_rows, surv_idx) where surv_idx
    is a device (S,) i32 array of the ~l/8 (width 8) binary internals
    that survive the collapse, -1 padded to a ``pad`` multiple.  Built
    once per topology (host sync), reused every refit frame."""
    pool_rows, leaf_rows = compact_sizes(topo, pad=pad)
    ids = np.where(np.asarray(topo.surv))[0].astype(np.int32)
    n = ((len(ids) + pad - 1) // pad) * pad
    out = np.full(max(n, pad), -1, np.int32)
    out[: len(ids)] = ids
    return pool_rows, leaf_rows, jnp.asarray(out)


@partial(jax.jit, static_argnames=("leaf_size", "tlas", "width",
                                   "pool_rows", "leaf_rows"))
def refit_lbvh(topo: LBVHTopo, v0, v1, v2, leaf_size: int = 4,
               tlas: bool = False, width: int = 4,
               pool_rows: int = 0, leaf_rows: int = 0,
               surv_idx=None) -> LBVHNodes:
    """Refit-only fast path: keep the topology, recompute boxes +
    requantize + repack.  No argsort, no Karras searches — the per-frame
    animation update (BASELINE config 5; the reference has no analog,
    its BVH is rebuilt on the host).

    ``tlas=False`` (default) emits the flat single-tree layout (no
    identity-instance root: packet loops then skip the instance branch
    and drop the local-space lanes); ``tlas=True`` keeps the legacy
    1-node TLAS wrapper.

    ``pool_rows``/``leaf_rows`` (static, from compact_sizes): emit the
    COMPACT pools instead of the worst-case 2T-1 / T tables — at 1M
    tris the default pool is ~7x the used slots (width 8), and every
    downstream consumer (scatter memset, leaf-slot gathers, the fuse
    gather, traversal's clamp bounds) pays for the padding."""
    t = v0.shape[0]
    l = t  # triangle-granular leaves
    lmin, lmax = _leaf_boxes(v0, v1, v2, topo.order)
    imin, imax = _range_refit(lmin, lmax, topo.lo, topo.hi)
    # old-id layout expected by _pack_wide: internals 0..l-2, leaves after
    bmin = jnp.concatenate([imin, lmin])
    bmax = jnp.concatenate([imax, lmax])
    assert not (tlas and width != 4), "TLAS wrapper is 4-wide only"
    blas = _pack_wide(topo, bmin, bmax, l, leaf_size,
                      root_offset=1 if tlas else 0, width=width,
                      pool_rows=pool_rows, surv_idx=surv_idx,
                      leaf_rows=leaf_rows)
    nodes = jnp.concatenate([_tlas_root(), blas]) if tlas else blas
    rows = _leaf_rows(v0, v1, v2, topo.order, topo.row_lo, topo.row_cnt, l,
                      leaf_size=leaf_size, n_rows=leaf_rows)
    return LBVHNodes(nodes=nodes, tri_rows=rows,
                     num_leaves=(topo.row_cnt > 0).sum())


@partial(jax.jit, static_argnames=("leaf_size", "width"))
def build_lbvh(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
               leaf_size: int = 4, width: int = 4) -> LBVHNodes:
    """Device BVH build over triangles (T, 3)x3 -> packed wide pool."""
    lb, _ = build_lbvh_topo(v0, v1, v2, leaf_size=leaf_size, width=width)
    return lb


def wide_arrays_from_lbvh(lb: LBVHNodes, leaf_size: int = 4,
                          tlas: bool = False, width: int = 4):
    """Wrap a device-built LBVH as a traversal-ready WideArrays (the
    dynamic-scene path of the framework).  ``tlas`` must match the
    build/refit call; the default flat layout reports tri ids directly
    (single implicit instance 0: tri_bits unpacking is the identity
    because the inst field is zero)."""
    import numpy as np

    from vortex_rt_tpu.ops.traverse_wide import WideArrays

    t = int(lb.tri_rows.shape[0])
    return WideArrays(
        nodes=lb.nodes,
        tri_rows=lb.tri_rows,
        num_tlas=1 if tlas else 0,
        tri_bits=0 if tlas else max(
            int(np.ceil(np.log2(max(t * leaf_size, 2)))), 1),
        max_leaf_tris=leaf_size,
        # binary Karras depth is bounded by the augmented-key prefix
        # length (delta <= 32 + 26 for l < 2^26 leaves); the depth-stride
        # collapse divides it by 2 (width 4) or 3 (width 8).  The bound
        # feeds the packet engine's stack size, so tighter = smaller
        # shift registers = faster compiles and steps
        depth=32 if width == 4 else 22,
        width=width,
    )


def tree_surface_area(nodes, width: int = 4) -> float:
    """Total dequantized child-AABB surface area of a packed node pool —
    the SAH-cost proxy used for refit staleness: a refit tree's boxes
    stay tight per node but the TOPOLOGY decays as geometry drifts from
    the Morton clustering it was built for, which shows up as growing
    overlap = growing summed area (host-side diagnostic)."""
    n = np.asarray(nodes)
    origin = n[:, 0:3].view(np.float32)
    scale = n[:, 3:6].view(np.float32)
    lb = _LEFT_BITS if width == 4 else 25
    meta = n[:, 6 + 2 * width]
    nch = (meta >> lb) & (7 if width == 4 else 15)
    total = 0.0
    for c in range(width):
        ql = n[:, 6 + c]
        qh = n[:, 6 + width + c]
        lo = np.stack([(ql >> s) & 255 for s in (0, 8, 16)], -1)
        hi = np.stack([(qh >> s) & 255 for s in (0, 8, 16)], -1)
        ext = np.maximum((hi - lo) * scale, 0.0)
        area = 2.0 * (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
                      + ext[:, 0] * ext[:, 2])
        total += float(area[np.asarray(nch) > c].sum())
    _ = origin
    return total


def refit_staleness(topo: LBVHTopo, v0, v1, v2,
                    leaf_size: int = 4) -> float:
    """Refit-quality ratio >= 1.0: summed node area of the REFIT tree on
    the current geometry vs a FRESH rebuild.  ~1.0 while the motion
    preserves Morton clustering; callers should rebuild the topology
    when it exceeds ~1.5 (the config-5 rebuild threshold)."""
    refit = refit_lbvh(topo, v0, v1, v2, leaf_size=leaf_size)
    fresh = build_lbvh(v0, v1, v2, leaf_size=leaf_size)
    a_fresh = tree_surface_area(fresh.nodes)
    return tree_surface_area(refit.nodes) / max(a_fresh, 1e-30)


def build_wide_from_tris(sb, leaf_size: int = 4, width: int = 4):
    """Scene -> traversal-ready WideArrays via the ON-DEVICE LBVH build
    (BASELINE config 3: "on-device LBVH build").  Valid for single-
    identity-instance scenes (the LBVH path builds in triangle space);
    multi-instance scenes use the host SAH + collapse builder."""
    assert sb.inst_transform.shape[0] == 1 and np.allclose(
        sb.inst_transform[0], np.eye(4)), \
        "LBVH direct build needs a single identity instance"
    v0, v1, v2 = pad_tris(sb.v0, sb.v1, sb.v2, leaf_size)
    lb = build_lbvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                    leaf_size=leaf_size, width=width)
    return wide_arrays_from_lbvh(lb, leaf_size, width=width)


def pad_tris(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
             leaf_size: int = 4):
    """Pad the triangle soup to a leaf_size multiple with degenerate
    copies of the last triangle's first vertex (zero-area: never hit)."""
    t = v0.shape[0]
    pad = (-t) % leaf_size
    if pad == 0:
        return v0, v1, v2
    p = np.repeat(v0[-1:], pad, axis=0)
    return (np.concatenate([v0, p]), np.concatenate([v1, p]),
            np.concatenate([v2, p]))
