"""Packet traversal: one shared node walk per coherent ray packet.

The per-ray engine (ops.traverse_wide) is bound by per-ray record
gathers + column extraction (~1.9 ms per step over a 65536-ray pool, see
docs/ARCHITECTURE.md).  This engine removes that cost with the classic
SIMD packet transform (Wald-style ray packets, re-shaped for the TPU):

* rays are grouped into packets of P (consecutive pool lanes — pixel-major
  order makes primary packets spatially coherent);
* ONE traversal state per packet: node / level / restart trail / short
  stack are (B,) lanes (B = R/P packets), so the node record gather runs
  over B rows instead of R — at B = R/64 the gather+extract cost collapses
  to noise and per-field values broadcast to (B, 1) against (B, P) ray
  lanes for the vector tests;
* a child is visited iff ANY live ray in the packet hits its slab
  strictly closer than that ray's own best hit.  This per-ray-pruned
  visit set is time-varying, which is UNSOUND combined with trail
  restarts (the trail counts "k closest visited" against an order that
  would have shifted by the revisit).  Restarts only happen on short-
  stack overflow — so the per-packet stack is statically sized to the
  worst case (3 pushes per level x tree depth), overflow cannot occur,
  every node is entered exactly once, and pruning is sound.  Packet
  state is (B,) lanes, so a deep stack costs almost nothing;
* leaves run Moller-Trumbore for every ray in the packet against the
  leaf's triangles (same packed leaf rows as the per-ray engine).

The cost trade: the packet walks the UNION of its rays' paths (coherent
primary packets visit ~1.2-2x the nodes of one ray; incoherent bounce
packets more), but every step's memory traffic is divided by P.  Results
are bit-compatible with the per-ray engine's auto-accept mode (same
intersection math, same lexicographic (t, instance, tri) tie-break).

Any-hit suspension is NOT supported here (packets cannot pause per-ray);
the wavefront engine uses this path only when no any-hit shader is bound,
which matches the reference's shipped pipeline (always-accept any-hit).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vortex_rt_tpu.accel import qbvh
from vortex_rt_tpu.ops.traverse2 import Hits
from vortex_rt_tpu.ops.traverse_wide import (
    ID_MASK, LAST_FLAG, WIDTH, WideArrays, _INT_MAX, _LEFT_BITS, _LEFT_MASK,
    _MISS, _at_pos, _bitcast_f32, _bitcast_i32, _rcp_lane,
    trail_clear_above, trail_find_parent, trail_get, trail_set,
)


def _stack_push_n(st, count, entry, mask):
    """Shift-register push over an n-tuple of (B,) lanes."""
    ns = [jnp.where(mask, entry, st[0])]
    for i in range(1, len(st)):
        ns.append(jnp.where(mask, st[i - 1], st[i]))
    return tuple(ns), jnp.where(mask, count + 1, count)


def _stack_pop_n(st, count, mask):
    entry = st[0]
    ns = []
    for i in range(len(st) - 1):
        ns.append(jnp.where(mask, st[i + 1], st[i]))
    ns.append(jnp.where(mask, jnp.zeros_like(st[-1]), st[-1]))
    return entry, tuple(ns), jnp.where(mask, count - 1, count)
from vortex_rt_tpu.utils.config import LARGE_FLOAT, MT_EPSILON


class PacketStats(NamedTuple):
    """RTU PerfStats analog (sim/simx/rt_unit.h:15-45 latency/SIMT
    accounting, dormant in the reference): per-trace divergence and
    occupancy aggregates, all cheap scalar reductions carried in the
    traversal loop (enable with ``stats=True``).

    occupancy  = packet_steps / (steps * B): fraction of packets still
                 walking per iteration (persistent-lane headroom metric)
    lane_util  = lane-steps in live packets / packet-steps / P would need
                 per-ray liveness; we report live-packet lane counts
                 (rays that can still improve their hit) as ray_steps
    kind mix   = how many packet-steps landed on internal / triangle /
                 instance nodes (memory-shape of the walk)
    """

    steps: jnp.ndarray          # loop iterations
    packet_steps: jnp.ndarray   # sum over steps of live packets
    ray_steps: jnp.ndarray      # sum over steps of live rays in live packets
    int_steps: jnp.ndarray      # packet-steps at internal nodes
    tri_steps: jnp.ndarray      # packet-steps at triangle leaves
    ins_steps: jnp.ndarray      # packet-steps at instance leaves


def trace_packets(
    wa: WideArrays,
    o: jnp.ndarray,
    d: jnp.ndarray,
    packet: int = 64,
    active: Optional[jnp.ndarray] = None,
    max_steps: int = 400_000,
    t_max: Optional[jnp.ndarray] = None,
    occlusion: bool = False,
    stats: bool = False,
) -> Tuple[Hits, jnp.ndarray]:
    """Closest-hit trace of (R, 3) rays in packets of ``packet`` lanes.

    R must be a multiple of ``packet``.  ``active`` masks dead pool lanes
    (their results stay at miss).  Returns (Hits, total steps).

    ``t_max`` (R,) clamps each ray's search interval.  ``occlusion=True``
    turns the trace into a bounded any-hit occlusion query (the shadow-ray
    mode, rt_unit.cpp:190-213 ACCEPT-and-stop semantics): the FIRST hit
    with t < t_max retires the ray (no closest-hit search), occluded rays
    stop contributing to the packet's visit union, and a packet whose live
    rays are all occluded exits.  Occluded rays return dist=0.0 (< t_max);
    unoccluded rays return dist=LARGE_FLOAT.  Barycentrics/tri ids are
    meaningless in this mode.

    ``stats=True`` additionally carries PacketStats scalar aggregates in
    the loop and returns (Hits, PacketStats) instead of (Hits, steps)."""
    r = o.shape[0]
    p = int(packet)
    assert r % p == 0, "ray count must be a multiple of the packet size"
    b = r // p
    n_pool = int(wa.nodes.shape[0])
    n_leaf_rows = int(wa.tri_rows.shape[0])
    lmax = max(int(wa.max_leaf_tris), 1)
    eps = jnp.float32(MT_EPSILON)
    # overflow-proof stack: up to WIDTH-1 pushes per descended level
    stack_n = (WIDTH - 1) * (int(wa.depth) + 2) + 4

    def l2(x):  # (R,) -> (B, P)
        return x.reshape(b, p)

    ox, oy, oz = l2(o[:, 0]), l2(o[:, 1]), l2(o[:, 2])
    dx, dy, dz = l2(d[:, 0]), l2(d[:, 1]), l2(d[:, 2])
    ivx, ivy, ivz = _rcp_lane(dx), _rcp_lane(dy), _rcp_lane(dz)
    ray_on = (jnp.ones((b, p), bool) if active is None
              else l2(active))
    limit = (jnp.full((b, p), LARGE_FLOAT) if t_max is None
             else l2(t_max.astype(jnp.float32)))

    zi = jnp.zeros(b, jnp.int32)
    zu = jnp.zeros(b, jnp.uint32)
    state = dict(
        node=zi, level=zi,
        trail=(zu,) * 8,
        stack=(zi,) * stack_n, scount=zi,
        inst=zi,
        lox=ox, loy=oy, loz=oz, ldx=dx, ldy=dy, ldz=dz,
        lix=ivx, liy=ivy, liz=ivz,
        best_t=jnp.where(ray_on, limit, -1.0),
        bx=jnp.zeros((b, p), jnp.float32),
        by=jnp.zeros((b, p), jnp.float32),
        tri=jnp.zeros((b, p), jnp.int32),
        best_inst=jnp.zeros((b, p), jnp.int32),
        done=~jnp.any(ray_on, axis=1),
        steps=jnp.int32(0),
    )
    if stats:
        state.update(packet_steps=jnp.int32(0), ray_steps=jnp.int32(0),
                     int_steps=jnp.int32(0), tri_steps=jnp.int32(0),
                     ins_steps=jnp.int32(0))
    keys = list(state.keys())

    def cond(sl):
        s = dict(zip(keys, sl))
        return jnp.logical_and(jnp.any(~s["done"]), s["steps"] < max_steps)

    def body(sl):
        s = dict(zip(keys, sl))
        act = ~s["done"]
        node = jnp.clip(s["node"], 0, n_pool - 1)
        rowt = wa.nodes[node].T                 # (32, B): tiny gather
        meta = rowt[14]
        kind = (meta >> 29).astype(jnp.int32)
        nch = ((meta >> _LEFT_BITS) & 7).astype(jnp.int32)
        left = (meta & _LEFT_MASK).astype(jnp.int32)
        leaf_data = _bitcast_i32(rowt[15])
        is_int = act & (kind == qbvh.KIND_INTERNAL)
        is_tri = act & (kind == qbvh.KIND_TRIS)
        is_ins = act & (kind == qbvh.KIND_INSTANCE)
        in_tlas = (node < wa.num_tlas)[:, None]
        trail, stack, scount = s["trail"], s["stack"], s["scount"]

        rox = jnp.where(in_tlas, ox, s["lox"])
        roy = jnp.where(in_tlas, oy, s["loy"])
        roz = jnp.where(in_tlas, oz, s["loz"])
        rix = jnp.where(in_tlas, ivx, s["lix"])
        riy = jnp.where(in_tlas, ivy, s["liy"])
        riz = jnp.where(in_tlas, ivz, s["liz"])

        # ---- internal: packet-vs-children slab tests ----
        gx, gy, gz = (_bitcast_f32(rowt[0])[:, None],
                      _bitcast_f32(rowt[1])[:, None],
                      _bitcast_f32(rowt[2])[:, None])
        sx, sy, sz = (_bitcast_f32(rowt[3])[:, None],
                      _bitcast_f32(rowt[4])[:, None],
                      _bitcast_f32(rowt[5])[:, None])
        dists, idxs = [], []
        for c in range(WIDTH):
            ql = rowt[6 + c][:, None]
            qh = rowt[10 + c][:, None]
            lx = gx + (ql & 255).astype(jnp.float32) * sx
            ly = gy + ((ql >> 8) & 255).astype(jnp.float32) * sy
            lz = gz + ((ql >> 16) & 255).astype(jnp.float32) * sz
            hx = gx + (qh & 255).astype(jnp.float32) * sx
            hy = gy + ((qh >> 8) & 255).astype(jnp.float32) * sy
            hz = gz + ((qh >> 16) & 255).astype(jnp.float32) * sz
            t1x = (lx - rox) * rix; t2x = (hx - rox) * rix
            t1y = (ly - roy) * riy; t2y = (hy - roy) * riy
            t1z = (lz - roz) * riz; t2z = (hz - roz) * riz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z))
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z))
            # per-ray prune is sound here because the overflow-proof
            # stack guarantees no trail restarts (see module docstring)
            hc = ((tmax >= tmin) & (tmax > 0.0) & (tmin < s["best_t"])
                  & ray_on)
            any_hit = jnp.any(hc, axis=1) & (c < nch)
            pd = jnp.min(jnp.where(hc, tmin, LARGE_FLOAT), axis=1)
            dists.append(jnp.where(any_hit, pd, _MISS))
            idxs.append(jnp.full(b, c, jnp.int32))
        m = sum((dd > _MISS).astype(jnp.int32) for dd in dists)

        # far -> near by packet-min entry distance (desc sorting network)
        for a_i, b_i in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            swap = dists[a_i] < dists[b_i]
            da, db = dists[a_i], dists[b_i]
            ia, ib = idxs[a_i], idxs[b_i]
            dists[a_i] = jnp.where(swap, db, da)
            dists[b_i] = jnp.where(swap, da, db)
            idxs[a_i] = jnp.where(swap, ib, ia)
            idxs[b_i] = jnp.where(swap, ia, ib)

        k_tr = trail_get(trail, s["level"])
        drop = jnp.where(k_tr == WIDTH, jnp.maximum(m - 1, 0),
                         jnp.minimum(k_tr, m))
        remaining = m - drop
        pos_closest = m - 1 - drop
        descend = is_int & (remaining >= 1)
        want_pop_int = is_int & (remaining < 1)
        child_slot = _at_pos(idxs, pos_closest)
        next_int = left + child_slot
        push_entries = [
            (descend & (pos_closest >= 1), (left + idxs[0]) | LAST_FLAG),
            (descend & (pos_closest >= 2), left + idxs[1]),
            (descend & (pos_closest >= 3), left + idxs[2]),
        ]
        for pm, pe in push_entries:
            stack, scount = _stack_push_n(stack, scount, pe, pm)
        trail = trail_set(trail, s["level"], jnp.full(b, WIDTH, jnp.int32),
                          descend & (remaining == 1))

        # ---- instance leaf: whole packet swaps into object space ----
        mm = [_bitcast_f32(rowt[16 + k])[:, None] for k in range(12)]
        nlox = mm[0] * ox + mm[1] * oy + mm[2] * oz + mm[3]
        nloy = mm[4] * ox + mm[5] * oy + mm[6] * oz + mm[7]
        nloz = mm[8] * ox + mm[9] * oy + mm[10] * oz + mm[11]
        nldx = mm[0] * dx + mm[1] * dy + mm[2] * dz
        nldy = mm[4] * dx + mm[5] * dy + mm[6] * dz
        nldz = mm[8] * dx + mm[9] * dy + mm[10] * dz
        em = is_ins[:, None]
        inst = jnp.where(is_ins, left, s["inst"])
        lox = jnp.where(em, nlox, s["lox"])
        loy = jnp.where(em, nloy, s["loy"])
        loz = jnp.where(em, nloz, s["loz"])
        ldx_ = jnp.where(em, nldx, s["ldx"])
        ldy_ = jnp.where(em, nldy, s["ldy"])
        ldz_ = jnp.where(em, nldz, s["ldz"])
        lix = jnp.where(em, _rcp_lane(nldx), s["lix"])
        liy = jnp.where(em, _rcp_lane(nldy), s["liy"])
        liz = jnp.where(em, _rcp_lane(nldz), s["liz"])
        next_ins = _bitcast_i32(rowt[28])

        # ---- triangle leaf: every ray vs the leaf's triangles ----
        lrowt = wa.tri_rows[jnp.clip(left, 0, n_leaf_rows - 1)].T  # (C, B)
        cnt = leaf_data
        t_min = jnp.full((b, p), LARGE_FLOAT)
        tid_sel = jnp.full((b, p), _INT_MAX)
        w1_sel = jnp.zeros((b, p), jnp.float32)
        w2_sel = jnp.zeros((b, p), jnp.float32)
        for c in range(lmax):
            b0 = 16 * c
            v0x, v0y, v0z = (lrowt[b0][:, None], lrowt[b0 + 1][:, None],
                             lrowt[b0 + 2][:, None])
            e1x, e1y, e1z = (lrowt[b0 + 3][:, None], lrowt[b0 + 4][:, None],
                             lrowt[b0 + 5][:, None])
            e2x, e2y, e2z = (lrowt[b0 + 6][:, None], lrowt[b0 + 7][:, None],
                             lrowt[b0 + 8][:, None])
            tid = _bitcast_i32(lrowt[b0 + 9])[:, None]
            hx_ = ldy_ * e2z - ldz_ * e2y
            hy_ = ldz_ * e2x - ldx_ * e2z
            hz_ = ldx_ * e2y - ldy_ * e2x
            a = e1x * hx_ + e1y * hy_ + e1z * hz_
            fba = 1.0 / jnp.where(jnp.abs(a) < eps, 1.0, a)
            sx_ = lox - v0x; sy_ = loy - v0y; sz_ = loz - v0z
            w1 = fba * (sx_ * hx_ + sy_ * hy_ + sz_ * hz_)
            qx = sy_ * e1z - sz_ * e1y
            qy = sz_ * e1x - sx_ * e1z
            qz = sx_ * e1y - sy_ * e1x
            w2 = fba * (ldx_ * qx + ldy_ * qy + ldz_ * qz)
            t = fba * (e2x * qx + e2y * qy + e2z * qz)
            ok = ((jnp.abs(a) >= eps) & (w1 >= 0.0) & (w1 <= 1.0)
                  & (w2 >= 0.0) & (w1 + w2 <= 1.0) & (t > eps)
                  & (c < cnt)[:, None] & is_tri[:, None] & ray_on)
            t = jnp.where(ok, t, LARGE_FLOAT)
            tid_b = jnp.broadcast_to(tid, (b, p))
            better = (t < t_min) | ((t == t_min) & (t < LARGE_FLOAT)
                                    & (tid_b < tid_sel))
            t_min = jnp.where(better, t, t_min)
            tid_sel = jnp.where(better, tid_b, tid_sel)
            w1_sel = jnp.where(better, w1, w1_sel)
            w2_sel = jnp.where(better, w2, w2_sel)

        inst_b = jnp.broadcast_to(inst[:, None], (b, p))
        if occlusion:
            # any hit inside the clamp retires the ray: best_t <- -1 kills
            # its slab tests, so it stops widening the packet union
            occ_new = is_tri[:, None] & (t_min < s["best_t"]) & ray_on
            best_t = jnp.where(occ_new, -1.0, s["best_t"])
            bx, by = s["bx"], s["by"]
            tri, best_inst = s["tri"], s["best_inst"]
        else:
            closer = is_tri[:, None] & (t_min < s["best_t"])
            tie = (is_tri[:, None] & (t_min == s["best_t"])
                   & (t_min < LARGE_FLOAT))
            tie_better = tie & ((inst_b < s["best_inst"])
                                | ((inst_b == s["best_inst"])
                                   & (tid_sel < s["tri"])))
            upd = closer | tie_better
            best_t = jnp.where(upd, t_min, s["best_t"])
            bx = jnp.where(upd, w1_sel, s["bx"])
            by = jnp.where(upd, w2_sel, s["by"])
            tri = jnp.where(upd, tid_sel, s["tri"])
            best_inst = jnp.where(upd, inst_b, s["best_inst"])
        want_pop_tri = is_tri

        # ---- next / pop (per packet) ----
        nxt = jnp.where(is_int, jnp.where(descend, next_int, s["node"]),
                        jnp.where(is_ins, next_ins, s["node"]))
        level = jnp.where(descend, s["level"] + 1, s["level"])
        want_pop = want_pop_int | want_pop_tri
        pl = trail_find_parent(trail, level)
        dead = want_pop & (pl < 0)
        do_pop = want_pop & (pl >= 0)
        p_safe = jnp.maximum(pl, 0)
        kp = trail_get(trail, p_safe)
        trail = trail_set(trail, p_safe, kp + 1, do_pop)
        trail = trail_clear_above(trail, p_safe, do_pop)
        empty = scount == 0
        restart = do_pop & empty
        from_stack = do_pop & ~empty
        entry, stack, scount = _stack_pop_n(stack, scount, from_stack)
        is_last = (entry & LAST_FLAG) != 0
        trail = trail_set(trail, p_safe, jnp.full(b, WIDTH, jnp.int32),
                          from_stack & is_last)
        nxt = jnp.where(restart, 0,
                        jnp.where(from_stack, entry & ID_MASK, nxt))
        level = jnp.where(restart, 0,
                          jnp.where(from_stack, p_safe + 1, level))

        done = s["done"] | dead
        if occlusion:
            done = done | ~jnp.any(ray_on & (best_t > 0.0), axis=1)
        if stats:
            live = act.sum(dtype=jnp.int32)
            s["packet_steps"] = s["packet_steps"] + live
            s["ray_steps"] = s["ray_steps"] + jnp.sum(
                (ray_on & act[:, None]).sum(1, dtype=jnp.int32),
                dtype=jnp.int32)
            s["int_steps"] = s["int_steps"] + is_int.sum(dtype=jnp.int32)
            s["tri_steps"] = s["tri_steps"] + is_tri.sum(dtype=jnp.int32)
            s["ins_steps"] = s["ins_steps"] + is_ins.sum(dtype=jnp.int32)
        s.update(node=nxt, level=level, trail=trail, stack=stack,
                 scount=scount, inst=inst,
                 lox=lox, loy=loy, loz=loz, ldx=ldx_, ldy=ldy_, ldz=ldz_,
                 lix=lix, liy=liy, liz=liz,
                 best_t=best_t, bx=bx, by=by, tri=tri, best_inst=best_inst,
                 done=done, steps=s["steps"] + 1)
        return [s[k] for k in keys]

    final = dict(zip(keys, jax.lax.while_loop(
        cond, body, [state[k] for k in keys])))

    def flat(x):
        return x.reshape(r)

    if occlusion:
        occluded = ray_on & (final["best_t"] < 0.0)
        dist = flat(jnp.where(occluded, 0.0, LARGE_FLOAT))
    else:
        # a real hit is strictly inside the clamp; unhit rays still carry
        # their initial t_max and must report miss
        dist = flat(jnp.where((final["best_t"] < 0)
                              | (final["best_t"] >= limit),
                              LARGE_FLOAT, final["best_t"]))
    hits = Hits(
        dist=dist,
        bx=flat(final["bx"]), by=flat(final["by"]),
        bz=flat(1.0 - final["bx"] - final["by"]),
        tri=flat(final["tri"]), inst=flat(final["best_inst"]),
    )
    if stats:
        return hits, PacketStats(
            steps=final["steps"], packet_steps=final["packet_steps"],
            ray_steps=final["ray_steps"], int_steps=final["int_steps"],
            tri_steps=final["tri_steps"], ins_steps=final["ins_steps"])
    return hits, final["steps"]
