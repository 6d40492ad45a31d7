"""RT-unit instruction-level facade: traceRay / getWork / getAttr / commit.

The reference's programming model is four custom instructions on
RISCV_CUSTOM0 (kernel/include/vx_raytrace.h:21-67) backed by the per-core
RTUnit (sim/simx/rt_unit.cpp): traceRay allocates a rayID and starts
traversal; completed rays park in per-shader-type queues; getWork pops up
to NUM_RTU_LANES ids from the longest queue encoded as
``(1 << (28+type)) | rayID`` (rt_unit.cpp:138-161); getAttr exposes ray/hit
state by VX_RT_* id (rt_unit.cpp:163-188); commit resumes or terminates
(rt_unit.cpp:190-213).

This module reproduces that contract 1:1 at batch granularity — each call
operates on arrays of rayIDs — so code structured like the reference's
persistent kernel (tests/regression/raytracing/kernel.cpp:50-123) ports
directly.  The wavefront engine (engine.wavefront) is the performance path;
this facade is the compatibility/programmability path and the executable
specification of the queue/commit semantics.

rayID convention matches the reference: ids start at 1, 0 means "no work"
(rt_unit.cpp:52-53 allocates from 1).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vortex_rt_tpu.ops.traverse_wide import (
    WideArrays, WideState, commit as _commit_state, init_state_lanes,
    trace_lanes,
)
from vortex_rt_tpu.utils.config import (
    COMMIT_ACCEPT, COMMIT_CONT, COMMIT_TERM, LARGE_FLOAT,
    NUM_SHADER_TYPES, SHADER_ANY, SHADER_CLOSEST, SHADER_MISS,
)

# VX_RT_* attribute ids (hw/VX_types.toml:270-285)
VX_RT_RAY_RO_X = 0xFD0
VX_RT_RAY_RO_Y = 0xFD1
VX_RT_RAY_RO_Z = 0xFD2
VX_RT_RAY_RD_X = 0xFD3
VX_RT_RAY_RD_Y = 0xFD4
VX_RT_RAY_RD_Z = 0xFD5
VX_RT_HIT_DIST = 0xFD6
VX_RT_HIT_BX = 0xFD7
VX_RT_HIT_BY = 0xFD8
VX_RT_HIT_BZ = 0xFD9
VX_RT_HIT_BLAS_IDX = 0xFDA
VX_RT_HIT_TRI_IDX = 0xFDB
VX_RT_RAY_PAYLOAD_ADDR = 0xFDC
VX_RT_COMMIT_CONT = 0xFDD
VX_RT_COMMIT_ACCEPT = 0xFDE
VX_RT_COMMIT_TERM = 0xFDF

_COMMIT_MAP = {
    VX_RT_COMMIT_CONT: COMMIT_CONT,
    VX_RT_COMMIT_ACCEPT: COMMIT_ACCEPT,
    VX_RT_COMMIT_TERM: COMMIT_TERM,
}


def decode_work(ret: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """kernel.cpp:86-91: type = ctz(ret >> 28); id = ret & 0x0FFFFFFF."""
    ret = np.asarray(ret, np.uint32)
    hi = ret >> 28
    # count trailing zeros of the (one-hot) type nibble
    t = np.zeros_like(hi)
    for b in range(4):
        t = np.where(hi == (1 << b), b, t)
    return t.astype(np.int32), (ret & 0x0FFFFFFF).astype(np.int32)


class RTUnit:
    """Per-scene RT engine with the reference's 4-op interface.

    Host-resident queue bookkeeping (NumPy) around device traversal
    batches.  anyhit=True routes every strictly-closer intersection to the
    ANY queue (suspension), like the hardware; anyhit=False auto-accepts
    and rays land directly in MISS/CLOSEST.
    """

    def __init__(self, wa: WideArrays, lanes: int = 4096,
                 anyhit: bool = True, queue_capacity: int = 1024):
        self.wa = wa
        self.lanes = int(lanes)
        self.anyhit = bool(anyhit)
        # ShaderQueue CAPACITY (sim/simx/types.h:1844).  The hardware ring
        # overwrites its oldest entry on overflow; the facade must not lose
        # rays, so overflow spills to a side list that refills the bounded
        # queue as get_work drains it.
        self.queue_capacity = int(queue_capacity)
        self._next_id = 1  # 0 is invalid (rt_unit.cpp:52)
        self._rays: Dict[int, dict] = {}      # rayID -> state record
        self._queues = [[] for _ in range(NUM_SHADER_TYPES)]
        self._spill = [[] for _ in range(NUM_SHADER_TYPES)]
        self._pending_trace: list = []        # ids awaiting (re)traversal

    def _enqueue(self, ty: int, rid: int) -> None:
        if len(self._queues[ty]) < self.queue_capacity:
            self._queues[ty].append(rid)
        else:
            self._spill[ty].append(rid)

    # ---- traceRay (vx_raytrace.h:42-48) ----

    def trace_ray(self, o: np.ndarray, d: np.ndarray,
                  payload_addr: Optional[np.ndarray] = None) -> np.ndarray:
        """Allocate rayIDs for a batch and enqueue traversal."""
        o = np.asarray(o, np.float32).reshape(-1, 3)
        d = np.asarray(d, np.float32).reshape(-1, 3)
        n = o.shape[0]
        if payload_addr is None:
            payload_addr = np.zeros(n, np.int64)
        ids = np.arange(self._next_id, self._next_id + n, dtype=np.int64)
        self._next_id += n
        for k, rid in enumerate(ids):
            self._rays[int(rid)] = dict(
                o=o[k], d=d[k], payload=int(payload_addr[k]),
                state=None,  # per-ray WideState row, filled after tracing
                dist=LARGE_FLOAT, bx=0.0, by=0.0, bz=0.0, blas=0, tri=0,
                pend=None,
            )
            self._pending_trace.append(int(rid))
        return ids.astype(np.uint32)

    # ---- internal: run traversal for pending rays, route to queues ----

    def _run_pending(self) -> None:
        if not self._pending_trace:
            return
        pend = self._pending_trace
        self._pending_trace = []
        # fresh and resumed rays trace in separate batches
        fresh = [i for i in pend if self._rays[i]["state"] is None]
        resumed = [i for i in pend if self._rays[i]["state"] is not None]
        if fresh and resumed:
            self._run_batch(fresh)
            self._run_batch(resumed)
            return
        self._run_batch(pend)

    def _run_batch(self, ids) -> None:
        if not ids:
            return
        o = np.stack([self._rays[i]["o"] for i in ids])
        d = np.stack([self._rays[i]["d"] for i in ids])
        resume = [self._rays[i]["state"] for i in ids]
        if resume[0] is not None:
            state = WideState(*[
                jnp.asarray(np.stack([np.asarray(s[f]) for s in resume]))
                for f in WideState._fields[:-1]
            ] + [jnp.int32(0)])
        else:
            state = None
        hits, st, _ = trace_lanes(
            self.wa,
            jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]),
            jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
            state=state, suspend=self.anyhit)
        sus = np.asarray(st.suspended)
        dist = np.asarray(hits.dist)
        host_state = {f: np.asarray(getattr(st, f))
                      for f in WideState._fields[:-1]}
        for k, rid in enumerate(ids):
            rec = self._rays[rid]
            rec["state"] = {f: host_state[f][k] for f in host_state}
            rec["dist"] = float(dist[k])
            rec["bx"] = float(np.asarray(hits.bx)[k])
            rec["by"] = float(np.asarray(hits.by)[k])
            rec["bz"] = float(np.asarray(hits.bz)[k])
            rec["blas"] = int(np.asarray(hits.inst)[k])
            rec["tri"] = int(np.asarray(hits.tri)[k])
            if sus[k]:
                rec["pend"] = dict(
                    dist=float(np.asarray(st.pend_t)[k]),
                    bx=float(np.asarray(st.pend_bx)[k]),
                    by=float(np.asarray(st.pend_by)[k]),
                    tri=int(np.asarray(st.pend_tri)[k]),
                    blas=int(np.asarray(st.pend_inst)[k]))
                self._enqueue(SHADER_ANY, rid)
            elif rec["dist"] >= LARGE_FLOAT:
                self._enqueue(SHADER_MISS, rid)         # rt_unit.cpp:109
            else:
                self._enqueue(SHADER_CLOSEST, rid)

    # ---- getWork (rt_unit.cpp:125-161) ----

    def get_work(self) -> np.ndarray:
        """Pop <= lanes rayIDs from the longest queue; returns encoded
        words ``(1 << (28+type)) | rayID`` (empty array when no work)."""
        self._run_pending()
        lengths = [len(q) for q in self._queues]
        if max(lengths) == 0:
            return np.zeros(0, np.uint32)
        ty = int(np.argmax(lengths))  # longest queue wins (schedule_work)
        take = self._queues[ty][: self.lanes]
        self._queues[ty] = self._queues[ty][self.lanes :]
        # drain spilled rays into the freed queue slots
        room = self.queue_capacity - len(self._queues[ty])
        if room > 0 and self._spill[ty]:
            self._queues[ty].extend(self._spill[ty][:room])
            self._spill[ty] = self._spill[ty][room:]
        return ((np.uint32(1) << np.uint32(28 + ty))
                | np.asarray(take, np.uint32))

    # ---- getAttr (rt_unit.cpp:163-188) ----

    def get_attr(self, ray_ids: np.ndarray, attr: int) -> np.ndarray:
        ids = [int(i) & 0x0FFFFFFF for i in np.asarray(ray_ids).ravel()]
        out = []
        for rid in ids:
            rec = self._rays[rid]
            pend = rec["pend"]
            hit = pend if pend is not None else rec
            out.append({
                VX_RT_RAY_RO_X: rec["o"][0], VX_RT_RAY_RO_Y: rec["o"][1],
                VX_RT_RAY_RO_Z: rec["o"][2], VX_RT_RAY_RD_X: rec["d"][0],
                VX_RT_RAY_RD_Y: rec["d"][1], VX_RT_RAY_RD_Z: rec["d"][2],
                VX_RT_HIT_DIST: hit["dist"], VX_RT_HIT_BX: hit["bx"],
                VX_RT_HIT_BY: hit["by"],
                VX_RT_HIT_BZ: hit.get("bz", 1.0 - hit["bx"] - hit["by"]),
                VX_RT_HIT_BLAS_IDX: hit["blas"],
                VX_RT_HIT_TRI_IDX: hit["tri"],
                VX_RT_RAY_PAYLOAD_ADDR: rec["payload"],
            }[attr])
        return np.asarray(out)

    # ---- commit (rt_unit.cpp:190-213) ----

    def commit(self, ray_ids: np.ndarray, action: int) -> None:
        """action: VX_RT_COMMIT_* (or config.COMMIT_*)."""
        act = _COMMIT_MAP.get(action, action)
        for rid_raw in np.asarray(ray_ids).ravel():
            rid = int(rid_raw) & 0x0FFFFFFF
            rec = self._rays.get(rid)
            if rec is None:
                continue
            if act == COMMIT_TERM:
                del self._rays[rid]  # free all per-ray state
                continue
            st = rec["state"]
            fake = WideState(*[jnp.asarray(st[f])[None]
                               for f in WideState._fields[:-1]]
                             + [jnp.int32(0)])
            fake = _commit_state(
                fake, jnp.asarray([act], jnp.int32))
            rec["state"] = {f: np.asarray(getattr(fake, f))[0]
                            for f in WideState._fields[:-1]}
            if act == COMMIT_ACCEPT:
                p = rec["pend"]
                rec.update(dist=p["dist"], bx=p["bx"], by=p["by"],
                           blas=p["blas"], tri=p["tri"])
            rec["pend"] = None
            self._pending_trace.append(rid)  # resume traversal

    # ---- convenience ----

    def active_rays(self) -> int:
        return len(self._rays)
