"""Scene-sharded multi-chip rendering — the "sp" axis (>HBM scenes).

Implements docs/SCENE_SHARDING.md steps 1-3: instance-granular BLAS
sharding over a 2-D ``(dp, sp)`` device mesh.  Each chip holds

* its image row block's rays (``dp`` axis, as parallel.tiles), and
* ONE scene shard (``sp`` axis): the wide TLAS over its OWNED instances
  plus those instances' BLAS subtrees and packed leaf rows — the memory
  that dominates scene cost (nodes + tri_rows; the design doc's table).

Schedule: rays are replicated across ``sp`` (each sp peer generates the
same row-block rays arithmetically — zero communication), every peer
traces its local sub-scene with the unmodified packet engine, and the
per-ray closest hits are combined with a lexicographic (t, inst, tri)
min over the ``sp`` axis — 3 ``pmin`` + 4 ``psum`` ICI collectives of
slab-sized lanes per wave.  Occlusion (shadow) waves combine with a
single ``pmin``.  This replaces the design doc's candidate-binned
``all_to_all`` schedule: dense replicate-rays/min-combine needs no
fixed-capacity bins or overflow loops, touches the packet engine not at
all, and moves 24 B/ray/wave — the all_to_all plan stays documented as
the upgrade path for sp counts where ray replication's compute
(every ray visits every shard) stops amortizing.

Correctness: instances are partitioned (each owned by exactly one
shard), so a hit (t, inst, tri) exists on exactly one peer and the
lexicographic min reproduces the single-chip engine's deterministic
tie-break exactly; shading happens on the ray's home chip with global
ids (materials/shade tables replicated — the doc's v1; shard-owned
shading is the v2 extension).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vortex_rt_tpu.accel import qbvh
from vortex_rt_tpu.engine.megakernel import CameraArrays, LightArrays
from vortex_rt_tpu.models.scene import (
    Camera, RenderParams, Scene, SceneBuffers,
)
from vortex_rt_tpu.ops.traverse_wide import _LEFT_BITS, _LEFT_MASK, WideArrays
from vortex_rt_tpu.utils.config import LARGE_FLOAT

_I32MAX = np.int32(2**31 - 1)


def bin_pack_instances(scene: Scene, n_shards: int) -> List[List[int]]:
    """Greedy argmin-load bin-pack of instances by BLAS size (triangle
    count as the node-bytes proxy — nodes and leaf rows both scale with
    it).  Returns per-shard GLOBAL instance-id lists, each ascending (the
    in-shard order must preserve the global order so the packet engine's
    local tie-break agrees with the global one)."""
    insts = scene._instances
    assert len(insts) >= n_shards, (
        f"need >= {n_shards} instances to fill {n_shards} shards")
    weights = [scene._meshes[mi].num_tris for (mi, _, _) in insts]
    order = np.argsort(-np.asarray(weights), kind="stable")
    load = np.zeros(n_shards, np.int64)
    owner = np.zeros(len(insts), np.int32)
    for i in order:
        s = int(load.argmin())
        owner[i] = s
        load[s] += weights[i]
    return [sorted(int(i) for i in np.nonzero(owner == s)[0])
            for s in range(n_shards)]


def _pad_tlas_region(nodes: np.ndarray, k_old: int, k_new: int) -> np.ndarray:
    """Grow the TLAS region of a packed node pool from ``k_old`` to
    ``k_new`` rows so every shard shares one static ``num_tlas``.  BLAS
    internal links and instance BLAS-root words shift by the pad; the pad
    rows are unreachable zero-count KIND_TRIS leaves."""
    pad = k_new - k_old
    if pad == 0:
        return nodes
    nodes = nodes.copy()
    n = nodes.shape[0]
    meta = nodes[:, 14]
    kind = meta >> 29
    left = (meta & _LEFT_MASK).astype(np.int64)
    nch = (meta >> _LEFT_BITS) & 7
    blas_int = (kind == qbvh.KIND_INTERNAL) & (np.arange(n) >= k_old)
    left = np.where(blas_int, left + pad, left)
    nodes[:, 14] = (left.astype(np.uint32) | (nch << _LEFT_BITS)
                    | (kind << 29))
    is_inst = kind == qbvh.KIND_INSTANCE
    roots = nodes[is_inst, 28].view(np.int32) + pad
    nodes[is_inst, 28] = roots.view(np.uint32)
    dead = np.zeros((pad, 32), np.uint32)
    dead[:, 14] = np.uint32(qbvh.KIND_TRIS) << 29  # count 0, never reached
    return np.concatenate([nodes[:k_old], dead, nodes[k_old:]])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedArrays:
    """Stacked per-shard traversal pools (leading axis = sp shard)."""

    nodes: jnp.ndarray      # (S, Nmax, 32) u32
    tri_rows: jnp.ndarray   # (S, Lmax, 16*lmax) f32
    inst_map: jnp.ndarray   # (S, Imax) i32 local->global instance id
    num_tlas: int = dataclasses.field(metadata=dict(static=True))
    max_leaf_tris: int = dataclasses.field(metadata=dict(static=True))
    depth: int = dataclasses.field(metadata=dict(static=True))

    def local(self, squeeze) -> Tuple[WideArrays, jnp.ndarray]:
        """Device-local (WideArrays, inst_map) inside shard_map (the
        leading shard axis arrives sliced to 1)."""
        return WideArrays(
            nodes=squeeze(self.nodes), tri_rows=squeeze(self.tri_rows),
            num_tlas=self.num_tlas, max_leaf_tris=self.max_leaf_tris,
            depth=self.depth), squeeze(self.inst_map)

    def bytes_per_shard(self) -> int:
        """Per-chip resident scene bytes under P(sp) sharding: each chip
        holds ONE row of the stacked pools (the padded shard — padding
        rows are the price of a static shape).  This is the number the
        >HBM motivation needs to beat (docs/SCENE_SHARDING.md)."""
        return int(self.nodes.shape[1] * self.nodes.shape[2] * 4
                   + self.tri_rows.shape[1] * self.tri_rows.shape[2] * 4
                   + self.inst_map.shape[1] * 4)


def memory_table(sharded: ShardedArrays, sb_full: SceneBuffers) -> dict:
    """Replicated-vs-sharded per-chip scene-memory accounting (the
    design doc's >HBM demonstration, docs/SCENE_SHARDING.md).  Returns
    bytes: 'replicated' (full WideArrays per chip), 'sharded_per_chip'
    (one padded shard), and their ratio."""
    wa_full = WideArrays.from_scene(sb_full)
    replicated = int(np.asarray(wa_full.nodes).nbytes
                     + np.asarray(wa_full.tri_rows).nbytes)
    per_chip = sharded.bytes_per_shard()
    return {
        "replicated_bytes": replicated,
        "sharded_per_chip_bytes": per_chip,
        "n_shards": int(sharded.nodes.shape[0]),
        "ratio": per_chip / max(replicated, 1),
    }


def build_sharded(scene: Scene, n_shards: int,
                  config=None) -> Tuple[ShardedArrays, SceneBuffers]:
    """Step 1 (design doc): build-time bin-pack + per-shard packing.

    Returns (ShardedArrays, full SceneBuffers).  The full buffers feed
    the replicated shading tables and the golden oracle; each shard's
    node/leaf pool covers only its owned instances.  Per-shard sub-scenes
    re-add ALL meshes (so the packed leaf rows keep GLOBAL triangle ids —
    Scene.build packs every mesh into the global pools) but only owned
    instances (so the wide pool only collapses owned BLAS roots)."""
    shards = bin_pack_instances(scene, n_shards)
    sb_full = scene.build(config)

    nodes_l, rows_l, imap_l = [], [], []
    num_tlas, max_leaf, depth = 0, 1, 0
    was = []
    for owned in shards:
        sub = Scene()
        for m in scene._meshes:
            sub.add_mesh(m)
        for gi in owned:
            mi, tf, refl = scene._instances[gi]
            sub.add_instance(mi, tf, refl)
        wa = WideArrays.from_scene(sub.build(config))
        was.append(wa)
        num_tlas = max(num_tlas, wa.num_tlas)
        max_leaf = max(max_leaf, wa.max_leaf_tris)
        depth = max(depth, wa.depth)
        imap_l.append(np.asarray(owned, np.int32))

    for wa in was:
        nodes_l.append(_pad_tlas_region(np.asarray(wa.nodes),
                                        wa.num_tlas, num_tlas))
        rows = np.asarray(wa.tri_rows)
        if wa.max_leaf_tris < max_leaf:
            rows = np.concatenate(
                [rows, np.zeros((rows.shape[0],
                                 16 * (max_leaf - wa.max_leaf_tris)),
                                np.float32)], axis=1)
        rows_l.append(rows)

    def stack_pad(arrs, fill=0):
        nmax = max(a.shape[0] for a in arrs)
        out = np.full((len(arrs), nmax) + arrs[0].shape[1:], fill,
                      arrs[0].dtype)
        for i, a in enumerate(arrs):
            out[i, :a.shape[0]] = a
        return out

    return ShardedArrays(
        nodes=jnp.asarray(stack_pad(nodes_l)),
        tri_rows=jnp.asarray(stack_pad(rows_l)),
        inst_map=jnp.asarray(stack_pad(imap_l)),
        num_tlas=num_tlas, max_leaf_tris=max_leaf, depth=depth,
    ), sb_full


def make_sharded_wavefront(mesh: Mesh, width: int, height: int,
                           max_depth: int = 2, spp: int = 1,
                           chunk: int = 512, shadow: bool = False,
                           pathtrace: bool = False, packet: int = 128,
                           tile_w: int = 16, tile_h: int = 8,
                           dp_axis: str = "dp", sp_axis: str = "sp"):
    """Step 2 (design doc): the jitted SPMD step over the (dp, sp) mesh.

    step(sharded, sa, cam, light) -> ((H, W, 3) image, total rays)."""
    from vortex_rt_tpu.engine.shaders import ShaderTable, pathtrace_closest
    from vortex_rt_tpu.engine.wavefront import frame_body
    from vortex_rt_tpu.ops.traverse_packet import trace_packets

    n_dp = mesh.shape[dp_axis]
    assert height % n_dp == 0, f"height {height} % {n_dp} devices != 0"
    rows_local = height // n_dp
    n_pix_local = rows_local * width
    table = (ShaderTable(closest=pathtrace_closest) if pathtrace
             else ShaderTable())

    def _body(sharded: ShardedArrays, sa, cam, light):
        wa_local, inst_map = sharded.local(lambda a: a[0])
        n_inst = inst_map.shape[0]

        def trace_fn(ox, oy, oz, dx, dy, dz, act, t_clamp, occl):
            r = ox.shape[0]
            o3 = jnp.stack([ox, oy, oz], axis=1)
            d3 = jnp.stack([dx, dy, dz], axis=1)
            tc = jnp.full(r, LARGE_FLOAT) if t_clamp is None else t_clamp
            h, st = trace_packets(wa_local, o3, d3, packet=packet,
                                  active=act, t_max=tc, occlusion=occl)
            steps = jax.lax.psum(st, sp_axis)
            if occl:
                # occluded lanes report 0.0 < t_max; any shard occludes
                return (jax.lax.pmin(h.dist, sp_axis), h.bx, h.by,
                        h.tri, h.inst, steps)
            ginst = inst_map[jnp.clip(h.inst, 0, n_inst - 1)]
            # lexicographic (t, global inst, tri) min across shards —
            # exactly one peer holds each (inst, tri), so the psum
            # broadcast of the winner's fields is exact
            tmin = jax.lax.pmin(h.dist, sp_axis)
            is_hit = tmin < LARGE_FLOAT
            on_min = (h.dist == tmin) & is_hit
            imin = jax.lax.pmin(
                jnp.where(on_min, ginst, _I32MAX), sp_axis)
            on_min = on_min & (ginst == imin)
            trimin = jax.lax.pmin(
                jnp.where(on_min, h.tri, _I32MAX), sp_axis)
            win = on_min & (h.tri == trimin)
            bx = jax.lax.psum(jnp.where(win, h.bx, 0.0), sp_axis)
            by = jax.lax.psum(jnp.where(win, h.by, 0.0), sp_axis)
            return (jnp.where(is_hit, tmin, LARGE_FLOAT), bx, by,
                    jnp.where(is_hit, trimin, 0),
                    jnp.where(is_hit, imin, 0), steps)

        dev = jax.lax.axis_index(dp_axis)
        pix_offset = dev.astype(jnp.int32) * n_pix_local
        img, rays, steps = frame_body(
            sharded, sa, cam, light, width, height, n_pix_local,
            pix_offset, max_depth=max_depth, spp=spp, chunk=chunk,
            table=table, seed=0, packet=packet, shadow=shadow,
            tile_w=tile_w, tile_h=tile_h, trace_fn=trace_fn)
        total = jax.lax.psum(rays, dp_axis)
        return img.reshape(3, rows_local, width).transpose(1, 2, 0), total

    def step(sharded, sa, cam, light):
        shard = jax.shard_map(
            _body, mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: P(sp_axis), sharded),
                jax.tree.map(lambda _: P(), sa),
                jax.tree.map(lambda _: P(), cam),
                jax.tree.map(lambda _: P(), light)),
            out_specs=(P(dp_axis), P()),
            check_vma=False,
        )
        return shard(sharded, sa, cam, light)

    return jax.jit(step)


def render_sharded(scene: Scene, cam: Camera, params: RenderParams,
                   width: int, height: int, n_shards: int,
                   mesh: Optional[Mesh] = None,
                   packet: int = 128) -> Tuple[np.ndarray, int]:
    """Host API: bin-pack + shard + render over an (dp, sp) mesh built
    from the available devices (dp = n_devices // n_shards)."""
    from vortex_rt_tpu.ops.shade_lanes import ShadeArrays

    sharded, sb_full = build_sharded(scene, n_shards)
    if mesh is None:
        devs = np.array(jax.devices())
        n_dp = len(devs) // n_shards
        mesh = Mesh(devs[: n_dp * n_shards].reshape(n_dp, n_shards),
                    ("dp", "sp"))
    step = make_sharded_wavefront(
        mesh, width, height, params.max_depth, params.spp,
        shadow=params.shadow,
        pathtrace=getattr(params, "pathtrace", False), packet=packet)
    img, total = step(sharded, ShadeArrays.from_scene(sb_full),
                      CameraArrays.from_camera(cam),
                      LightArrays.from_params(params))
    return np.asarray(img), int(total)
