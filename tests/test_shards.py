"""Scene sharding (parallel.shards): bin-pack + sharded-vs-replicated
parity on the 8-virtual-device CPU mesh (docs/SCENE_SHARDING.md step 3)."""

import numpy as np
import pytest

import jax

from vortex_rt_tpu.models.procedural import cornell_box, uv_sphere
from vortex_rt_tpu.models.scene import RenderParams, Scene


def _scene():
    sc = Scene()
    for mesh, refl in cornell_box():
        sc.add_instance(sc.add_mesh(mesh), reflectivity=refl)
    si = sc.add_mesh(uv_sphere((0.0, -0.2, 0.3), 0.25, 8, 12))
    sc.add_instance(si, reflectivity=0.4)
    return sc


def test_bin_pack_partitions_instances():
    from vortex_rt_tpu.parallel.shards import bin_pack_instances

    sc = _scene()
    shards = bin_pack_instances(sc, 3)
    allv = sorted(i for s in shards for i in s)
    assert allv == list(range(len(sc._instances)))
    for s in shards:
        assert s == sorted(s)  # global order preserved within a shard


def test_build_sharded_shapes():
    from vortex_rt_tpu.parallel.shards import build_sharded

    sc = _scene()
    sharded, sb = build_sharded(sc, 2)
    assert sharded.nodes.shape[0] == 2
    assert sharded.tri_rows.shape[0] == 2
    # every instance owned exactly once
    owned = np.asarray(sharded.inst_map).ravel()
    owned = owned[owned >= 0] if (owned < 0).any() else owned
    # padding repeats are possible only past each shard's count; the
    # counts sum to the instance total
    total = sum(len(s) for s in
                __import__("vortex_rt_tpu.parallel.shards",
                           fromlist=["bin_pack_instances"])
                .bin_pack_instances(sc, 2))
    assert total == len(sc._instances)


@pytest.mark.parametrize("shadow", [False, True])
def test_sharded_matches_single_chip(shadow):
    from jax.sharding import Mesh
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.parallel.shards import render_sharded
    from vortex_rt_tpu.utils.config import RTConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sc = _scene()
    sb = sc.build()
    cam = Scene.framing_camera(sb, 45.0, 4 / 3)
    params = RenderParams(max_depth=2, spp=1, shadow=shadow)
    w, h = 64, 48

    r = WavefrontRenderer.from_buffers(sb, RTConfig(lanes=1024))
    ref, _ = r.render(cam, params, w, h)

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "sp"))
    img, total = render_sharded(sc, cam, params, w, h, n_shards=2,
                                mesh=mesh)
    assert img.shape == (h, w, 3)
    assert total >= w * h
    err = float(np.sqrt(((img - ref) ** 2).mean()))
    assert err < 1e-5, f"sharded vs single-chip rmse {err}"


def test_sharded_pathtrace_matches_single_chip():
    """Path-traced (stochastic bounce + RR + shadow) frames through the
    sharded trace_fn: same counter-based sample streams, same
    lexicographic cross-shard combine -> same image as one chip
    (VERDICT r3 weak #8: the pathtrace table selection in
    make_sharded_wavefront was untested)."""
    from jax.sharding import Mesh
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.parallel.shards import render_sharded
    from vortex_rt_tpu.utils.config import RTConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sc = _scene()
    sb = sc.build()
    cam = Scene.framing_camera(sb, 45.0, 4 / 3)
    params = RenderParams(max_depth=3, spp=2, shadow=True, pathtrace=True,
                          light_pos=(0, 0.8, -0.5))
    w, h = 64, 48

    r = WavefrontRenderer.from_buffers(sb, RTConfig(lanes=1024))
    ref, _ = r.render(cam, params, w, h)

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "sp"))
    img, total = render_sharded(sc, cam, params, w, h, n_shards=2,
                                mesh=mesh)
    assert total > w * h * params.spp  # bounce + shadow rays traced
    err = float(np.sqrt(((img - ref) ** 2).mean()))
    assert err < 1e-5, f"sharded pathtrace vs single-chip rmse {err}"


def test_sharded_sponza_class_scale_and_memory():
    """Sponza-class triangle count (~100k tris over 8 instances) across
    sp=4 shards: parity with the single chip AND the >HBM motivation —
    per-chip scene bytes must genuinely shrink (docs/SCENE_SHARDING.md
    memory table)."""
    from jax.sharding import Mesh
    from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
    from vortex_rt_tpu.models import bigscenes
    from vortex_rt_tpu.parallel.shards import (
        build_sharded, memory_table, render_sharded,
    )
    from vortex_rt_tpu.utils import vecmath as vm
    from vortex_rt_tpu.utils.config import RTConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sc = Scene()
    for k in range(8):
        # 8 UNIQUE meshes (distinct displacement seeds): instances are
        # the sharding granule, and distinct BLAS pools are what make
        # per-chip bytes actually shrink
        mi = sc.add_mesh(bigscenes.blob(n=80, seed=k))
        ang = 2 * np.pi * k / 8
        tf = vm.mat4_translate([3.5 * np.cos(ang), 0, 3.5 * np.sin(ang)])
        sc.add_instance(mi, tf)
    sb = sc.build()
    assert sb.num_tris > 90_000  # Sponza-class (reference Sponza ~110k)
    cam = Scene.framing_camera(sb, 45.0, 4 / 3)
    params = RenderParams(max_depth=2, spp=1, shadow=True,
                          light_pos=(0, 6.0, 0))
    w, h = 32, 24

    r = WavefrontRenderer.from_buffers(sb, RTConfig(lanes=1024))
    ref, _ = r.render(cam, params, w, h)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    img, _ = render_sharded(sc, cam, params, w, h, n_shards=4, mesh=mesh)
    err = float(np.sqrt(((img - ref) ** 2).mean()))
    assert err < 1e-5, f"sharded vs single-chip rmse {err}"

    sharded, sb_full = build_sharded(sc, 4)
    tbl = memory_table(sharded, sb_full)
    # 4 shards: each chip holds well under half the replicated scene
    # (padding + per-shard TLAS overhead keep it above the ideal 1/4)
    assert tbl["ratio"] < 0.5, tbl
    assert tbl["sharded_per_chip_bytes"] * 4 > tbl["replicated_bytes"] * 0.8
