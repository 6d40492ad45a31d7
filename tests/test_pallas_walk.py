"""Pallas scalar-node-walk kernel parity (interpret mode on CPU).

The Mosaic kernel (ops/pallas/packet_walk.py) must agree with the XLA
packet engine (ops/traverse_packet.py) in every mode the wavefront
frame uses: closest hit, active-lane masks, t_max clamps, and any-hit
occlusion.  These run the kernel through the Pallas interpreter so the
CPU suite gates the same code path the TPU compiles.
"""

import numpy as np
import pytest

from vortex_rt_tpu.golden.renderer import generate_rays
from vortex_rt_tpu.models.procedural import box, uv_sphere
from vortex_rt_tpu.models.scene import Camera, Scene
from vortex_rt_tpu.ops.pallas.packet_walk import (
    HAVE_PALLAS, P, trace_packets_pallas,
)
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays
from vortex_rt_tpu.utils.config import LARGE_FLOAT

pytestmark = pytest.mark.skipif(not HAVE_PALLAS,
                                reason="Pallas backend unavailable")


def _scene():
    sc = Scene()
    sc.add_mesh(uv_sphere((0, 0, 0), 1.0, 12, 16))
    sc.add_mesh(box((0.5, 0.3, 0.5), 0.4))
    return sc.build()


def _rays(n):
    cam = Camera.look_at([0.3, -0.2, -4], [0, 0.05, 0], [0, 1, 0],
                         40.0, 1.0)
    w = 64
    assert n % w == 0
    o, d = generate_rays(cam, w, n // w)
    return o, d


def test_pallas_closest_parity():
    sb = _scene()
    wa = WideArrays.from_scene(sb)
    o, d = _rays(2 * P)
    hx, _ = trace_packets(wa, o, d, packet=64)
    hp, steps = trace_packets_pallas(wa, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(hp.dist), np.asarray(hx.dist),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hx.tri))
    assert int(steps) > 0


def test_pallas_active_mask():
    sb = _scene()
    wa = WideArrays.from_scene(sb)
    o, d = _rays(P)
    act = (np.arange(P) % 3 != 0)
    hx, _ = trace_packets(wa, o, d, packet=64, active=act)
    hp, _ = trace_packets_pallas(wa, o, d, active=act, interpret=True)
    dist_p = np.asarray(hp.dist)
    # dead lanes report miss; live lanes match the XLA engine
    assert (dist_p[~act] >= LARGE_FLOAT).all()
    np.testing.assert_allclose(dist_p[act], np.asarray(hx.dist)[act],
                               rtol=1e-6)


def test_pallas_t_max_clamp():
    sb = _scene()
    wa = WideArrays.from_scene(sb)
    o, d = _rays(P)
    hx_free, _ = trace_packets(wa, o, d, packet=64)
    ref = np.asarray(hx_free.dist)
    hit = ref < LARGE_FLOAT
    # clamp half the hit lanes just below their hit distance
    t_max = np.full(P, LARGE_FLOAT, np.float32)
    cut = hit & (np.arange(P) % 2 == 0)
    t_max[cut] = ref[cut] * 0.5
    hx, _ = trace_packets(wa, o, d, packet=64, t_max=t_max)
    hp, _ = trace_packets_pallas(wa, o, d, t_max=t_max, interpret=True)
    np.testing.assert_allclose(np.asarray(hp.dist), np.asarray(hx.dist),
                               rtol=1e-6)
    assert (np.asarray(hp.dist)[cut] >= LARGE_FLOAT).all()


def test_pallas_occlusion_parity():
    sb = _scene()
    wa = WideArrays.from_scene(sb)
    o, d = _rays(P)
    hx_free, _ = trace_packets(wa, o, d, packet=64)
    ref = np.asarray(hx_free.dist)
    t_max = np.where(ref < LARGE_FLOAT, ref * 1.5,
                     np.float32(8.0)).astype(np.float32)
    act = (np.arange(P) % 5 != 0)
    hx, _ = trace_packets(wa, o, d, packet=64, active=act, t_max=t_max,
                          occlusion=True)
    hp, _ = trace_packets_pallas(wa, o, d, active=act, t_max=t_max,
                                 occlusion=True, interpret=True)
    # occluded -> 0.0, unoccluded/dead -> LARGE_FLOAT, exactly as XLA
    np.testing.assert_array_equal(np.asarray(hp.dist) < 1.0,
                                  np.asarray(hx.dist) < 1.0)
    assert (np.asarray(hp.dist)[~act] >= LARGE_FLOAT).all()
