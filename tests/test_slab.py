"""Bit-identity gate for the frame-slab size (RTConfig.slab).

The streamed slab-major frame (engine/wavefront.py frame_body) maps the
wave pipeline over ``slab``-lane groups; the slab size sets the
while-loop GATHER BATCH (B = slab/bounce_packet packets walk per
iteration) and is the rule-33 latency-amortization lever — it must
never change the image.  Rays never move between lanes and each slab's
waves are independent, so any slab partition of the pool computes the
identical radiance lanes.
"""
import numpy as np
import pytest

from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.models.procedural import cornell_box
from vortex_rt_tpu.models.scene import RenderParams, Scene
from vortex_rt_tpu.utils.config import RTConfig


@pytest.fixture(scope="module")
def flat_scene():
    sc = Scene()
    for mesh, refl in cornell_box():
        sc.add_instance(sc.add_mesh(mesh), reflectivity=refl)
    return sc.build(RTConfig(flatten=True))


@pytest.mark.parametrize("pathtrace", [False, True])
def test_slab_bit_identical(flat_scene, pathtrace):
    cam = Scene.framing_camera(flat_scene, 45.0, 1.0)
    params = RenderParams(max_depth=3, spp=2, shadow=True,
                          pathtrace=pathtrace)
    imgs = []
    # 48x48 = 2304 pixels: 32768 -> whole-pool path, 1024 -> 3 slabs
    # (padded tail), 512 -> 5 slabs; fronts=2 rides along so the
    # multi-front walk is exercised across slab partitions too
    for slab in (32768, 1024, 512):
        r = WavefrontRenderer.from_buffers(
            flat_scene, RTConfig(flatten=True, slab=slab, bounce_fronts=2))
        img, _ = r.render(cam, params, 48, 48)
        imgs.append(np.asarray(img))
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_array_equal(imgs[0], imgs[2])
