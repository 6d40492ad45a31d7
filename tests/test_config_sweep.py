"""Config sweeps: the analog of the reference CI's config1()/config2()
suites (ci/regression.sh.in:210-354), which re-run the apps across
cores/warps/threads/cache combinations.  Here we sweep the RTConfig knobs
that change compiled code paths and assert image parity with the golden
renderer for each.
"""

import numpy as np
import pytest

from vortex_rt_tpu.engine.megakernel import CameraArrays, generate_camera_rays
from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.golden.renderer import render_golden
from vortex_rt_tpu.models.procedural import cornell_box
from vortex_rt_tpu.models.scene import Camera, RenderParams, Scene
from vortex_rt_tpu.utils.config import RTConfig, from_overrides
from vortex_rt_tpu.utils.image import rmse

SWEEP = [
    RTConfig(lanes=64),                      # tiny chunks, many of them
    RTConfig(lanes=512),
    RTConfig(lanes=512, max_leaf_tris=1),    # single-tri leaves
    RTConfig(lanes=512, max_leaf_tris=8),    # fat leaves
    RTConfig(lanes=512, sah_bins=4),
    RTConfig(lanes=512, sah_bins=16, use_native_build=False),
]


def _scene():
    sc = Scene()
    for mesh, refl in cornell_box():
        i = sc.add_mesh(mesh)
        sc.add_instance(i, reflectivity=refl)
    return sc


@pytest.mark.parametrize("cfg", SWEEP, ids=lambda c: (
    f"lanes{c.lanes}-leaf{c.max_leaf_tris}-bins{c.sah_bins}"
    f"-{'native' if c.use_native_build else 'py'}"))
def test_config_sweep_image_parity(cfg):
    sc = _scene()
    sb = sc.build(cfg)
    r = WavefrontRenderer.from_buffers(sb, cfg)
    cam = Camera.look_at([0.11, 0.07, -3.2], [0.02, -0.01, 0], [0, 1, 0],
                         45.0, 1.0)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=2)
    img, _ = r.render(cam, params, 20, 20)
    o, d = generate_camera_rays(CameraArrays.from_camera(cam), 20, 20)
    gold = render_golden(sb, cam, params, 20, 20,
                         rays=(np.asarray(o), np.asarray(d)))
    assert rmse(np.clip(img, 0, 1), np.clip(gold, 0, 1)) <= 2e-3, cfg


def test_config_overrides():
    cfg = from_overrides(lanes=128, max_depth=5)
    assert cfg.lanes == 128 and cfg.max_depth == 5
    assert RTConfig().lanes == 32768  # defaults untouched
