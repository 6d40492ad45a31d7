"""End-to-end: megakernel device render vs golden CPU render (RMSE).

This is the framework's analog of the reference's host-vs-device image
comparison (raycast -c golden strategy) with the BASELINE.json fidelity bar
(RMSE <= 1e-3 on matched scenes).
"""

import numpy as np

from vortex_rt_tpu.engine.megakernel import (
    CameraArrays, MegakernelRenderer, generate_camera_rays,
)
from vortex_rt_tpu.golden.renderer import render_golden
from vortex_rt_tpu.models.procedural import (
    checkerboard_texture, cornell_box, quad, uv_sphere,
)
from vortex_rt_tpu.models.scene import Camera, Material, RenderParams, Scene
from vortex_rt_tpu.utils.image import rmse


def _device_rays(cam, w, h):
    o, d = generate_camera_rays(CameraArrays.from_camera(cam), w, h)
    return np.asarray(o), np.asarray(d)


def _cornell_scene():
    sc = Scene()
    for mesh, refl in cornell_box():
        i = sc.add_mesh(mesh)
        sc.add_instance(i, reflectivity=refl)
    return sc


def test_megakernel_matches_golden_primary():
    sc = _cornell_scene()
    sb = sc.build()
    r = MegakernelRenderer.from_buffers(sb)
    cam = Camera.look_at([0.11, 0.07, -3.2], [0.02, -0.01, 0], [0, 1, 0], 45.0, 1.0)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=1)
    img_dev, nrays = r.render(cam, params, 48, 48)
    img_gold = render_golden(sb, cam, params, 48, 48, rays=_device_rays(cam, 48, 48))
    assert nrays == 48 * 48
    assert rmse(np.clip(img_dev, 0, 1), np.clip(img_gold, 0, 1)) <= 1e-3


def test_megakernel_aligned_camera_seam_tolerance():
    """Axis-aligned symmetric camera: rays graze exact wall seams, where two
    surfaces intersect at the *identical* distance.  Which one wins can flip
    with last-ULP direction changes across compilation boundaries (XLA FMA
    fusion), so only isolated seam pixels may differ — never more."""
    sc = _cornell_scene()
    sb = sc.build()
    r = MegakernelRenderer.from_buffers(sb)
    cam = Camera.look_at([0, 0, -3.2], [0, 0, 0], [0, 1, 0], 45.0, 1.0)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=1)
    img_dev, _ = r.render(cam, params, 48, 48)
    img_gold = render_golden(sb, cam, params, 48, 48, rays=_device_rays(cam, 48, 48))
    bad = (np.abs(img_dev - img_gold).max(-1) > 1e-4)
    assert bad.mean() < 0.01  # <1% seam pixels


def test_megakernel_matches_golden_bounces():
    sc = _cornell_scene()
    sb = sc.build()
    r = MegakernelRenderer.from_buffers(sb)
    cam = Camera.look_at([0.11, 0.07, -3.2], [0.02, -0.01, 0], [0, 1, 0], 45.0, 1.0)
    params = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=3)
    img_dev, nrays = r.render(cam, params, 40, 40)
    img_gold = render_golden(sb, cam, params, 40, 40, rays=_device_rays(cam, 40, 40))
    assert nrays > 40 * 40  # secondary rays happened
    assert rmse(np.clip(img_dev, 0, 1), np.clip(img_gold, 0, 1)) <= 1e-3


def test_megakernel_textured():
    tex = checkerboard_texture(8, 0xFFFFFF, 0x303030, cell=3)
    sc = Scene()
    sc.add_mesh(quad((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0),
                     Material(diffuse_tex=tex)))
    sc.add_mesh(uv_sphere((0, 0.2, -0.8), 0.35, 10, 14,
                          Material(diffuse=(0.9, 0.4, 0.2))))
    sb = sc.build()
    r = MegakernelRenderer.from_buffers(sb)
    cam = Camera.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0], 45.0, 1.0)
    params = RenderParams(light_pos=(1, 2, -3), max_depth=2)
    img_dev, _ = r.render(cam, params, 56, 56)
    img_gold = render_golden(sb, cam, params, 56, 56, rays=_device_rays(cam, 56, 56))
    assert rmse(np.clip(img_dev, 0, 1), np.clip(img_gold, 0, 1)) <= 1e-3


def test_megakernel_spp_antialiasing():
    sc = _cornell_scene()
    r = MegakernelRenderer.from_scene(sc)
    cam = Camera.look_at([0.11, 0.07, -3.2], [0.02, -0.01, 0], [0, 1, 0], 45.0, 1.0)
    p1 = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=1, spp=1)
    p4 = RenderParams(light_pos=(0, 0.8, -0.5), max_depth=1, spp=4)
    i1, n1 = r.render(cam, p1, 24, 24)
    i4, n4 = r.render(cam, p4, 24, 24)
    assert n4 == 4 * n1
    assert np.isfinite(i4).all()
    # multi-sample image differs (jitter) but only slightly
    delta = np.abs(i1 - i4).mean()
    assert 0 < delta < 0.2
