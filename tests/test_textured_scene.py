"""Textured multi-material scene through the real asset path (VERDICT r2
next-round #8): the reference's shipped PNG textures (assets/*.png +
Sponza texture set) loaded via io.obj, pooled by Scene.build, sampled by
the wavefront engine — gated against the brute-force oracle on sampled
pixels at ladder scale (>= 100k tris)."""

import numpy as np
import pytest

from vortex_rt_tpu.engine.wavefront import WavefrontRenderer
from vortex_rt_tpu.golden.renderer import sample_pixel_parity
from vortex_rt_tpu.models import bigscenes
from vortex_rt_tpu.models.scene import RenderParams, Scene
from vortex_rt_tpu.utils.config import RTConfig


@pytest.fixture(scope="module")
def textured_sb():
    sc = Scene()
    for m, refl in bigscenes.textured_atrium(n_cols=6,
                                             target_tris=110_000):
        sc.add_instance(sc.add_mesh(m), reflectivity=refl)
    return sc.build()


def test_textured_scene_builds_real_textures(textured_sb):
    sb = textured_sb
    assert sb.num_tris >= 100_000
    # several distinct real textures in the pool (not one checker)
    offs = sb.mat_tex_offset[sb.mat_tex_offset >= 0]
    assert len(set(offs.tolist())) >= 3
    assert sb.texels.size > 4 * 64 * 64  # real PNGs, not 64x64 checkers
    # texel pool indices in range
    for o, w, h in zip(sb.mat_tex_offset, sb.mat_tex_w, sb.mat_tex_h):
        if o >= 0:
            assert o + w * h <= sb.texels.size


def test_textured_scene_parity(textured_sb):
    sb = textured_sb
    cam = Scene.framing_camera(sb, 45.0, 16 / 9)
    params = RenderParams(max_depth=2, spp=1, shadow=True)
    w, h = 192, 108
    r = WavefrontRenderer.from_buffers(sb, RTConfig(lanes=4096))
    img, _ = r.render(cam, params, w, h)
    assert np.isfinite(img).all()
    # image actually shows texture variation (not flat shading)
    assert float(img.std()) > 0.02
    err, worst, where = sample_pixel_parity(sb, cam, params, w, h, img,
                                            n=12, seed=3)
    assert err < 3e-3, f"textured parity rmse {err} (worst {worst} at {where})"


def test_textured_scene_bilinear(textured_sb):
    sb = textured_sb
    cam = Scene.framing_camera(sb, 45.0, 16 / 9)
    params = RenderParams(max_depth=1, spp=1)
    w, h = 96, 54
    rp = WavefrontRenderer.from_buffers(
        sb, RTConfig(lanes=4096, tex_filter="point"))
    rb = WavefrontRenderer.from_buffers(
        sb, RTConfig(lanes=4096, tex_filter="bilinear"))
    ip, _ = rp.render(cam, params, w, h)
    ib, _ = rb.render(cam, params, w, h)
    # bilinear filters real multi-texel textures -> images differ but
    # stay close in the mean
    d = float(np.abs(ip - ib).mean())
    assert 1e-5 < d < 0.2, d
