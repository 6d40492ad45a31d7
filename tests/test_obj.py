"""OBJ/MTL/texture loading tests (mesh.cpp / surface.cpp parity).

Includes an optional integration test against the reference's own teapot
asset (data, read-only) when the reference checkout is present.
"""

import os
import struct
import zlib

import numpy as np
import pytest

from vortex_rt_tpu.io.obj import load_mtl, load_obj, load_obj_scene, load_texture
from vortex_rt_tpu.models.scene import Camera, RenderParams, Scene
from vortex_rt_tpu.utils.image import write_ppm

REF_TEAPOT = "/root/reference/tests/regression/raytracing/assets/teapot.obj"


def _write_obj(path, text):
    with open(path, "w") as f:
        f.write(text)


def test_load_simple_obj(tmp_path):
    p = tmp_path / "tri.obj"
    _write_obj(p, """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
f 1 2 3
f 2/0/0 4 3
""".replace("/0/0", ""))
    m = load_obj(str(p))
    assert m.num_tris == 2
    np.testing.assert_allclose(m.v0[0], [0, 0, 0])
    # flat normals assigned
    np.testing.assert_allclose(np.abs(m.n0[:, 2]), 1.0, atol=1e-6)


def test_load_obj_quads_and_negative_indices(tmp_path):
    p = tmp_path / "quad.obj"
    _write_obj(p, """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f -4 -3 -2 -1
""")
    m = load_obj(str(p))
    assert m.num_tris == 2  # fan triangulation


def test_load_obj_with_normals_uvs(tmp_path):
    p = tmp_path / "full.obj"
    _write_obj(p, """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
""")
    m = load_obj(str(p))
    np.testing.assert_allclose(m.n0[0], [0, 0, 1])
    np.testing.assert_allclose(m.uv1[0], [1, 0])


def test_mtl_and_usemtl(tmp_path):
    _write_obj(tmp_path / "m.mtl", """
newmtl red
Kd 1 0 0
Ka 0.1 0 0
Ns 32
newmtl blue
Kd 0 0 1
""")
    p = tmp_path / "two.obj"
    _write_obj(p, """
mtllib m.mtl
v 0 0 0
v 1 0 0
v 0 1 0
usemtl red
f 1 2 3
usemtl blue
f 3 2 1
""")
    m = load_obj(str(p))
    assert len(m.materials) == 2
    assert m.materials[0].diffuse == (1.0, 0.0, 0.0)
    assert m.materials[0].shininess == 32
    assert m.materials[1].diffuse == (0.0, 0.0, 1.0)
    assert m.mat_id.tolist() == [0, 1]


def test_texture_ppm_and_png(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 255  # red
    ppm = tmp_path / "t.ppm"
    write_ppm(str(ppm), img)
    tex = load_texture(str(ppm))
    assert tex.shape == (4, 4)
    assert (tex == 0xFF0000).all()

    # minimal PNG (filter 0 rows)
    png = tmp_path / "t.png"
    raw = b""
    for y in range(2):
        raw += b"\x00" + bytes([10, 20, 30, 40, 50, 60])  # 2 rgb pixels
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    with open(png, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))
    tex = load_texture(str(png))
    assert tex.shape == (2, 2)
    assert tex[0, 0] == (10 << 16) | (20 << 8) | 30


def test_mtl_texture_binding(tmp_path):
    img = np.full((2, 2, 3), 128, np.uint8)
    write_ppm(str(tmp_path / "wood.ppm"), img)
    _write_obj(tmp_path / "m.mtl", """
newmtl wood
Kd 0.5 0.5 0.5
map_Kd wood.ppm
""")
    _write_obj(tmp_path / "t.obj", """
mtllib m.mtl
v 0 0 0
v 1 0 0
v 0 1 0
usemtl wood
f 1 2 3
""")
    m = load_obj(str(tmp_path / "t.obj"))
    assert m.materials[0].diffuse_tex is not None
    assert m.materials[0].diffuse_tex.shape == (2, 2)


@pytest.mark.skipif(not os.path.exists(REF_TEAPOT),
                    reason="reference assets not mounted")
def test_reference_teapot_renders():
    """Load the reference's own teapot asset and render a small frame
    end-to-end (golden path) — the raycast default regression config."""
    from vortex_rt_tpu.golden.renderer import render_golden

    sc = load_obj_scene(REF_TEAPOT)
    m = sc._meshes[0]
    assert m.num_tris > 1000
    sb = sc.build()
    cam = Scene.framing_camera(sb, 45.0, 1.0)
    img = render_golden(sb, cam, RenderParams(max_depth=1), 40, 32)
    assert np.isfinite(img).all()
    # the teapot must occupy a chunk of the frame (not all background)
    bg = np.asarray(RenderParams().background_color)
    fg = (np.abs(img - bg).max(-1) > 1e-3).mean()
    assert 0.05 < fg < 0.95


def test_faces_before_usemtl_get_default_material(tmp_path):
    _write_obj(tmp_path / "m.mtl", """
newmtl glass
Kd 0 0 1
""")
    _write_obj(tmp_path / "pre.obj", """
mtllib m.mtl
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
usemtl glass
f 3 2 1
""")
    m = load_obj(str(tmp_path / "pre.obj"))
    # face 0 gets the default gray material, not glass
    assert m.materials[m.mat_id[0]].diffuse == (0.8, 0.8, 0.8)
    assert m.materials[m.mat_id[1]].diffuse == (0.0, 0.0, 1.0)
