import numpy as np
import jax.numpy as jnp

from vortex_rt_tpu.utils import vecmath as vm
from vortex_rt_tpu.utils.image import rgb32f_to_rgb8, rmse, read_ppm, write_ppm


def test_dot_cross_normalize(rng):
    a = rng.standard_normal((64, 3)).astype(np.float32)
    b = rng.standard_normal((64, 3)).astype(np.float32)
    np.testing.assert_allclose(vm.dot(a, b), np.einsum("ij,ij->i", a, b), rtol=1e-5)
    np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-4, atol=1e-5)
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.length(n), np.ones(64), rtol=1e-5)
    # jax path produces the same values
    np.testing.assert_allclose(np.asarray(vm.cross(jnp.array(a), jnp.array(b))),
                               np.cross(a, b), rtol=1e-4, atol=1e-5)


def test_reflect():
    d = np.array([[1.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    np.testing.assert_allclose(vm.reflect(d, n), [[1.0, 1.0, 0.0]], atol=1e-6)


def test_mat4_roundtrip(rng):
    m = (
        vm.mat4_translate([1, 2, 3])
        @ vm.mat4_rotate([0, 1, 0], 0.7)
        @ vm.mat4_scale([2, 2, 2])
    )
    inv = vm.mat4_inverse(m)
    p = rng.standard_normal((16, 3)).astype(np.float32)
    q = vm.transform_point(m, p)
    np.testing.assert_allclose(vm.transform_point(inv, q), p, atol=1e-4)
    v = rng.standard_normal((16, 3)).astype(np.float32)
    w = vm.transform_vector(m, v)
    np.testing.assert_allclose(vm.transform_vector(inv, w), v, atol=1e-4)


def test_aabb_area():
    bmin = np.zeros(3, np.float32)
    bmax = np.array([2.0, 3.0, 4.0], np.float32)
    assert vm.aabb_area(bmin, bmax) == 2 * 3 + 3 * 4 + 4 * 2
    c = vm.aabb_corners(bmin, bmax)
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.min(0), bmin)
    np.testing.assert_allclose(c.max(0), bmax)


def test_ppm_roundtrip(tmp_path, rng):
    img = rng.random((7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.ppm")
    write_ppm(p, img)
    back = read_ppm(p)
    assert back.shape == (7, 5, 3)
    assert rmse(back.astype(np.float32) / 255.0, img) < 1.0 / 255.0
    assert rgb32f_to_rgb8(np.array([[[2.0, -1.0, 0.5]]])).tolist() == [[[255, 0, 127]]]
