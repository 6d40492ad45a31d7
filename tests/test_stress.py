"""Scale/stress gates the r1 VERDICT flagged as missing (weak #9):
trees deeper than 31 trail levels, and >=10^5 rays against the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from vortex_rt_tpu.golden.renderer import brute_force_hits
from vortex_rt_tpu.models.scene import Scene, make_mesh
from vortex_rt_tpu.ops.traverse_packet import trace_packets
from vortex_rt_tpu.ops.traverse_wide import WideArrays
from vortex_rt_tpu.utils.config import LARGE_FLOAT


def _comb_mesh(n: int = 600, growth: float = 1.1):
    """Exponentially SPACED triangles along +x: every binned-SAH split
    peels only the far tail off (most triangles always cluster in the
    first bin), producing a comb-shaped tree whose depth grows with n —
    the adversarial case for the restart trail."""
    x0 = np.cumsum(growth ** np.arange(n).astype(np.float64))
    x0 = x0.astype(np.float32)
    v0 = np.stack([x0, np.zeros(n), np.zeros(n)], 1).astype(np.float32)
    v1 = np.stack([x0 + 0.5, np.zeros(n), np.zeros(n)], 1)
    v2 = np.stack([x0, np.full(n, 0.5), np.zeros(n)], 1)
    return make_mesh(v0, v1.astype(np.float32), v2.astype(np.float32))


def test_deep_tree_beyond_31_levels():
    from vortex_rt_tpu.utils.config import RTConfig

    sc = Scene()
    sc.add_mesh(_comb_mesh())
    sb = sc.build(RTConfig(max_leaf_tris=1))
    wa = WideArrays.from_scene(sb)
    assert wa.depth > 31, wa.depth  # deeper than the reference's 32-level
    # trail budget midpoint — exercises the 64-level bit-packed trail
    rng = np.random.default_rng(0)
    r = 256
    # rays target the near (fp-sane) part of the comb; far triangles sit
    # at huge x and are never hit, but their nodes shape the deep tree
    # aim each ray at a point ON a near tooth (tri i spans x0[i]..x0[i]+.5,
    # y 0..0.5 at z=0) so most rays genuinely hit the deep comb
    ti = rng.integers(0, 40, r)
    x0 = np.cumsum(1.1 ** np.arange(600).astype(np.float64)).astype(
        np.float32)
    tx = x0[ti] + rng.uniform(0.05, 0.3, r) * 0.5
    ty = rng.uniform(0.05, 0.3, r)
    o = np.stack([tx + rng.normal(0, 0.2, r), ty + rng.normal(0, 0.1, r),
                  np.full(r, 3.0)], 1).astype(np.float32)
    d = np.stack([tx, ty, np.zeros(r)], 1).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hits, steps = trace_packets(wa, jnp.asarray(o), jnp.asarray(d),
                                packet=64)
    ref = brute_force_hits(o, d, sb)
    got = np.asarray(hits.dist)
    np.testing.assert_array_equal(got < LARGE_FLOAT,
                                  ref["dist"] < LARGE_FLOAT)
    h = ref["dist"] < LARGE_FLOAT
    assert h.sum() > 100  # the test actually hits the comb
    np.testing.assert_allclose(got[h], ref["dist"][h], rtol=2e-4)


@pytest.mark.slow
def test_100k_rays_vs_oracle(rng):
    """10^5 rays through a 2k-tri soup: packet engine vs brute force."""
    from vortex_rt_tpu.models.procedural import random_soup

    sc = Scene()
    sc.add_mesh(random_soup(rng, 2000))
    sb = sc.build()
    wa = WideArrays.from_scene(sb)
    r = 102_400
    o = rng.uniform(-14, 14, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hits, steps = trace_packets(wa, jnp.asarray(o), jnp.asarray(d),
                                packet=128)
    ref = brute_force_hits(o, d, sb, chunk=2048)
    got = np.asarray(hits.dist)
    np.testing.assert_array_equal(got < LARGE_FLOAT,
                                  ref["dist"] < LARGE_FLOAT)
    h = ref["dist"] < LARGE_FLOAT
    # at 10^5 rays a handful of near-tie winners legitimately differ by
    # last-ULP guarded-reciprocal order; gate the FRACTION of outliers
    rel = np.abs(got[h] - ref["dist"][h]) / np.maximum(ref["dist"][h], 1e-6)
    assert (rel > 1e-3).mean() < 1e-3, (rel.max(), (rel > 1e-3).sum())
    # hit attribution (same (inst, tri) winners modulo fp ties)
    same = (np.asarray(hits.tri) == ref["tri"]) | ~h
    assert same.mean() > 0.999
