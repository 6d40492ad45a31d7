"""Counter-based sampler: np/jnp bit-parity + distribution sanity.

The entire path-tracing fidelity story rests on utils.sampling producing
IDENTICAL bits under NumPy (golden oracle) and jnp (device), so the
oracle replays the device's exact light paths (no in-expectation
comparisons)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vortex_rt_tpu.utils import sampling as S


@pytest.mark.parametrize("smp,bnc,seed,dim", [
    (0, 0, 0, 0), (3, 2, 7, 1), (123456, 9, 42, 5),
])
def test_sample2_bit_parity(smp, bnc, seed, dim):
    pix = np.arange(20000, dtype=np.uint32)
    a = S.sample2(np, pix, smp, bnc, seed, dim)
    b = S.sample2(jnp, jnp.asarray(pix), smp, bnc, seed, dim)
    assert np.array_equal(a[0], np.asarray(b[0]))
    assert np.array_equal(a[1], np.asarray(b[1]))


def test_jitter_bit_parity_and_strata():
    pix = np.arange(4096, dtype=np.uint32)
    smp = (np.arange(4096) % 4).astype(np.uint32)
    jx, jy = S.stratified_jitter(np, pix, smp, 4, 1)
    j2 = S.stratified_jitter(jnp, jnp.asarray(pix), jnp.asarray(smp), 4, 1)
    assert np.array_equal(jx, np.asarray(j2[0]))
    assert np.array_equal(jy, np.asarray(j2[1]))
    # sample s must land in stratum cell s of the 2x2 grid
    assert (jx[smp == 0] < 0.5).all() and (jy[smp == 0] < 0.5).all()
    assert (jx[smp == 3] >= 0.5).all() and (jy[smp == 3] >= 0.5).all()


def test_uniformity():
    u, v = S.sample2(np, np.arange(200000, dtype=np.uint32), 0, 0, 0)
    for x in (u, v):
        assert 0.0 <= x.min() and x.max() < 1.0
        assert abs(x.mean() - 0.5) < 2e-3
        # no duplicated low-entropy structure
        assert np.unique((x * 4096).astype(int)).size == 4096
    # distinct dims decorrelate
    w, _ = S.sample2(np, np.arange(200000, dtype=np.uint32), 0, 0, 0, dim=1)
    assert abs(np.corrcoef(u, w)[0, 1]) < 5e-3


def test_cosine_hemisphere():
    n = 200000
    u1, u2 = S.sample2(np, np.arange(n, dtype=np.uint32), 0, 0, 9)
    for nrm in ([0, 0, 1], [0.3, -0.5, -0.8], [0, -1, 0]):
        nrm = np.asarray(nrm, np.float32)
        nrm /= np.linalg.norm(nrm)
        nx = np.full(n, nrm[0], np.float32)
        ny = np.full(n, nrm[1], np.float32)
        nz = np.full(n, nrm[2], np.float32)
        dx, dy, dz = S.cosine_hemisphere(np, nx, ny, nz, u1, u2)
        ln = np.sqrt(dx * dx + dy * dy + dz * dz)
        assert np.allclose(ln, 1.0, atol=1e-4)
        c = dx * nrm[0] + dy * nrm[1] + dz * nrm[2]
        assert (c >= -1e-6).all()            # in the upper hemisphere
        assert abs(c.mean() - 2.0 / 3.0) < 3e-3   # E[cos] = 2/3
    # jnp matches np bit-for-bit on the same inputs is NOT required for
    # directions (fp contraction may differ per backend); the integrator
    # tolerance test (test_pathtrace) covers end-to-end agreement.
