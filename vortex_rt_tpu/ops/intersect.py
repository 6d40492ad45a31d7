"""Device intersection primitives (JAX).

The traceRay math of the reference RT unit, vectorized over SoA ray batches:

* :func:`moller_trumbore` — sim/simx/rt_traversal.cpp:263-316 conventions:
  EPSILON=1e-6, reject |a|<eps, w1 in [0,1], w2>=0, w1+w2<=1, t>eps;
  barycentrics bx=w1 (vertex-1 weight), by=w2, bz=1-w1-w2.
* :func:`ray_aabb` — the slab test of rt_traversal.cpp:318-338: returns
  t_enter, hit iff t_exit >= t_enter and t_exit > 0 (a ray starting inside
  the box reports a negative t_enter and still hits).
* :func:`transform_ray` — the TLAS->BLAS object-space jump
  (rt_traversal.cpp:110-121, ray_transform :231-261): origin by the affine
  inverse, direction by the linear part, *unnormalized* so the t parameter
  is preserved across the transform.

Everything is shape-polymorphic over leading batch dims; no Python branching.
"""

from __future__ import annotations

import jax.numpy as jnp

from vortex_rt_tpu.utils.config import LARGE_FLOAT, MT_EPSILON


def dot(a, b):
    return (a * b).sum(-1)


def cross(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def moller_trumbore(o, d, v0, v1, v2, eps: float = MT_EPSILON):
    """Batched MT. Returns (t, w1, w2); t = LARGE_FLOAT on miss."""
    e1 = v1 - v0
    e2 = v2 - v0
    h = cross(d, e2)
    a = dot(e1, h)
    f = 1.0 / jnp.where(jnp.abs(a) < eps, 1.0, a)
    s = o - v0
    w1 = f * dot(s, h)
    q = cross(s, e1)
    w2 = f * dot(d, q)
    t = f * dot(e2, q)
    ok = (
        (jnp.abs(a) >= eps)
        & (w1 >= 0.0) & (w1 <= 1.0)
        & (w2 >= 0.0) & (w1 + w2 <= 1.0)
        & (t > eps)
    )
    return jnp.where(ok, t, LARGE_FLOAT), w1, w2


def ray_aabb(o, inv_d, bmin, bmax):
    """Slab test. Returns (t_enter, hit).  inv_d precomputed = 1/d."""
    t1 = (bmin - o) * inv_d
    t2 = (bmax - o) * inv_d
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    hit = (tmax >= tmin) & (tmax > 0.0)
    return jnp.where(hit, tmin, LARGE_FLOAT), hit


def transform_ray(inv_t, o, d):
    """Object-space ray: o by rows of inv_t against [o,1]; d by [d,0]."""
    rot = inv_t[..., :3, :3]
    lo = (rot * o[..., None, :]).sum(-1) + inv_t[..., :3, 3]
    ld = (rot * d[..., None, :]).sum(-1)
    return lo, ld


def safe_rcp(d, eps: float = 1e-20):
    """Reciprocal with sign-preserving clamp so axis-parallel rays behave
    like the reference's IEEE 1/0 = inf slab arithmetic."""
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
