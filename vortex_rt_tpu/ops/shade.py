"""Device shading ops (JAX) — the SBT shader bodies, vectorized.

The reference dispatches per-ray shaders through a shader binding table
(miss/closest/anyhit flat binaries, tests/regression/raytracing/shaders/);
each shader is scalar C++ over one rayID.  Here each shader body is a
batched function over hit SoA lanes — the data-parallel equivalent, with
identical math:

* normal/uv interpolation + inverse-transpose normal transform
  (shaders/closest.cpp:70-78)
* point-sampled wrap-addressed texturing (rtx_shading.h texSample) over a
  single packed texel pool (one gather)
* attenuated diffuse lighting (rtx_shading.h diffuseLighting)
* reflectivity split: radiance += T*(1-r)*diffuse; throughput *= r; bounce
  (shaders/closest.cpp:88-126 / raycast/render.h:210-276)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vortex_rt_tpu.ops.intersect import dot


class ShadeResult(NamedTuple):
    diffuse: jnp.ndarray      # (R, 3) local diffuse contribution
    reflectivity: jnp.ndarray  # (R,) instance reflectivity
    new_o: jnp.ndarray        # (R, 3) bounce ray origin
    new_d: jnp.ndarray        # (R, 3) bounce ray direction
    normal: jnp.ndarray       # (R, 3) shading normal (for debugging/AOVs)


def _normalize(v, eps=1e-20):
    return v * jnp.reciprocal(jnp.sqrt(dot(v, v) + eps))[..., None]


def rgb8_to_rgb32f(texel: jnp.ndarray) -> jnp.ndarray:
    """0xRRGGBB uint32 -> float3 with the reference's 1/256 scale."""
    t = texel.astype(jnp.uint32)
    s = jnp.float32(1.0 / 256.0)
    return jnp.stack(
        [((t >> 16) & 255).astype(jnp.float32),
         ((t >> 8) & 255).astype(jnp.float32),
         (t & 255).astype(jnp.float32)], axis=-1
    ) * s


def tex_sample(uv, mat, texels, tex_offset, tex_w, tex_h, mat_diffuse):
    """Point sample with wrap addressing; falls back to mat diffuse color."""
    w = tex_w[mat]
    h = tex_h[mat]
    off = tex_offset[mat]
    has = off >= 0
    ws = jnp.maximum(w, 1)
    hs = jnp.maximum(h, 1)
    iu = jnp.floor(uv[..., 0] * ws).astype(jnp.int32) % ws
    iv = jnp.floor(uv[..., 1] * hs).astype(jnp.int32) % hs
    idx = jnp.where(has, off + iu + iv * ws, 0)
    color = rgb8_to_rgb32f(texels[idx])
    return jnp.where(has[..., None], color, mat_diffuse[mat])


def diffuse_lighting(p, n, diffuse_color, ambient, light_color, light_pos):
    """rtx_shading.h:58-70: att = 1/(1 + 0.1*dist), N.L clamped."""
    l = light_pos - p
    dist = jnp.sqrt(dot(l, l) + 1e-20)
    l = l / dist[..., None]
    att = 1.0 / (1.0 + dist * 0.1)
    ndotl = jnp.maximum(0.0, dot(n, l))
    return diffuse_color * (ambient + att[..., None] * light_color * ndotl[..., None])


def closest_hit_shade(sb, o, d, dist, bx, by, bz, tri, inst,
                      ambient, light_color, light_pos) -> ShadeResult:
    """The closest-hit shader body over a batch.  ``sb`` is a device
    SceneBuffers pytree (jnp arrays).  Lanes that missed produce garbage the
    caller masks out (dist should be pre-clamped to something finite)."""
    p = o + d * dist[..., None]
    n = (sb.n1[tri] * bx[..., None] + sb.n2[tri] * by[..., None]
         + sb.n0[tri] * bz[..., None])
    rot = sb.inst_inv_transpose[inst][..., :3, :3]
    n = _normalize((rot * n[..., None, :]).sum(-1))

    uv = (sb.uv1[tri] * bx[..., None] + sb.uv2[tri] * by[..., None]
          + sb.uv0[tri] * bz[..., None])
    mat = sb.mat_id[tri]
    color = tex_sample(uv, mat, sb.texels, sb.mat_tex_offset,
                       sb.mat_tex_w, sb.mat_tex_h, sb.mat_diffuse)
    diffuse = diffuse_lighting(p, n, color, ambient, light_color, light_pos)
    refl = sb.inst_reflectivity[inst]
    r = _normalize(d - 2.0 * dot(n, d)[..., None] * n)
    return ShadeResult(
        diffuse=diffuse, reflectivity=refl,
        new_o=p + r * 1e-3, new_d=r, normal=n,
    )
