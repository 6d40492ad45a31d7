"""Profiling scratch: shade_point cost + gather strategy variants."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vortex_rt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from tools._ppack import build_scene  # noqa: E402
from vortex_rt_tpu.ops.shade_lanes import ShadeArrays, shade_point  # noqa

R = 262144


def timeit(f, n=10, label=""):
    out = f(0)
    _ = np.asarray(jax.tree.leaves(out)[-1]).reshape(-1)[:1]
    t0 = time.perf_counter()
    outs = [f(i) for i in range(n)]
    _ = np.asarray(jax.tree.leaves(outs[-1])[-1]).reshape(-1)[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    sb = build_scene()
    sa = ShadeArrays.from_scene(sb)
    t_n = sa.shade_rows.shape[0]
    print("tris", t_n, "mats", sa.mat_rows.shape[0], flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    tri = jax.random.randint(ks[0], (R,), 0, t_n)
    inst = jax.random.randint(ks[1], (R,), 0, sa.inst_shade.shape[0])
    f = [jax.random.uniform(ks[2 + i], (R,)) for i in range(6)]
    bx = jax.random.uniform(ks[0], (R,)) * 0.3
    by = jax.random.uniform(ks[1], (R,)) * 0.3

    @jax.jit
    def sp_full(seed):
        s = shade_point(sa, f[0], f[1], f[2], f[3], f[4], f[5],
                        f[0] + seed, bx, by, 1 - bx - by, tri, inst)
        return s.nx.sum() + s.color_r.sum() + s.px.sum()

    timeit(sp_full, 10, "shade_point full")

    @jax.jit
    def g_row(seed):
        row = sa.shade_rows[tri + seed * 0]
        return sum(row[:, i].sum() for i in range(16))

    timeit(g_row, 10, "row gather + 16 col extracts")

    @jax.jit
    def g_rowT(seed):
        rowt = sa.shade_rows[tri + seed * 0].T
        return sum(rowt[i].sum() for i in range(16))

    timeit(g_rowT, 10, "row gather + transpose + row slices")

    @jax.jit
    def g_onehot(seed):
        oh = jax.nn.one_hot(tri + seed * 0, t_n, dtype=jnp.bfloat16)
        row = jnp.dot(oh, sa.shade_rows.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return sum(row[:, i].sum() for i in range(16))

    timeit(g_onehot, 10, "one-hot bf16 matmul gather")

    @jax.jit
    def g_onehot_f32(seed):
        oh = jax.nn.one_hot(tri + seed * 0, t_n, dtype=jnp.float32)
        row = jnp.dot(oh, sa.shade_rows,
                      preferred_element_type=jnp.float32)
        return sum(row[:, i].sum() for i in range(16))

    timeit(g_onehot_f32, 10, "one-hot f32 matmul gather")

    @jax.jit
    def g_texel(seed):
        idx = jnp.clip(tri + seed * 0, 0, sa.texels.shape[0] - 1)
        return sa.texels[idx].sum()

    timeit(g_texel, 10, "texel element gather")


if __name__ == "__main__":
    main()
