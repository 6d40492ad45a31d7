import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
N, R = 2048, 1024

# 1) simple 1-D VMEM table gather
tbl1 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, R).astype(np.int32))

def k1(tbl_ref, idx_ref, out_ref):
    out_ref[:] = tbl_ref[idx_ref[:]]

try:
    out = pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl1, idx)
    ref = np.asarray(tbl1)[np.asarray(idx)]
    print("1-D gather: OK, correct:", np.allclose(np.asarray(out), ref), flush=True)
except Exception as e:
    print("1-D gather FAILED:", str(e)[:300], flush=True)

# 2) row gather from (N,16)
tbl2 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))

def k2(tbl_ref, idx_ref, out_ref):
    out_ref[:] = tbl_ref[idx_ref[:], :]

try:
    out = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((R, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl2, idx)
    ref = np.asarray(tbl2)[np.asarray(idx)]
    print("row gather: OK, correct:", np.allclose(np.asarray(out), ref), flush=True)
except Exception as e:
    print("row gather FAILED:", str(e)[:300], flush=True)

# 3) jnp.take inside kernel
def k3(tbl_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

try:
    out = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl1, idx)
    ref = np.asarray(tbl1)[np.asarray(idx)]
    print("jnp.take gather: OK, correct:", np.allclose(np.asarray(out), ref), flush=True)
except Exception as e:
    print("jnp.take FAILED:", str(e)[:300], flush=True)

# 4) dependent gather loop (traversal pattern) with fori_loop
tbl4 = jnp.asarray(rng.integers(0, N, N).astype(np.int32))

def k4(tbl_ref, idx_ref, out_ref):
    def body(i, c):
        return tbl_ref[c]
    out_ref[:] = jax.lax.fori_loop(0, 50, body, idx_ref[:])

try:
    t0 = time.perf_counter()
    f = jax.jit(lambda t, i: pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((R,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    out = f(tbl4, idx); jax.block_until_ready(out)
    print("dep-gather loop: OK, compile+run", round(time.perf_counter()-t0, 2), flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(tbl4, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/20/50
    print(f"dep-gather loop: {dt*1e6:.2f} us/step for R={R}", flush=True)
    # correctness
    c = np.asarray(idx)
    tb = np.asarray(tbl4)
    for _ in range(50):
        c = tb[c]
    print("dep-gather correct:", np.array_equal(np.asarray(out), c), flush=True)
except Exception as e:
    print("dep-gather FAILED:", str(e)[:300], flush=True)
