"""Test harness config.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the analog of the reference running the same
app across simx/rtlsim backends via VORTEX_DRIVER, raytracing/Makefile:127-130).
Must set XLA flags before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon TPU plugin ignores the env var; force the platform explicitly
jax.config.update("jax_platforms", "cpu")

# drop the axon remote-TPU factory entirely (it is registered by
# sitecustomize at interpreter start): when the TPU tunnel is down its
# backend init sleeps in a dial-retry loop and wedges even cpu-only jax
# use, which would hang the whole suite
try:  # noqa: SIM105
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compile cache: the suite compiles dozens of big traversal
# programs (minutes each cold on this 1-CPU box); identical HLO on later
# runs loads from disk instead (utils/cache.py — same mechanism the TPU
# bench uses)
from vortex_rt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
