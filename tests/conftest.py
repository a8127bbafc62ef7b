"""Test config: force an 8-device virtual CPU mesh before jax imports.

The reference has no distributed tests (SURVEY.md section 4); the TPU
build validates its multi-chip sharding on virtual CPU devices, per the
driver's dryrun contract.
"""

import os

# The session env pins JAX_PLATFORMS=axon (the tunneled TPU); tests run
# on a virtual 8-device CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache: XLA-CPU compiles are ~1s each here, and some
# special functions are pathologically slow; cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/legume_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
