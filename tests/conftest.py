"""Test config: force an 8-device virtual CPU mesh.

The session environment pins JAX to the tunneled TPU (axon plugin via
sitecustomize, which APPENDS "axon" to jax_platforms — a plain
JAX_PLATFORMS=cpu env var is overridden). Forcing through
`jax.config.update` before any backend initialization wins. Tests run
on 8 virtual CPU devices so multi-chip sharding paths execute
(`--xla_force_host_platform_device_count`), per the driver's dryrun
contract; the real-TPU path is exercised by bench.py / __graft_entry__.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/legume_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
