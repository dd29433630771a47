"""Test configuration: force the CPU backend with 8 virtual devices so
mesh/sharding tests run without TPU hardware (mirrors the driver's
dryrun_multichip harness).

Note: the session's sitecustomize pre-imports jax and registers the axon TPU
plugin before pytest starts, so env vars alone are not enough — the jax config
must be updated directly (backends are not initialized yet at conftest time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Full fp32 matmul precision for parity tests.
jax.config.update("jax_default_matmul_precision", "highest")
