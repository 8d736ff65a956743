"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware (the driver
separately dry-runs dryrun_multichip); bench.py uses the real chip.

NOTE: the axon TPU plugin force-sets jax_platforms="axon,cpu" at registration,
overriding the JAX_PLATFORMS env var — jax.config.update after import is the only
way to pin CPU here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
