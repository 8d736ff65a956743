"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware (the driver
separately dry-runs dryrun_multichip); bench.py uses the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
