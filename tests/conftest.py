"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on this virtual mesh (SURVEY.md §4: the reference has no
cluster-free multi-node test path; we design one via xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
