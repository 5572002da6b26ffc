"""Test config: force an 8-device virtual CPU mesh before JAX backends initialize.

Multi-chip sharding tests run on this virtual mesh (SURVEY.md §4: the reference has no
cluster-free multi-node test path; we design one via xla_force_host_platform_device_count).

Note: the JAX_PLATFORMS env var is not honored in this environment (the experimental
'axon' TPU plugin still wins device selection and its teardown blocks interpreter exit
for ~80 s), so we must select the CPU backend via jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
