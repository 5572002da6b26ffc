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


# ---------------------------------------------------------------------------
# The XLA CPU client segfaults deep into long multi-module runs (reproduced
# twice at the same test, which passes in isolation) — compiled-executable /
# buffer state accumulated across modules is the trigger. Dropping the jit
# caches between modules keeps the client healthy and bounds memory.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
