"""Test config: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the TPU-native substitute for a fake distributed backend — multi-chip
sharding tests run on a virtual CPU mesh (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax before this conftest runs, so the env
# var was already read — update the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# Tests run model.init/apply eagerly, so suite time is thousands of tiny
# op-by-op CPU compiles — each under the package default 1 s persistent
# cache threshold, so repeat runs recompiled everything. Cache them all:
# repeat suite runs then load from ~/.cache/glfusion_jax instead.
# (Import the package FIRST — its __init__ sets the threshold to 1 s and
# would overwrite this.)
import glfusion_tpu  # noqa: E402,F401

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
