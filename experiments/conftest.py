"""Pin the experiments tests to CPU (interpreter-mode Pallas), mirroring
tests/conftest.py — the axon sitecustomize would otherwise route these
kernel parity tests onto the remote TPU tunnel."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import glfusion_tpu  # noqa: E402,F401

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
