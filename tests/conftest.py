"""Test env: CPU backend with 8 virtual devices for sharding tests.

jax may already be imported by sitecustomize, so env vars alone are not
enough — use jax.config.update before any backend initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
