"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 item 4).

Note: the environment may pin JAX_PLATFORMS to a TPU platform, so we
override via jax.config (must happen before any backend is initialized).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
