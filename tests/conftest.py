"""Test harness config: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4 'distributed tests without a
cluster').

The environment's sitecustomize pre-imports jax and initializes the
default (TPU) backend before any test code runs, so setting env vars is
not enough — we must also reconfigure and clear the already-initialized
backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# NOTE: do not query devices before the config update — once a backend
# is initialized the platform choice latches and cannot be switched.
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb

xb._clear_backends()

assert jax.default_backend() == "cpu" and jax.device_count() >= 8, (
    f"test harness needs 8 virtual CPU devices, got "
    f"{jax.device_count()}x{jax.default_backend()}"
)
