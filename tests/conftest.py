"""Test harness config: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4 'distributed tests without a
cluster')."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
