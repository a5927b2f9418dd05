"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding logic is exercised on a fake 8-device CPU mesh
(xla_force_host_platform_device_count), so tests need no TPU hardware and
never touch the (single) real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at jax import,
# overriding the env var; undo that so tests run on the virtual CPU mesh and
# never touch the real chip.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: compile-heavy smoke tests (stage-1/2 trainers)
# pay XLA:CPU compile cost once per source change instead of once per run.
from pathlib import Path

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
