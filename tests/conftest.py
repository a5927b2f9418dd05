"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding logic is exercised on a fake 8-device CPU mesh
(xla_force_host_platform_device_count), so tests need no TPU hardware and
never touch the (single) real chip.

On-chip tier (VERDICT r2 item 4): ``RIGGS_TPU_TESTS=1 pytest -m tpu -p
no:xdist -n0`` keeps the real axon device and runs the ``tpu``-marked tests
(Mosaic lowering legality, VMEM scoped limits, on-chip parity) — one process
at a time (two TPU processes wedge the tunnel). Without the env var,
``tpu``-marked tests are auto-skipped and everything runs on the CPU mesh.
"""
import os

TPU_TIER = os.environ.get("RIGGS_TPU_TESTS") == "1"

os.environ.setdefault("JAX_ENABLE_X64", "0")
if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not TPU_TIER:
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" at jax
    # import, overriding the env var; undo that so tests run on the virtual
    # CPU mesh and never touch the real chip.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: compile-heavy smoke tests (stage-1/2 trainers)
# pay XLA:CPU compile cost once per source change instead of once per run.
# The tpu tier shares bench.py's chip-side cache.
from pathlib import Path

_cache = ".jax_cache" if TPU_TIER else ".jax_cache_cpu"
jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parent.parent / _cache)
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

# Heaviest files first: under xdist --dist loadfile, files are handed to
# workers in collection order, so dispatching the multi-minute training
# smokes early keeps the critical path near total/n_workers instead of
# serializing a heavy file at the end.
_HEAVY_FILES = [
    "test_stage1.py",
    "test_train_static.py",
    "test_parallel.py",
    "test_more_models.py",
    "test_pallas_blend.py",
    "test_render.py",
]


# Seconds-scale files auto-marked `fast`: pure math / protocol / reader units
# with no training loops and no Pallas compiles. `pytest -m fast` gives a
# <60s smoke signal.
_FAST_FILES = {
    "test_skeleton.py",
    "test_edit.py",
    "test_more_readers.py",
    "test_sibr.py",
    "test_anim_se3.py",
}


def pytest_collection_modifyitems(config, items):
    rank = {name: i for i, name in enumerate(_HEAVY_FILES)}
    items.sort(key=lambda it: rank.get(it.path.name, len(_HEAVY_FILES)))
    skip_tpu = pytest.mark.skip(
        reason="real-chip test; set RIGGS_TPU_TESTS=1 (and run -m tpu -n0)"
    )
    for it in items:
        if it.path.name in _FAST_FILES:
            it.add_marker(pytest.mark.fast)
        if not TPU_TIER and "tpu" in it.keywords:
            it.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
