"""Multi-host (DCN) scaling: process-spanning meshes + per-host data loading.

The reference has no distributed path at all (SURVEY.md §2.2); this is the
TPU-native design for scaling past one host:

  * **Axis layout.** Frame (data) parallelism is the only axis that crosses
    hosts: its collective traffic is one parameter-gradient all-reduce per
    step (Gaussians ~50 MB fp32 + MLPs ~5 MB), which DCN sustains easily,
    while tile (pixel) parallelism exchanges per-tile work lists every
    step and therefore must stay inside a host's ICI domain.
    ``make_host_mesh`` encodes exactly that: the DCN factor multiplies the
    'data' axis and the ICI factors fill ('data' within host, 'tile').
  * **Per-host input pipeline.** Each process loads ONLY its own shard of
    the frame batch from disk (``host_local_frames``) and assembles the
    global sharded batch with ``jax.make_array_from_process_local_data``
    (``global_batch``) — no host ever materializes the full global batch.
  * **Dry-run.** Everything here is a no-op reduction of the same code path
    when ``jax.process_count() == 1``, so the multi-host step is exercised
    by the virtual-device CPU mesh in tests and __graft_entry__'s
    ``dryrun_multichip`` without a cluster.

Launch recipe (N hosts, e.g. one v5e pod slice per host):

    JAX_COORDINATOR_ADDRESS=host0:9999 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
        python scripts/run_pipeline.py --dp auto ...

``init_distributed()`` picks these up (or the TPU pod runtime's own
metadata) and must run before any other JAX call on every host.
"""
from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> bool:
    """Initialize the JAX distributed runtime when launched multi-process.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (set
    by the launcher) and calls jax.distributed.initialize; on TPU pods with
    the runtime's own metadata available, initialize() needs no arguments.
    Returns True when a multi-process runtime was initialized. Safe to call
    unconditionally: single-process (or already-initialized) is a no-op.
    """
    if jax.process_count() > 1:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if not addr or not nproc or int(nproc) <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def make_host_mesh(
    data_per_host: int | None = None,
    tile: int = 1,
    devices: Sequence | None = None,
) -> Mesh:
    """Mesh spanning all processes: ('data', 'tile') with the host (DCN)
    factor folded into 'data' so only the gradient all-reduce crosses DCN.

    Device order: jax.devices() enumerates process 0's devices first, so
    reshaping to (hosts, per_host_data, tile) puts the host stride on the
    leading (slowest) 'data' positions — XLA then forms hierarchical
    all-reduces (ICI ring per host, DCN across hosts) for psum over 'data',
    and 'tile' collectives never leave a host.
    """
    devices = list(devices if devices is not None else jax.devices())
    hosts = max(jax.process_count(), 1)
    per_host = len(devices) // hosts
    if data_per_host is None:
        data_per_host = max(per_host // tile, 1)
    n = hosts * data_per_host * tile
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(hosts * data_per_host, tile)
    return Mesh(arr, axis_names=("data", "tile"))


def host_local_frames(frames: Sequence[Any], batch: int, step: int, seed: int = 0):
    """Deterministic per-host slice of the global frame batch for this step.

    All hosts derive the same global index list from (step, seed) and take
    their process's contiguous slice — no coordination traffic. ``batch`` is
    the GLOBAL batch size and must divide by process_count.
    """
    hosts = max(jax.process_count(), 1)
    assert batch % hosts == 0, f"global batch {batch} not divisible by {hosts} hosts"
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(step))
    idx = rng.choice(len(frames), size=batch, replace=len(frames) < batch)
    lo = (batch // hosts) * jax.process_index()
    return [frames[i] for i in idx[lo : lo + batch // hosts]], idx


def global_batch(local_tree: Any, mesh: Mesh):
    """Assemble the global data-sharded batch from this host's local stack.

    local_tree: pytree of arrays with leading axis = per-host batch. Returns
    the same pytree of global jax.Arrays sharded P('data') over ``mesh``,
    built from process-local shards (single-process: a plain device_put).
    """
    sh = NamedSharding(mesh, P("data"))
    if max(jax.process_count(), 1) == 1:
        return jax.tree.map(lambda a: jax.device_put(np.asarray(a), sh), local_tree)

    def mk(a):
        a = np.asarray(a)
        gshape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        return jax.make_array_from_process_local_data(sh, a, gshape)

    return jax.tree.map(mk, local_tree)
