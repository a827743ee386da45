"""Multi-host (multi-process) distribution: ``jax.distributed`` over ICI/DCN.

The reference scales surrogate fitting across nodes with ``mpi4py.futures``
(reference ``pyproject.toml:33-34``, ``scripts/train.sh:122-124``); the
TPU-native equivalent (SURVEY.md §5.8) is single-program multi-data over a
global device mesh: every host runs the same program, arrays are sharded over
ALL devices in the job (ICI within a slice, DCN between slices), and XLA
inserts the collectives. There are no filesystem round-trips — cross-host
result gathers ride ``process_allgather``.

Typical SLURM/GKE usage::

    from hallthrusterpem_tpu.parallel import distributed as dist
    dist.initialize()                      # env-driven (SLURM/TPU metadata/JAX_* vars)
    mesh = dist.global_mesh()              # 1-D mesh over every device in the job
    local = dist.process_local_batch(params, mesh)   # this host's shard -> global arrays
    out = jax.jit(step, out_shardings=dist.batch_sharding(mesh))(local, ...)
    host_results = dist.gather_to_host(out)          # numpy on every host

A two-process CPU integration test lives in ``tests/test_distributed.py``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from hallthrusterpem_tpu.parallel.mesh import BATCH_AXIS

__all__ = [
    "initialize",
    "is_distributed",
    "global_mesh",
    "batch_sharding",
    "process_local_batch",
    "gather_to_host",
    "local_batch_slice",
]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, defers to ``jax.distributed.initialize()``'s automatic
    environment detection (TPU pod metadata, SLURM, Open MPI). Explicit
    arguments — or the ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` environment variables — override it (the pattern used by
    the two-process CPU integration test).
    """
    global _initialized
    if _initialized:
        return
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    cluster_env = coordinator_address is not None or any(
        os.environ.get(k) for k in ("SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not cluster_env:
        # plain single-process run: nothing to initialize
        _initialized = True
        return

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except (ValueError, RuntimeError):
        if coordinator_address is not None or num_processes is not None:
            raise  # the caller asked for a specific cluster — surface the failure
        # cluster-ish env vars without a resolvable coordinator (e.g. a
        # single-worker TPU VM that still sets TPU_WORKER_HOSTNAMES):
        # degrade to the single-process path
        pass
    _initialized = True


def is_distributed() -> bool:
    import jax

    return jax.process_count() > 1


def global_mesh(axis_name: str = BATCH_AXIS):
    """1-D mesh over every device in the job (all hosts). For multi-slice TPU
    jobs the device order groups slice-local (ICI) devices contiguously, so a
    batch-sharded program keeps its (nonexistent, for our elementwise-over-batch
    solver) collectives on ICI."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def batch_sharding(mesh, axis_name: str = BATCH_AXIS):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis_name))


def local_batch_slice(global_n: int) -> slice:
    """This process's contiguous row range of a ``global_n``-row batch."""
    import jax

    per = global_n // jax.process_count()
    if per * jax.process_count() != global_n:
        raise ValueError(
            f"global batch {global_n} must divide evenly over {jax.process_count()} processes"
        )
    start = per * jax.process_index()
    return slice(start, start + per)


def process_local_batch(tree, mesh, axis_name: str = BATCH_AXIS):
    """Build globally-sharded arrays from per-process local shards.

    Each process passes only ITS slice of the batch (rows
    ``local_batch_slice(global_n)``); the returned jax.Arrays are addressable
    shards of the global batch on this host plus metadata about the rest —
    exactly what a jitted SPMD program over the global mesh consumes.
    """
    import jax

    sharding = batch_sharding(mesh, axis_name)

    def to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(to_global, tree)


def gather_to_host(tree):
    """Fetch fully-replicated numpy copies of (possibly sharded) outputs on every
    host — the TPU-native replacement for the reference's pickle-file exchange
    between SLURM stages (SURVEY.md §5.8)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)
