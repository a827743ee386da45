"""Device mesh + batch-sharding utilities."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "sharded_call", "pad_to_multiple", "BatchExecutor"]

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over (the first ``n_devices``) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def pad_to_multiple(arr, multiple: int, axis: int = 0):
    """Pad the batch axis up to a device-count multiple (NaN padding — padded rows
    read as failed samples and are dropped by the caller)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    fill = np.nan if np.issubdtype(np.asarray(arr).dtype, np.floating) else 0
    return np.pad(np.asarray(arr), pad, constant_values=fill), n


def shard_batch(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Device-put a pytree of (batch, ...)-arrays sharded over the mesh's batch axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_call(fn: Callable, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Wrap a batched jittable ``fn(batch_tree, *replicated_args)`` so its batch
    inputs/outputs are sharded over the mesh. XLA partitions the whole program
    SPMD; with a purely elementwise-over-batch model (our solver) there are no
    collectives at all — perfect weak scaling over ICI."""

    batch_sharding = NamedSharding(mesh, P(axis_name))

    def wrapper(batch_tree, *args, **kwargs):
        batch_tree = shard_batch(batch_tree, mesh, axis_name)
        with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _nullcontext():
            out = fn(batch_tree, *args, **kwargs)
        return out

    return wrapper


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return False


class BatchExecutor:
    """Drop-in for the reference's executor slot (``System.predict(executor=...)``,
    reference ``gen_data.py:448-460``): instead of fanning one subprocess per
    sample, it shards the whole batch over a mesh and runs one SPMD program.
    """

    def __init__(self, mesh: Optional[Mesh] = None, axis_name: str = BATCH_AXIS):
        self.mesh = mesh or make_mesh()
        self.axis_name = axis_name

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    def run(self, fn: Callable, batch_tree: dict, *args, **kwargs):
        n = None
        padded = {}
        for k, v in batch_tree.items():
            pv, n0 = pad_to_multiple(np.asarray(v), self.n_devices)
            padded[k] = pv
            n = n0 if n is None else n
        padded = shard_batch(padded, self.mesh, self.axis_name)
        out = fn(padded, *args, **kwargs)
        return jax.tree.map(lambda x: x[:n] if hasattr(x, "shape") and x.shape and x.shape[0] >= n else x, out)

    # executor-protocol compatibility shims (reference passes concurrent.futures
    # executors around; ours is synchronous SPMD)
    def map(self, fn, iterable):
        return [fn(x) for x in iterable]

    def shutdown(self, wait: bool = True):
        return None
