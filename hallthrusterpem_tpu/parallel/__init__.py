"""Multi-chip parallelism: mesh construction + batch sharding.

The reference's only parallelism axis is independent samples, implemented as
thread/process pools fanning out one Julia subprocess per sample
(reference ``scripts/gen_data.py:448-460``, SURVEY.md §2.6). The TPU-native
equivalent is SPMD data parallelism: one jitted program, batch axis sharded over a
1-D ``jax.sharding.Mesh``, XLA inserting collectives over ICI as needed. No
filesystem round-trips, no process boundaries.
"""

from hallthrusterpem_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_call,
    pad_to_multiple,
    BatchExecutor,
)
from hallthrusterpem_tpu.parallel import distributed

__all__ = ["make_mesh", "shard_batch", "sharded_call", "pad_to_multiple", "BatchExecutor",
           "distributed"]
