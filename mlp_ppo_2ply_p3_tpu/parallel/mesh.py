"""Device mesh + sharding layout for multi-chip / multi-host self-play.

The reference's only parallelism was a Python loop over 8 envs plus an
abandoned multiprocessing fan-out (/root/reference/src/environment/
vec_bg_env.py, SURVEY.md §2/§5.8).  Here the scale-out story is the
standard JAX one: one ``Mesh`` over all chips with a single data axis
``"dp"``; game state shards over ``dp`` (env stepping is embarrassingly
parallel, zero comms), model/optimizer state is replicated, and the
learner's gradient all-reduce over ``dp`` is inserted automatically by
GSPMD when the sharded batch meets replicated params.  Multi-host pods
use the same code after ``jax.distributed.initialize()``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (game batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(tree, mesh: Mesh):
    """Place every leaf of a batch-leading pytree with its batch axis
    split over the mesh's data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host process-group init (no-op on a single host).  On TPU
    pods with the standard launcher, ``jax.distributed.initialize()``
    autodetects everything."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
