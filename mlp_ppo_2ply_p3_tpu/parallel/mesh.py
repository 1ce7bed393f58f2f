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


def _place_tree(tree, sh: NamedSharding):
    """Place a pytree under ``sh``.  Single-process: plain device_put.
    Multi-process: a process can only hand data to its ADDRESSABLE
    devices, so each leaf becomes a global array assembled per-shard via
    ``jax.make_array_from_callback`` — valid here because every process
    computes identical full-size host values (deterministic PRNG-seeded
    init), so slicing the local copy at each global index yields a
    consistent global array."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    def place(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    return jax.tree_util.tree_map(place, tree)


def shard_batch_tree(tree, mesh: Mesh):
    """Place every leaf of a batch-leading pytree with its batch axis
    split over the mesh's data axis."""
    return _place_tree(tree, batch_sharding(mesh))


def replicate_tree(tree, mesh: Mesh):
    return _place_tree(tree, replicated(mesh))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host process-group init (no-op on a single host).

    Explicit flags (the trainer CLI's --coordinator/--num-processes/
    --process-id, exercised cross-process by tests/test_multiprocess.py)
    take precedence.  With no flags, a multi-host TPU pod launch is
    autodetected from the topology the TPU runtime publishes in the
    environment and handed to ``jax.distributed.initialize()``'s own
    autodetection — without this, a bare ``python -m ...ppo.train`` on a
    pod would silently train on 1/N of the slice's chips.  Set
    BG_NO_DIST_AUTODETECT=1 to opt out (e.g. single-process debugging on
    one worker of a reserved pod)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    import os

    if os.environ.get("BG_NO_DIST_AUTODETECT"):
        return
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h]) > 1 or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
