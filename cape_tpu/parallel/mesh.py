"""Device mesh + sharding helpers — episode-level data parallelism.

The TPU-native replacement for the reference's vestigial NCCL/DDP
scaffolding (`util/misc.py:341-377`, never engaged — SURVEY.md §2.10): a 1D
`jax.sharding.Mesh` over all chips with batches sharded on the leading
(episode) axis and parameters replicated. Gradients reduce over ICI via the
collectives XLA inserts for replicated-param jit — no hand-written
all-reduce. The mesh axes are named so tensor/pipeline axes can be added
later without restructuring (50M params need only DP).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("data",),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Device-put a (nested) numpy batch sharded on the leading axis.

    Leaves whose leading dim is not divisible by the mesh axis (e.g. a
    batch-of-1 validation episode on an 8-chip mesh) are replicated instead
    — XLA then computes them redundantly per device, which is correct and
    keeps every batch size usable on every mesh.
    """
    n = mesh.shape[axis]

    def put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] % n == 0:
            spec = P(axis, *([None] * (np.ndim(x) - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def shard_stacked_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """`shard_batch` for step-stacked batches of shape (N, B, ...).

    Axis 0 is the scan (steps-per-dispatch) axis — never sharded; axis 1
    is the episode axis, sharded over the data mesh when divisible,
    replicated otherwise (same fallback rule as `shard_batch`).
    """
    n = mesh.shape[axis]

    def put(x):
        if np.ndim(x) >= 2 and np.shape(x)[1] % n == 0:
            spec = P(None, axis, *([None] * (np.ndim(x) - 2)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully-replicate a pytree (params/opt state) over the mesh.

    Works on multi-host meshes too: every process must hold identical host
    values (true for seeded init / restored checkpoints), contributed via
    `make_array_from_process_local_data`.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
