"""Multi-host distributed runtime — TPU-native equivalents of the
reference's (never-engaged) DDP scaffolding.

Reference analogue (`util/misc.py:341-377`, SURVEY.md §5.8):
`init_distributed_mode` (env-rank / SLURM + NCCL process group),
`reduce_dict`, `save_on_master`, `setup_for_distributed`. Here the
TPU-native versions are functional:

- `maybe_initialize()` — `jax.distributed.initialize()`: on TPU pods the
  coordinator/process topology auto-detects from the TPU metadata; on
  CPU/GPU clusters (and in the multi-process CPU test) it reads
  CAPE_COORDINATOR / CAPE_NUM_PROCESSES / CAPE_PROCESS_ID.
- per-host input sharding — each host loads only its slice of the global
  episode batch; `global_shard_batch` assembles the global jax.Arrays with
  `jax.make_array_from_process_local_data` (the role of DDP's
  DistributedSampler).
- `is_main()` gating for checkpoint writes and logging
  (reference `save_on_master` / `setup_for_distributed`).
- `allreduce_sum_dict` — cross-host scalar-metric reduction
  (reference `reduce_dict`), via `multihost_utils.process_allgather`.

Gradient reduction itself needs none of this: params are replicated over
the global mesh, so XLA inserts the cross-host psum inside the jitted train
step (ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize() -> bool:
    """Initialize JAX's distributed runtime when launched multi-process.

    Returns True if running multi-process after the call. Safe to call
    multiple times and in single-process runs (no-op).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("CAPE_COORDINATOR")
    nproc = os.environ.get("CAPE_NUM_PROCESSES")
    if coord and nproc:
        # MUST run before anything initializes the XLA backend
        # (jax.devices()/process_count()/device_put all do)
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("CAPE_PROCESS_ID", "0")),
        )
        _INITIALIZED = True
        return True
    if jax.process_count() > 1:  # initialized by the launcher already
        _INITIALIZED = True
        return True
    # TPU pod slices: the launcher (or jax itself via the TPU metadata
    # server) initializes the runtime before we get here, in which case the
    # process_count() check above already returned True. With no coordinator
    # env and no pre-initialized runtime this is a single-host run — leave
    # it untouched (calling initialize() here would hang waiting for peers).
    return False


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main() -> bool:
    """True on the process that should write checkpoints/logs
    (reference `save_on_master`, `util/misc.py:338-340`)."""
    return jax.process_index() == 0


def local_episode_count(global_batch: int,
                        n_processes: Optional[int] = None,
                        index: Optional[int] = None) -> int:
    """Per-host share of a global episode batch (per-host input sharding).

    The global batch must divide evenly so every host contributes the same
    fixed shapes (XLA requirement); raises otherwise.
    """
    n = n_processes if n_processes is not None else jax.process_count()
    i = index if index is not None else jax.process_index()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes")
    del i  # same count on every host; offset handled by the sampler seed
    return global_batch // n


def host_rng(seed: int, epoch: int = 0) -> np.random.Generator:
    """Per-host episodic sampling stream: disjoint by process index
    (the role of DDP's sampler sharding — hosts draw different episodes)."""
    return np.random.default_rng([seed, jax.process_index(), epoch])


def global_shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Assemble per-host numpy batches into global arrays sharded on the
    leading axis of `mesh`. Multi-process generalization of
    `mesh.shard_batch`: each host contributes its local slice.
    """
    if jax.process_count() == 1:
        from .mesh import shard_batch

        return shard_batch(batch, mesh, axis)

    def put(x):
        if np.ndim(x) >= 1:
            spec = P(axis, *([None] * (np.ndim(x) - 1)))
        else:
            spec = P()
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)


def global_shard_stacked_batch(batch: Dict, mesh: Mesh,
                               axis: str = "data") -> Dict:
    """Multi-process `shard_stacked_batch`: leaves are (N, localB, ...)
    per host; axis 0 is the scan axis (replicated), axis 1 assembles the
    global episode axis across hosts."""
    if jax.process_count() == 1:
        from .mesh import shard_stacked_batch

        return shard_stacked_batch(batch, mesh, axis)

    def put(x):
        if np.ndim(x) >= 2:
            spec = P(None, axis, *([None] * (np.ndim(x) - 2)))
        else:
            spec = P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree_util.tree_map(put, batch)


def global_replicate_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Replicate a batch every host holds in full onto the global mesh
    (multi-process validation: all hosts decode the same fixed episodes in
    lockstep, so checkpoint/early-stop decisions stay identical without any
    cross-host metric communication)."""
    if jax.process_count() == 1:
        from .mesh import replicate

        return replicate(batch, mesh)
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch)


#: model-input keys of an episode batch (device-placed); everything else is
#: host-side bookkeeping the evaluator reads as numpy
MODEL_INPUT_KEYS = ("query_images", "support_coords", "support_mask",
                    "skeleton_edges")


def global_shard_inputs(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Shard only the MODEL INPUT leaves onto the global mesh; metadata
    (targets, category ids, bbox dims, validity flags) stays host-local
    numpy. Used by sharded multi-host evaluation: each host contributes its
    slice of episodes to one SPMD decode, then `allgather_tree` recovers
    the full outputs + metadata on every host."""
    put = global_shard_batch(
        {k: batch[k] for k in MODEL_INPUT_KEYS}, mesh, axis)
    out = dict(batch)
    out.update(put)
    return out


def allgather_tree(tree):
    """Concatenate every leaf across hosts along axis 0 (host-order).

    Works on host numpy leaves and on globally-sharded jax Arrays (e.g.
    decode outputs) — `process_allgather` with tiled=True returns the
    assembled global array on every host. Single-process: numpy passthrough.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(
            multihost_utils.process_allgather(x, tiled=True)),
        tree)


def host_episode_slice(episodes: list, total: int):
    """Split a fixed episode list for sharded multi-host eval.

    Host h takes the contiguous block [h*per_host, (h+1)*per_host) of a
    list padded (by wrapping) to `process_count() * per_host`; returns
    (local_list, local_valid_count). Every host gets the same-size slice
    (SPMD lockstep) — hosts past the real episodes contribute wrapped
    padding that their valid count excludes.
    """
    P = jax.process_count()
    h = jax.process_index()
    per_host = -(-total // P)
    local = [episodes[(h * per_host + i) % len(episodes)]
             for i in range(per_host)]
    local_valid = max(0, min(per_host, total - h * per_host))
    return local, local_valid


def allreduce_sum_dict(metrics: Dict[str, float]) -> Dict[str, float]:
    """Sum scalar metrics across hosts (reference `reduce_dict`,
    `util/misc.py:128-153`). No-op single-process."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(local)  # (P, K)
    summed = np.asarray(gathered).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}
