from .distributed import (MODEL_INPUT_KEYS, allgather_tree,
                          allreduce_sum_dict, global_replicate_batch,
                          global_shard_batch, global_shard_inputs,
                          global_shard_stacked_batch,
                          host_episode_slice, host_rng,
                          is_main, local_episode_count, maybe_initialize,
                          process_count, process_index)
from .mesh import make_mesh, replicate, shard_batch, shard_stacked_batch

__all__ = [
    "make_mesh", "shard_batch", "shard_stacked_batch",
    "global_shard_stacked_batch", "replicate",
    "maybe_initialize", "is_main", "process_count", "process_index",
    "local_episode_count", "host_rng", "global_shard_batch",
    "global_replicate_batch", "global_shard_inputs", "host_episode_slice",
    "allgather_tree", "MODEL_INPUT_KEYS",
    "allreduce_sum_dict",
]
