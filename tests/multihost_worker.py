"""Worker for tests/test_multihost.py: one process of a 2-process CPU
'pod'. Initializes the distributed runtime, assembles its local half of a
global batch, runs one data-parallel train step over the global 4-device
mesh, and prints the loss (which must match every other host and the
single-process oracle)."""

import os
import sys

port = sys.argv[1]
pid = sys.argv[2]
fixture_root = sys.argv[3] if len(sys.argv) > 3 else None

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["CAPE_COORDINATOR"] = f"localhost:{port}"
os.environ["CAPE_NUM_PROCESSES"] = "2"
os.environ["CAPE_PROCESS_ID"] = pid

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402

from cape_tpu.config import tiny_test_config  # noqa: E402
from cape_tpu.models import CAPE  # noqa: E402
from cape_tpu.parallel import (global_shard_batch, global_shard_inputs,  # noqa: E402
                               host_episode_slice, is_main,
                               local_episode_count, make_mesh,
                               maybe_initialize, process_count, replicate)
from cape_tpu.train import create_train_state, make_train_step  # noqa: E402

from test_config_knobs import _batch  # noqa: E402


def main():
    assert maybe_initialize(), "distributed init failed"
    assert process_count() == 2
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4, f"global devices {len(jax.devices())}"

    cfg = tiny_test_config(batch_size=4, accumulation_steps=1)
    imgs, sc, sm, se, targets = _batch(cfg, batch=4, seed=3)
    batch = dict(query_images=imgs, support_coords=sc, support_mask=sm,
                 skeleton_edges=se, targets=targets)
    # per-host input sharding: this host's half of the global batch
    n_local = local_episode_count(4)
    assert n_local == 2
    lo = int(pid) * n_local
    local = jax.tree_util.tree_map(lambda x: x[lo: lo + n_local], batch)

    model = CAPE(cfg)
    variables = model.init(jax.random.PRNGKey(0), local["query_images"],
                           local["support_coords"], local["support_mask"],
                           local["skeleton_edges"], local["targets"])
    variables = jax.tree_util.tree_map(np.asarray, variables)

    mesh = make_mesh((-1,), ("data",))
    state = create_train_state(cfg, variables, steps_per_epoch=1)
    state = replicate(state, mesh)
    gbatch = global_shard_batch(local, mesh)
    step = make_train_step(model, cfg, steps_per_epoch=1)
    state, metrics = step(state, gbatch, jax.random.PRNGKey(7))
    loss = float(metrics["total"])
    # params after update are replicated; fingerprint them for cross-host
    # comparison
    leaf = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0], np.float64)
    print(f"RESULT pid={pid} main={is_main()} loss={loss:.10f} "
          f"psum={float(leaf.sum()):.10f}", flush=True)

    if fixture_root:
        # ---- phase 2: sharded multi-host evaluation ----
        # each host decodes a disjoint slice of the same fixed episodes;
        # outputs+metadata allgather, so both hosts must report the SAME
        # PCK over the full set
        from cape_tpu.data.episodic import (EpisodicSampler,
                                            episode_batches, eval_batch_plan)
        from cape_tpu.data.mp100 import MP100Dataset
        from cape_tpu.data.tokenizer import DiscreteTokenizer
        from cape_tpu.eval import evaluate_cape

        tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
        ds = MP100Dataset(os.path.join(fixture_root, "data"),
                          os.path.join(fixture_root, "annotations",
                                       "mp100_split1_val.json"),
                          tok, image_size=cfg.image_size, split="val")
        sampler = EpisodicSampler(
            ds, os.path.join(fixture_root, "category_splits.json"), "val",
            num_queries=1, num_support=1)
        N = 6
        fixed = sampler.fixed_episodes(N, seed=11)
        fixed_local, local_valid = host_episode_slice(fixed, N)
        per_host = len(fixed_local)
        eval_b, n_batches = eval_batch_plan(per_host, 4)
        ld = len(jax.local_devices())
        eval_b = -(-eval_b // ld) * ld  # global batch must divide the mesh
        n_batches = -(-per_host // eval_b)
        batches = episode_batches(
            ds, sampler, eval_b, n_batches, cfg.image_size,
            cfg.max_support_keypoints, cfg.max_skeleton_edges,
            np.random.default_rng(11), fixed=fixed_local,
            total_episodes=local_valid)
        # params must be explicit global-mesh arrays: jit over a mix of
        # global-sharded inputs and host numpy would have to guess
        ev_params = replicate(
            jax.tree_util.tree_map(np.asarray, variables)["params"], mesh)
        stats = evaluate_cape(
            model, ev_params,
            map(lambda b: global_shard_inputs(b, mesh), batches),
            cfg, multihost=True)
        print(f"EVAL pid={pid} n={stats['num_images']} "
              f"correct={stats['pck_num_correct']} "
              f"visible={stats['pck_num_visible']} "
              f"pck={stats['pck']:.10f}", flush=True)


if __name__ == "__main__":
    main()
