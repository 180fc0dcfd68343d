"""Multi-host distributed training test: a REAL 2-process CPU 'pod'.

The TPU-native analogue of a fake cluster backend (SURVEY.md §4 takeaway):
two OS processes each with 2 virtual CPU devices initialize
`jax.distributed` through `cape_tpu.parallel.maybe_initialize`
(CAPE_COORDINATOR env protocol), shard one global batch-4 episode batch
per-host, and run one data-parallel train step over the global 4-device
mesh. Both hosts must agree on the loss and updated params, and both must
match the single-process oracle on the same batch — the invariant the
reference's DDP scaffolding (`util/misc.py:341-377`) was meant to provide
but never exercised.
"""

import os
import re
import socket
import subprocess
import sys


import jax
import numpy as np
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.models import CAPE
from cape_tpu.parallel import make_mesh, replicate, shard_batch
from cape_tpu.train import create_train_state, make_train_step

from test_config_knobs import _batch

import pytest  # noqa: E402

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_oracle() -> float:
    """Same step on one device, full batch."""
    cfg = tiny_test_config(batch_size=4, accumulation_steps=1)
    imgs, sc, sm, se, targets = _batch(cfg, batch=4, seed=3)
    batch = dict(query_images=imgs, support_coords=sc, support_mask=sm,
                 skeleton_edges=se, targets=targets)
    model = CAPE(cfg)
    local = jax.tree_util.tree_map(lambda x: x[:2], batch)
    variables = model.init(jax.random.PRNGKey(0), local["query_images"],
                           local["support_coords"], local["support_mask"],
                           local["skeleton_edges"], local["targets"])
    variables = jax.tree_util.tree_map(np.asarray, variables)
    mesh = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    state = create_train_state(cfg, variables, steps_per_epoch=1)
    state = replicate(state, mesh)
    step = make_train_step(model, cfg, steps_per_epoch=1)
    state, metrics = step(state, shard_batch(batch, mesh),
                          jax.random.PRNGKey(7))
    return float(metrics["total"])


def test_two_process_training_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1100)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d) main=(\w+) loss=([\d.]+) psum=(-?[\d.]+)", out)
        assert m, f"no RESULT line in:\n{out[-4000:]}"
        results[int(m.group(1))] = (m.group(2), float(m.group(3)),
                                    float(m.group(4)))

    assert set(results) == {0, 1}
    # process-0 gating helper reports correctly on each host
    assert results[0][0] == "True" and results[1][0] == "False"
    # both hosts computed the identical global step
    assert results[0][1] == pytest.approx(results[1][1], abs=1e-9)
    assert results[0][2] == pytest.approx(results[1][2], abs=1e-7)
    # and it matches the single-process oracle on the same global batch
    oracle = _single_process_oracle()
    assert results[0][1] == pytest.approx(oracle, rel=1e-5, abs=1e-5)


def test_sharded_multihost_eval_matches_single_process(tmp_path):
    """Sharded pod evaluation: two hosts each decode half the fixed
    episodes inside one SPMD program; after the output allgather, BOTH
    hosts must report identical PCK — equal to a single-process evaluation
    of the same episodes with the same params."""
    from cape_tpu.data.episodic import (EpisodicSampler, episode_batches,
                                        eval_batch_plan)
    from cape_tpu.data.mp100 import MP100Dataset
    from cape_tpu.data.synthetic import make_synthetic_mp100
    from cape_tpu.data.tokenizer import DiscreteTokenizer
    from cape_tpu.eval import evaluate_cape

    root = str(tmp_path / "fixture")
    make_synthetic_mp100(root, num_categories=6, images_per_category=6)

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid), root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    evals = {}
    for out in outs:
        m = re.search(r"EVAL pid=(\d) n=(\d+) correct=(\d+) visible=(\d+) "
                      r"pck=([\d.]+)", out)
        assert m, f"no EVAL line in:\n{out[-4000:]}"
        evals[int(m.group(1))] = (int(m.group(2)), int(m.group(3)),
                                  int(m.group(4)), float(m.group(5)))
    assert evals[0] == evals[1], f"hosts disagree: {evals}"
    n, correct, visible, pck = evals[0]
    assert n == 6  # the full episode set scored exactly once

    # single-process oracle: same params (seed-0 init on the same _batch
    # probe the worker used), same fixed episodes
    cfg = tiny_test_config(batch_size=4, accumulation_steps=1)
    imgs, sc, sm, se, targets = _batch(cfg, batch=4, seed=3)
    local = jax.tree_util.tree_map(lambda x: x[:2], dict(
        query_images=imgs, support_coords=sc, support_mask=sm,
        skeleton_edges=se, targets=targets))
    model = CAPE(cfg)
    variables = model.init(jax.random.PRNGKey(0), local["query_images"],
                           local["support_coords"], local["support_mask"],
                           local["skeleton_edges"], local["targets"])
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    ds = MP100Dataset(os.path.join(root, "data"),
                      os.path.join(root, "annotations",
                                   "mp100_split1_val.json"),
                      tok, image_size=cfg.image_size, split="val")
    sampler = EpisodicSampler(ds, os.path.join(root, "category_splits.json"),
                              "val", num_queries=1, num_support=1)
    fixed = sampler.fixed_episodes(6, seed=11)
    eval_b, n_batches = eval_batch_plan(6, 4)
    batches = episode_batches(
        ds, sampler, eval_b, n_batches, cfg.image_size,
        cfg.max_support_keypoints, cfg.max_skeleton_edges,
        np.random.default_rng(11), fixed=fixed, total_episodes=6)
    oracle = evaluate_cape(model, variables["params"], batches, cfg)
    assert oracle["num_images"] == 6
    assert (correct, visible) == (oracle["pck_num_correct"],
                                  oracle["pck_num_visible"]), \
        f"sharded {correct}/{visible} vs oracle " \
        f"{oracle['pck_num_correct']}/{oracle['pck_num_visible']}"
