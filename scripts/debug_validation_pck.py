#!/usr/bin/env python
"""Validation-PCK leak audit CLI — TPU equivalent of the reference's
`models/debug_validation_pck.py` (the PCK-100% data-leakage debugger) and
its 6-part audit suite (`tests/test_validation_pck_debug.py:1-12`).

Thin wrapper over `cape_tpu.eval.audit.audit_episodes` (the same function
the test suite exercises):
  1. predictions identical to GT?            (teacher-forcing leak)
  2. predictions identical to support?       (support copy-through)
  3. generation length vs expected keypoints (EOS behavior, max-len hits)
  4. coordinate spread                       (single-token collapse)
  5. per-episode PCK distribution            (100%-PCK episodes flagged)
  6. per-category breakdown

Usage:
    python scripts/debug_validation_pck.py --checkpoint ... --dataset_root ... \
        --split val --num_episodes 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--category_split_file", default=None)
    p.add_argument("--split", default="val", choices=["val", "test"])
    p.add_argument("--num_episodes", type=int, default=20)
    p.add_argument("--eval_batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    import jax

    from cape_tpu.config import CAPEConfig
    from cape_tpu.data.builder import build_mp100_cape, resolve_split_file
    from cape_tpu.data.episodic import (EpisodicSampler, episode_batches,
                                        eval_batch_plan)
    from cape_tpu.eval.audit import audit_episodes, format_audit_report
    from cape_tpu.models import CAPE
    from cape_tpu.train.state import create_train_state
    from cape_tpu.utils.checkpoint import CheckpointManager

    with open(os.path.join(args.checkpoint, "meta.json")) as f:
        meta = json.load(f)
    cfg = CAPEConfig.from_json(json.dumps(meta["config"]))
    if args.dataset_root:
        cfg = cfg.replace(dataset_root=args.dataset_root)
    if args.category_split_file:
        cfg = cfg.replace(category_split_file=args.category_split_file)

    ds = build_mp100_cape(args.split, cfg)
    sampler = EpisodicSampler(ds, resolve_split_file(cfg), args.split,
                              num_queries=1,
                              num_support=cfg.num_support_per_episode)
    fixed = sampler.fixed_episodes(args.num_episodes, args.seed)
    rng = np.random.default_rng(args.seed)

    model = CAPE(cfg)
    probe = next(episode_batches(ds, sampler, 1, 1, cfg.image_size,
                                 cfg.max_support_keypoints,
                                 cfg.max_skeleton_edges, rng, fixed=fixed))
    variables = model.init(jax.random.PRNGKey(0), probe["query_images"],
                           probe["support_coords"], probe["support_mask"],
                           probe["skeleton_edges"], probe["targets"])
    state = create_train_state(cfg, variables, steps_per_epoch=1)
    mgr = CheckpointManager(os.path.dirname(os.path.abspath(args.checkpoint)))
    state, _ = mgr.restore(args.checkpoint, state)
    params = {"params": state.params}
    from functools import partial

    from cape_tpu.eval.evaluate import _decode_jit

    decode = partial(_decode_jit, model)  # cached static-model jit

    eval_b, n_batches = eval_batch_plan(
        args.num_episodes, args.eval_batch_size or cfg.eval_batch_size)
    batches = episode_batches(ds, sampler, eval_b, n_batches,
                              cfg.image_size, cfg.max_support_keypoints,
                              cfg.max_skeleton_edges,
                              np.random.default_rng(args.seed), fixed=fixed,
                              total_episodes=args.num_episodes)
    audit = audit_episodes(
        lambda b: decode(params, b["query_images"], b["support_coords"],
                         b["support_mask"], b["skeleton_edges"]),
        batches, cfg)
    print("\n" + format_audit_report(audit))
    if audit["leak_detected"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
