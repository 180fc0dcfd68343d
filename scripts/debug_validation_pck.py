#!/usr/bin/env python
"""Validation-PCK leak audit — TPU equivalent of the reference's
`models/debug_validation_pck.py` (the PCK-100% data-leakage debugger).

Runs autoregressive evaluation on a checkpoint and audits each episode:
  1. predictions identical to GT?            (teacher-forcing leak)
  2. predictions identical to support?       (support copy-through)
  3. generation length vs expected keypoints (EOS behavior)
  4. coordinate spread (single-token collapse)
  5. per-episode PCK distribution
  6. token-type histogram of generated sequences

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
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    import jax

    from cape_tpu.config import CAPEConfig
    from cape_tpu.data.builder import build_mp100_cape, resolve_split_file
    from cape_tpu.data.episodic import EpisodicSampler, episode_batches
    from cape_tpu.eval.evaluate import extract_gt_keypoints, extract_pred_keypoints
    from cape_tpu.eval.pck import compute_pck_bbox
    from cape_tpu.models import CAPE
    from cape_tpu.models.cape import autoregressive_decode
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
    decode = jax.jit(lambda p, i, c, m, e: autoregressive_decode(model, p, i, c, m, e))

    identical_gt = identical_support = 0
    lengths, pcks, spreads = [], [], []
    token_hist = np.zeros(3, np.int64)
    batches = episode_batches(ds, sampler, 1, args.num_episodes,
                              cfg.image_size, cfg.max_support_keypoints,
                              cfg.max_skeleton_edges,
                              np.random.default_rng(args.seed), fixed=fixed)
    for batch in batches:
        out = decode(params, batch["query_images"], batch["support_coords"],
                     batch["support_mask"], batch["skeleton_edges"])
        logits = np.asarray(out["pred_logits"])
        coords = np.asarray(out["pred_coords"])
        n_active = int(out["lengths"][0])
        active = np.arange(logits.shape[1])[None] < np.asarray(out["lengths"])[:, None]
        expected = np.asarray(batch["num_keypoints"])
        pred = extract_pred_keypoints(logits, coords, active, expected)[0]
        gt = extract_gt_keypoints(batch["targets"], expected)[0]
        n = min(len(pred), len(gt))
        if n and np.allclose(pred[:n], gt[:n], atol=1e-6):
            identical_gt += 1
        sup = np.asarray(batch["support_coords"][0, :n])
        if n and np.allclose(pred[:n], sup, atol=1e-6):
            identical_support += 1
        lengths.append(n_active)
        spreads.append(float(pred.std()) if len(pred) else 0.0)
        token_hist += np.bincount(
            logits[0, :n_active].argmax(-1), minlength=3
        )[:3]
        bw, bh = np.asarray(batch["bbox_dims"][0])
        vis = np.asarray(batch["gt_visibility"][0, : int(expected[0])])
        gtp = gt
        if len(gtp) < int(expected[0]):
            gtp = np.concatenate([gtp, np.zeros((int(expected[0]) - len(gtp), 2))])
        pck, _, _ = compute_pck_bbox(pred * cfg.image_size, gtp * cfg.image_size,
                                     bw, bh, visibility=vis)
        pcks.append(pck)

    print(f"\n===== PCK leak audit ({args.num_episodes} episodes) =====")
    print(f"1. pred == GT (leak!):        {identical_gt}")
    print(f"2. pred == support (copy!):   {identical_support}")
    print(f"3. generated length: mean {np.mean(lengths):.1f} "
          f"(expected keypoints ~{np.mean([l for l in lengths]):.1f}; "
          f"max_len hits: {sum(l >= cfg.seq_len for l in lengths)})")
    print(f"4. coord spread: mean {np.mean(spreads):.4f} "
          f"({'COLLAPSE suspected' if np.mean(spreads) < 1e-3 else 'ok'})")
    print(f"5. PCK: mean {np.mean(pcks):.2%}, min {np.min(pcks):.2%}, "
          f"max {np.max(pcks):.2%}")
    print(f"6. token types generated (coord/sep/eos): {token_hist.tolist()}")
    if identical_gt:
        print("!! LEAK: autoregressive predictions identical to GT")
        sys.exit(1)


if __name__ == "__main__":
    main()
