#!/usr/bin/env python
"""Demonstrate the K-shot mechanism: 5-shot > 1-shot on a noisy fixture.

The reference's core K-shot claim (~40-60% 5-shot vs ~30-50% 1-shot,
`README.md:466-472`) rests on mean-pooling K supports
(`episodic_sampler.py:434-442`) denoising the support prototype. Round 3's
fixture had near-noise-free supports, so 5-shot measured flat (PERF.md).
This script generates the 40-category learnable fixture WITH per-image
layout jitter (each image's keypoints are a noisy draw around the category
layout — so K-shot averaging recovers the layout at sigma/sqrt(K)), trains
the standard recipe once, then evaluates the SAME checkpoint 1-shot and
5-shot on the never-seen test categories.

Expected: 5-shot macro/micro PCK > 1-shot by a margin that grows with
--layout_jitter (and vanishes as jitter -> 0, which is round 3's result).

    timeout 14400 python scripts/run_kshot_demo.py \
        --root /tmp/kshot_fixture --epochs 30

MEASURED CAVEAT (round 5, PERF.md): on the default 'indexed' fixture
the keypoint index is color-coded into the query image (same colors
across categories), so a trained model reads identity off the image and
IGNORES the support prior — measured: eval PCK invariant to support-
coordinate noise, so both jittered-fixture training and eval-time
--support_coord_noise measure 1-shot == 5-shot, flat.

The demonstrable setting is --marker_style uniform: every keypoint is
the same disc, the image reveals WHERE but not WHICH, and index
assignment must come from the support layout (the honest miniature of
the real CAPE task). With per-image layout jitter the supports are
noisy draws around the category layout and the collate's mean-pool
(`episodic_sampler.py:434-442`) denoises the prototype at
sigma/sqrt(K) — 5-shot > 1-shot:

    timeout 14400 python scripts/run_kshot_demo.py \
        --root /tmp/kshot_uniform --marker_style uniform \
        --layout_jitter 0.08 --num_eval_episodes 240
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/kshot_fixture")
    ap.add_argument("--layout_jitter", type=float, default=0.08)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--episodes_per_epoch", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--num_eval_episodes", type=int, default=80)
    ap.add_argument("--support_coord_noise", type=float, default=0.0,
                    help="eval-time support coordinate noise std "
                         "(normalized units); see module docstring")
    ap.add_argument("--marker_style", default="indexed",
                    choices=["indexed", "uniform"],
                    help="'uniform' draws every keypoint as the same disc "
                         "so identity must come from the support layout — "
                         "the fixture on which 5-shot>1-shot is "
                         "demonstrable (see data/synthetic.py)")
    ap.add_argument("--num_categories", type=int, default=40)
    ap.add_argument("--images_per_category", type=int, default=10)
    ap.add_argument("--num_holdout", type=int, default=8,
                    help="categories held out (split between val/test). "
                         "MANY categories x FEW images is the "
                         "anti-memorization regime: with few examples per "
                         "category the train loss can no longer be "
                         "minimized by memorizing per-category layouts "
                         "(which transfers zero to unseen categories) and "
                         "the support-copying solution wins")
    ap.add_argument("--sensitivity_sigma", type=float, default=0.3,
                    help="after the K-shot evals, re-run 1-shot with this "
                         "LARGE support noise as a does-the-model-even-"
                         "use-supports control (0 = skip)")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing checkpoint under --root/out")
    args = ap.parse_args()

    from cape_tpu.data.synthetic import make_synthetic_mp100

    out_dir = os.path.join(args.root, "out")
    if not os.path.exists(os.path.join(args.root, "category_splits.json")):
        print(f"generating {args.num_categories}-category fixture "
              f"(layout_jitter={args.layout_jitter}, "
              f"{args.marker_style} markers) under {args.root}", flush=True)
        make_synthetic_mp100(
            args.root, num_categories=args.num_categories,
            images_per_category=args.images_per_category,
            keypoint_range=(5, 9), image_size=(256, 320), seed=7,
            learnable=True, num_holdout=args.num_holdout,
            layout_jitter=args.layout_jitter,
            marker_style=args.marker_style,
        )

    if not args.skip_train:
        from cape_tpu.cli.train import main as train_main

        train_main([
            "--dataset_root", args.root,
            "--category_split_file",
            os.path.join(args.root, "category_splits.json"),
            "--output_dir", out_dir,
            "--image_size", str(args.image_size),
            "--epochs", str(args.epochs),
            "--episodes_per_epoch", str(args.episodes_per_epoch),
            "--val_episodes_per_epoch", "24",
            "--batch_size", str(args.batch_size),
            "--num_queries_per_episode", "2",
            "--fixed_val_episodes",
            "--seed", "3",
        ])

    # newest best checkpoint
    from cape_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(out_dir)
    ckpt = mgr.best() or mgr.latest()
    assert ckpt, f"no checkpoint under {out_dir}"
    print(f"evaluating checkpoint: {ckpt}", flush=True)

    from cape_tpu.cli.evaluate import main as eval_main

    results = {}
    for k in (1, 5):
        edir = os.path.join(args.root, f"eval_{k}shot")
        eval_main([
            "--checkpoint", str(ckpt),
            "--dataset_root", args.root,
            "--category_split_file",
            os.path.join(args.root, "category_splits.json"),
            "--split", "test",
            "--num_episodes", str(args.num_eval_episodes),
            "--num_support", str(k),
            "--support_coord_noise", str(args.support_coord_noise),
            "--seed", "123",
            "--output_dir", edir,
        ])
        with open(os.path.join(edir, "metrics_test.json")) as f:
            m = json.load(f)
        results[f"{k}shot"] = {
            "micro_pck": m["pck"],
            "macro_pck": m["pck_mean_categories"],
        }
        print(f"{k}-shot: {results[f'{k}shot']}", flush=True)

    if args.sensitivity_sigma > 0:
        # support-sensitivity control, in-process (the jitted decode is
        # warm): re-run the 1-shot eval with LARGE support noise. If PCK
        # barely moves, the trained model is ignoring the support prior
        # and any K-shot comparison on this checkpoint is structurally
        # flat (the round-5 indexed-fixture failure mode) — report it so
        # the flat result carries its own diagnosis.
        edir = os.path.join(args.root, "eval_sensitivity")
        eval_main([
            "--checkpoint", str(ckpt),
            "--dataset_root", args.root,
            "--category_split_file",
            os.path.join(args.root, "category_splits.json"),
            "--split", "test",
            "--num_episodes", str(args.num_eval_episodes),
            "--num_support", "1",
            "--support_coord_noise", str(args.sensitivity_sigma),
            "--seed", "123",
            "--output_dir", edir,
        ])
        with open(os.path.join(edir, "metrics_test.json")) as f:
            m = json.load(f)
        results["sensitivity"] = {
            "sigma": args.sensitivity_sigma,
            "micro_pck": m["pck"],
            "macro_pck": m["pck_mean_categories"],
            "drop_vs_1shot": round(
                (results["1shot"]["micro_pck"] or 0) - m["pck"], 4),
        }
        print(f"sensitivity (sigma={args.sensitivity_sigma}): "
              f"{results['sensitivity']}", flush=True)

    results["layout_jitter"] = args.layout_jitter
    results["support_coord_noise"] = args.support_coord_noise
    delta = (results["5shot"]["macro_pck"] or 0) - \
        (results["1shot"]["macro_pck"] or 0)
    results["macro_delta_5shot_minus_1shot"] = round(delta, 4)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
