#!/usr/bin/env python
"""Architecture tradeoff curve: train-step time AND fixture PCK vs
encoder depth / MSDA points.

Round-4 PERF.md's conclusion was that the remaining train-step lever is
"fewer/cheaper MSDA applications (architecture), not a faster kernel" —
the reference's 6-layer/4-point encoder (`deformable_transformer.py`,
defaults in `main.py`) is convention, not gospel. This probe publishes
the tradeoff so a user can buy step time with eyes open; the shipped
defaults stay at the reference's 6/4.

Two modes:

  --mode step   fori-slope device step time (relay-immune; the protocol
                of scripts/bench_device_step.py) per (enc_layers,
                enc_n_points) at the flagship shape.
    timeout 3600 python scripts/probe_arch_tradeoff.py --mode step \
        --configs 6:4,4:4,3:4,6:2,4:2 --out /tmp/arch_step.json

  --mode pck    train the 40-category learnable fixture recipe per
                config and evaluate test-split PCK through the CLIs
                (one subprocess-free sequential sweep; ~15-25 min per
                config on a v5e).
    timeout 28800 python scripts/probe_arch_tradeoff.py --mode pck \
        --configs 6:4,4:4,3:4,6:2 --root /tmp/arch_fixture \
        --out /tmp/arch_pck.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = float(os.environ.get("PEAK_TFLOPS", "197")) * 1e12


def parse_configs(s):
    out = []
    for item in s.split(","):
        e, p = item.split(":")
        out.append((int(e), int(p)))
    return out


def run_step_mode(args):
    import jax

    from cape_tpu.config import CAPEConfig
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
    from cape_tpu.models import CAPE
    from cape_tpu.train.state import create_train_state
    from cape_tpu.train.train_step import make_train_step

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    B = args.batch
    k_lo, k_hi = 1, args.k_hi
    results = []
    for enc_layers, n_points in parse_configs(args.configs):
        cfg = CAPEConfig(dropout=0.1, batch_size=B, accumulation_steps=1,
                         image_size=args.image_size,
                         enc_layers=enc_layers, enc_n_points=n_points,
                         remat_encoder=False)
        model = CAPE(cfg)
        rng = np.random.default_rng(0)
        S, K, E = (cfg.image_size, cfg.max_support_keypoints,
                   cfg.max_skeleton_edges)
        tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
        t = tokenize_keypoints(tok, rng.uniform(5, S - 5, (17, 2)), S, S)
        batch = dict(
            query_images=rng.uniform(size=(B, S, S, 3)).astype(np.float32),
            support_coords=rng.uniform(size=(B, K, 2)).astype(np.float32),
            support_mask=np.zeros((B, K), bool),
            skeleton_edges=np.full((B, E, 2), -1, np.int32),
            targets={k: np.stack([v] * B) for k, v in t.items()},
        )
        batch["support_mask"][:, 17:] = True
        # jitted init: ONE compiled dispatch, not thousands of eager ops
        # through the tunneled relay (measured 1178s eager -> ~60s jitted)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), batch["query_images"][:1],
            batch["support_coords"][:1], batch["support_mask"][:1],
            batch["skeleton_edges"][:1],
            {k: v[:1] for k, v in batch["targets"].items()})
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        state0 = create_train_state(cfg, params, steps_per_epoch=100)
        dbatch = jax.device_put(batch)
        jrng = jax.device_put(jax.random.PRNGKey(0))
        step = make_train_step(model, cfg, steps_per_epoch=100)
        ca = step.lower(state0, dbatch, jrng).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan"))) if ca else float("nan")

        inner = make_train_step(model, cfg, steps_per_epoch=100,
                                donate=False, jit=False)

        def k_steps(k):
            @jax.jit
            def run(state, b, r):
                def body(i, carry):
                    st, rr = carry
                    rr, sub = jax.random.split(rr)
                    st, _ = inner(st, b, sub)
                    return (st, rr)
                st, _ = jax.lax.fori_loop(0, k, body, (state, r))
                return (st.step,
                        jax.tree_util.tree_leaves(st.params)[0][..., :1])
            return run

        times = {}
        for k in (k_lo, k_hi):
            run = k_steps(k)
            sstep, leaf = run(state0, dbatch, jrng)
            int(sstep)
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                sstep, leaf = run(state0, dbatch, jrng)
                int(sstep)
                np.asarray(leaf).ravel()[:1]
                ts.append(time.perf_counter() - t0)
            times[k] = float(np.min(ts))
            print(f"enc={enc_layers} pts={n_points} K={k}: "
                  f"{[round(x, 3) for x in ts]}", file=sys.stderr)
        slope = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
        rec = {
            "enc_layers": enc_layers, "enc_n_points": n_points,
            "batch": B, "image_size": args.image_size,
            "params_m": round(n_params / 1e6, 2),
            "device_step_ms": round(slope * 1e3, 2),
            "queries_per_sec": round(B / slope, 1) if slope > 0 else None,
            "xla_flops_per_step": flops,
            "mfu": round(flops / slope / PEAK_FLOPS, 4)
            if (np.isfinite(flops) and slope > 0) else None,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


def run_pck_mode(args):
    from cape_tpu.data.synthetic import make_synthetic_mp100

    if not os.path.exists(os.path.join(args.root, "category_splits.json")):
        print(f"generating 40-category fixture under {args.root}",
              flush=True)
        make_synthetic_mp100(
            args.root, num_categories=40, images_per_category=10,
            keypoint_range=(5, 9), image_size=(256, 320), seed=7,
            learnable=True, num_holdout=8,
        )

    from cape_tpu.cli.evaluate import main as eval_main
    from cape_tpu.cli.train import main as train_main

    results = []
    for enc_layers, n_points in parse_configs(args.configs):
        tag = f"e{enc_layers}p{n_points}"
        out_dir = os.path.join(args.root, f"out_{tag}")
        t0 = time.perf_counter()
        train_main([
            "--dataset_root", args.root,
            "--category_split_file",
            os.path.join(args.root, "category_splits.json"),
            "--output_dir", out_dir,
            "--image_size", "256",
            "--epochs", str(args.epochs),
            "--episodes_per_epoch", "50",
            "--val_episodes_per_epoch", "24",
            "--batch_size", "4",
            "--num_queries_per_episode", "2",
            "--enc_layers", str(enc_layers),
            "--enc_n_points", str(n_points),
            "--fixed_val_episodes",
            "--seed", "3",
        ])
        train_s = time.perf_counter() - t0

        from cape_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(out_dir)
        ckpt = mgr.best() or mgr.latest()
        assert ckpt, f"no checkpoint under {out_dir}"
        edir = os.path.join(args.root, f"eval_{tag}")
        eval_main([
            "--checkpoint", str(ckpt),
            "--dataset_root", args.root,
            "--category_split_file",
            os.path.join(args.root, "category_splits.json"),
            "--split", "test",
            "--num_episodes", "80",
            "--num_support", "1",
            "--seed", "123",
            "--output_dir", edir,
        ])
        with open(os.path.join(edir, "metrics_test.json")) as f:
            m = json.load(f)
        rec = {"enc_layers": enc_layers, "enc_n_points": n_points,
               "epochs": args.epochs,
               "micro_pck": m["pck"],
               "macro_pck": m["pck_mean_categories"],
               "train_wall_s": round(train_s, 0)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("step", "pck"), required=True)
    ap.add_argument("--configs", default="6:4,4:4,3:4,6:2,4:2",
                    help="comma list of enc_layers:enc_n_points")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--k_hi", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--root", default="/tmp/arch_fixture")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = (run_step_mode(args) if args.mode == "step"
               else run_pck_mode(args))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
