#!/usr/bin/env python
"""K-shot noise-response curve: PCK vs support-coordinate noise, K=1 vs 5.

Round-5 follow-up to `run_kshot_demo.py`: at sigma=0.1 the 1-shot and
5-shot PCKs measured EQUAL (11.9% vs 12.0% micro) even though the noise
cut clean PCK from ~37% to ~12% — i.e. the degradation had already
saturated below the sqrt(5)-denoised sigma_eff=0.045, so mean-pooling
(`/root/reference/datasets/episodic_sampler.py:434-442`) had nothing
left to recover. This probe maps the actual response curve so the
K-shot comparison is made INSIDE the responsive region: evaluate ONE
trained checkpoint over sigma x K, one process (the jitted decode
compiles once; support count changes only host-side collate).

    timeout 7200 python scripts/probe_kshot_noise_curve.py \
        --root /tmp/kshot_clean --sigmas 0,0.02,0.05,0.1 \
        --num_eval_episodes 240 --out /tmp/kshot_curve.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/kshot_clean")
    ap.add_argument("--sigmas", default="0,0.02,0.05,0.1")
    ap.add_argument("--ks", default="1,5")
    ap.add_argument("--num_eval_episodes", type=int, default=240)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from cape_tpu.cli.evaluate import main as eval_main
    from cape_tpu.utils.checkpoint import CheckpointManager

    out_dir = os.path.join(args.root, "out")
    mgr = CheckpointManager(out_dir)
    ckpt = mgr.best() or mgr.latest()
    assert ckpt, f"no checkpoint under {out_dir}"
    print(f"checkpoint: {ckpt}", flush=True)

    results = []
    for sigma in (float(s) for s in args.sigmas.split(",")):
        for k in (int(x) for x in args.ks.split(",")):
            edir = os.path.join(args.root, f"eval_s{sigma}_k{k}")
            eval_main([
                "--checkpoint", str(ckpt),
                "--dataset_root", args.root,
                "--category_split_file",
                os.path.join(args.root, "category_splits.json"),
                "--split", "test",
                "--num_episodes", str(args.num_eval_episodes),
                "--num_support", str(k),
                "--support_coord_noise", str(sigma),
                "--seed", "123",
                "--output_dir", edir,
            ])
            with open(os.path.join(edir, "metrics_test.json")) as f:
                m = json.load(f)
            rec = {"sigma": sigma, "k": k, "micro_pck": m["pck"],
                   "macro_pck": m["pck_mean_categories"]}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
