#!/usr/bin/env python
"""Isolate TRUE on-device train-step time through the axon relay.

Wall-timing individual dispatches through the relay is hopeless: per-call
overhead is seconds-scale and varies 3-10x with relay contention
(PERF.md round-3 note). Instead this runs K chained train steps INSIDE one
jitted computation (`lax.fori_loop` over the fused step body, same batch
every iteration) and times one execute call per K. Then

    T(K) = relay_overhead + K * device_step

so the slope between two K values is the honest device step time, immune
to relay round-trip costs, and the intercept measures the relay overhead
itself. MFU = XLA cost-analysis FLOPs(1 step) * slope^-1 / chip peak.

    python scripts/bench_device_step.py --batch 4 --ks 1 8
    PEAK_TFLOPS=197 python scripts/bench_device_step.py --batch 16

Prints one JSON line per batch size.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[4])
    p.add_argument("--ks", type=int, nargs="+", default=[1, 8],
                   help="two fori_loop trip counts; slope taken between them")
    p.add_argument("--reps", type=int, default=3,
                   help="timed executions per K (min taken)")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--remat_decoder", action="store_true")
    p.add_argument("--no_remat_encoder", action="store_true")
    p.add_argument("--no_dropout", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cape_tpu.config import CAPEConfig
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
    from cape_tpu.models import CAPE
    from cape_tpu.train.state import create_train_state
    from cape_tpu.train.train_step import make_train_step

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    k_lo, k_hi = min(args.ks), max(args.ks)
    assert k_hi > k_lo, "need two distinct K values for the slope"

    for B in args.batch:
        cfg = CAPEConfig(dropout=0.0 if args.no_dropout else 0.1,
                         batch_size=B, accumulation_steps=1,
                         image_size=args.image_size,
                         remat_decoder=args.remat_decoder,
                         remat_encoder=(False if args.no_remat_encoder
                                        else None))
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

        params = model.init(jax.random.PRNGKey(0), batch["query_images"][:1],
                            batch["support_coords"][:1],
                            batch["support_mask"][:1],
                            batch["skeleton_edges"][:1],
                            {k: v[:1] for k, v in batch["targets"].items()})
        state0 = create_train_state(cfg, params, steps_per_epoch=100)
        step = make_train_step(model, cfg, steps_per_epoch=100)

        # FLOPs for ONE step, from the single-step executable
        dbatch = jax.device_put(batch)
        jrng = jax.device_put(jax.random.PRNGKey(0))
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
                return st.step, jax.tree_util.tree_leaves(st.params)[0][..., :1]
            return run

        results = {}
        for k in (k_lo, k_hi):
            run = k_steps(k)
            sstep, leaf = run(state0, dbatch, jrng)  # compile + warm
            int(sstep)
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                sstep, leaf = run(state0, dbatch, jrng)
                int(sstep)          # device->host scalar fetch = hard sync
                np.asarray(leaf).ravel()[:1]
                ts.append(time.perf_counter() - t0)
            results[k] = float(np.min(ts))
            print(f"B={B} K={k}: times {[round(x, 3) for x in ts]}",
                  file=sys.stderr)

        slope = (results[k_hi] - results[k_lo]) / (k_hi - k_lo)
        intercept = results[k_lo] - slope * k_lo
        out = {
            "batch": B,
            "remat_decoder": args.remat_decoder,
            "device_step_ms": round(slope * 1e3, 2),
            "relay_overhead_ms": round(intercept * 1e3, 1),
            "queries_per_sec_device": round(B / slope, 1) if slope > 0 else None,
            "xla_flops_per_step": flops,
            "mfu": round(flops / slope / PEAK_FLOPS, 4)
            if (np.isfinite(flops) and slope > 0) else None,
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
