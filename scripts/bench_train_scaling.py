#!/usr/bin/env python
"""Train-step batch scaling + MFU on the flagship config (round-3 VERDICT
item 3: re-measure uncontended, device-resident, and add a FLOPs-utilization
account).

For each batch size B: builds the fused train step (fwd+loss+bwd+clip+AdamW),
device-puts one batch, times `reps` executions (p50 AND min — the axon relay
adds 3-10x timing noise, so min approximates the uncontended step), reads
XLA's own FLOPs estimate from `compiled.cost_analysis()`, and reports
queries/sec and MFU vs. the chip's bf16 peak.

Run ONE job at a time on the relay (no concurrent pytest/compiles).

    python scripts/bench_train_scaling.py --batches 4 8 16
    python scripts/bench_train_scaling.py --batches 32 --remat_decoder

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

# bf16 peak FLOP/s per chip: TPU v5e = 197 TFLOP/s (public spec); override
# with PEAK_TFLOPS env for other chips.
PEAK_FLOPS = float(os.environ.get("PEAK_TFLOPS", "197")) * 1e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16])
    p.add_argument("--reps", type=int, default=15)
    p.add_argument("--remat_decoder", action="store_true")
    p.add_argument("--image_size", type=int, default=512)
    args = p.parse_args()

    import jax

    from cape_tpu.config import CAPEConfig
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
    from cape_tpu.models import CAPE
    from cape_tpu.train.state import TrainState, make_optimizer

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    for B in args.batches:
        cfg = CAPEConfig(dropout=0.1, batch_size=B, accumulation_steps=1,
                         image_size=args.image_size,
                         remat_decoder=args.remat_decoder)
        model = CAPE(cfg)
        rng = np.random.default_rng(0)
        S, K, E = cfg.image_size, cfg.max_support_keypoints, cfg.max_skeleton_edges
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

        from cape_tpu.train.train_step import make_train_step
        from cape_tpu.train.state import create_train_state

        state = create_train_state(cfg, params, steps_per_epoch=100)
        step = make_train_step(model, cfg, steps_per_epoch=100)
        dbatch = jax.device_put(batch)
        jrng = jax.device_put(jax.random.PRNGKey(0))

        # trace + compile explicitly to read XLA's FLOPs estimate
        traced = step.lower(state, dbatch, jrng)
        compiled = traced.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan"))) if ca else float("nan")
        step = compiled  # reuse the AOT executable (jit would recompile)

        # Timing on the axon relay: block_until_ready on per-iteration
        # outputs returns early enough to report impossible MFU (>2.0
        # measured), so per-iteration stamps are untrustworthy. Instead
        # time `reps` CHAINED steps end-to-end — each step consumes the
        # previous (donated) state, so the dependency chain forces true
        # cadence — and divide. The final host fetch of a loss scalar and
        # one param leaf is a real device->host sync.
        def run_chain(n):
            nonlocal state
            last = None
            for _ in range(n):
                state, last = step(state, dbatch, jrng)
            float(last["total"])  # sync: scalar fetch walks the chain
            np.asarray(jax.tree_util.tree_leaves(state.params)[0])[:1]
            return last

        run_chain(3)  # compile + warm
        t0 = time.perf_counter()
        run_chain(args.reps)
        dt = time.perf_counter() - t0
        p50 = dt / args.reps
        out = {
            "batch": B,
            "remat_decoder": args.remat_decoder,
            "step_ms_chained_avg": round(p50 * 1e3, 2),
            "queries_per_sec": round(B / p50, 1),
            "xla_flops_per_step": flops,
            "mfu": round(flops / p50 / PEAK_FLOPS, 4)
            if np.isfinite(flops) else None,
        }
        print(json.dumps(out), flush=True)
        del state, compiled, traced, dbatch


if __name__ == "__main__":
    main()
