#!/usr/bin/env python
"""Decode scaling sweep: MSDA tiny-site impl x batch x sequence length.

Round-4 VERDICT items 1 and 3 need one dataset: how does the jitted
autoregressive decode (flagship config, forced length) scale in batch
size under each tiny-site MSDA backend, and how does the per-episode
cost split into a fixed (encoder) part and a per-token part?

One process, ONE model.init (eager init through the tunneled relay costs
minutes — the sweep re-jits per setting instead): for every (impl, B)
the decode is re-traced with CAPE_MSDA_TINY set, timed with the queued-N
protocol (N dependent-order dispatches bounded by one device fetch —
relay-immune, PERF.md round 3). `--encode_only` times just the
backbone+encoder+support phase so fixed cost is measured, not inferred.

    timeout 7200 python scripts/probe_decode_sweep.py \
        --impls mxu,flat,xla --batches 1,8,32 --out /tmp/decode_sweep.json
    timeout 3600 python scripts/probe_decode_sweep.py \
        --impls mxu --batches 1 --lengths 8,18,40,69
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="mxu,flat,xla",
                    help="comma list for CAPE_MSDA_TINY (decode tiny sites)")
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--lengths", default="18",
                    help="comma list of forced decode lengths")
    ap.add_argument("--max_len", default="off",
                    help="'off' = full seq_len KV caches (the round-4 "
                         "default), 'auto' = force_length+6 rounded up "
                         "to 8 (the eval CLI's decode_max_len=auto "
                         "production default), or an integer")
    ap.add_argument("--encode_only", action="store_true")
    ap.add_argument("--queue", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cape_tpu.config import CAPEConfig
    from cape_tpu.models import CAPE
    from cape_tpu.models.cape import autoregressive_decode

    cfg = CAPEConfig(dropout=0.0, bf16=True)
    model = CAPE(cfg)
    rng = np.random.default_rng(0)
    S, K, E = cfg.image_size, cfg.max_support_keypoints, cfg.max_skeleton_edges
    maxB = max(int(b) for b in args.batches.split(","))
    images = rng.uniform(size=(maxB, S, S, 3)).astype(np.float32)
    sc = rng.uniform(size=(maxB, K, 2)).astype(np.float32)
    sm = np.zeros((maxB, K), bool)
    sm[:, 17:] = True
    edges = np.full((maxB, E, 2), -1, np.int32)

    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    t = tokenize_keypoints(tok, rng.uniform(5, S - 5, (17, 2)), S, S)
    t0 = time.perf_counter()
    # jitted init: ONE compiled dispatch instead of thousands of eager ops
    # through the tunneled relay (measured: eager 1178s -> jitted ~60s)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), images[:1], sc[:1], sm[:1],
        edges[:1], {k: v[None] for k, v in t.items()})
    print(f"init: {time.perf_counter() - t0:.0f}s", file=sys.stderr,
          flush=True)

    def timed_queue(fn, fetch, n, reps):
        fetch(fn())  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            fetch(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    results = []
    for impl in args.impls.split(","):
        os.environ["CAPE_MSDA_TINY"] = impl
        for b in (int(x) for x in args.batches.split(",")):
            im, c, m, e = images[:b], sc[:b], sm[:b], edges[:b]
            if args.encode_only:
                # reduce the outputs to ONE scalar on device so the sync
                # fetch moves 4 bytes, not the whole (B, S', D) memory —
                # the 2026-08-20 run fetched the full encoder memory
                # (2.8 MB/episode) through the tunneled relay and reported
                # transfer time as encode time (80 ms "encode" vs a 62 ms
                # whole-episode encoder bound from the zero ablation).
                enc = jax.jit(lambda i, c_, m_, e_: sum(
                    jnp.sum(l.astype(jnp.float32)) for l in
                    jax.tree_util.tree_leaves((
                        model.apply(params, i, method=CAPE.encode_image),
                        model.apply(params, c_, m_, e_,
                                    method=CAPE.encode_support)))))
                tq = timed_queue(
                    lambda: enc(im, c, m, e),
                    lambda o: np.asarray(o),
                    args.queue, args.reps)
                rec = {"impl": impl, "batch": b, "phase": "encode",
                       "ms": round(tq * 1e3, 2),
                       "ms_per_episode": round(tq * 1e3 / b, 2)}
                results.append(rec)
                print(json.dumps(rec), flush=True)
                continue
            for fl in (int(x) for x in args.lengths.split(",")):
                if args.max_len == "auto":
                    ml = min(cfg.seq_len, -(-(fl + 6) // 8) * 8)
                elif args.max_len == "off":
                    ml = None
                else:
                    ml = min(cfg.seq_len, int(args.max_len))
                decode = jax.jit(
                    lambda p, i, c_, m_, e_, fl=fl, ml=ml:
                    autoregressive_decode(
                        model, p, i, c_, m_, e_, force_length=fl,
                        max_len=ml))
                t0 = time.perf_counter()
                out = decode(params, im, c, m, e)
                np.asarray(out["pred_coords"]).ravel()[:1]
                compile_s = time.perf_counter() - t0
                tq = timed_queue(
                    lambda: decode(params, im, c, m, e),
                    lambda o: np.asarray(o["pred_coords"]).ravel()[:1],
                    args.queue, args.reps)
                rec = {"impl": impl, "batch": b, "force_length": fl,
                       "max_len": ml,
                       "ms": round(tq * 1e3, 2),
                       "ms_per_episode": round(tq * 1e3 / b, 2),
                       "eps_per_sec": round(b / tq, 1),
                       "compile_s": round(compile_s, 1)}
                results.append(rec)
                print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
