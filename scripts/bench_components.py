#!/usr/bin/env python
"""Per-component device-time breakdown of the flagship train step.

Times each stage of the model (backbone / encoder / support encoder /
decoder / full forward / forward+backward / full optimizer step) with the
same relay-immune protocol as `bench_device_step.py`: K executions chained
inside one jitted `lax.fori_loop` (a carry-perturbed input defeats CSE), one
host sync per K, time/K reported. Used to localize the device-step cost
(round-3: the honest step time is ~2.8 s at B=4 vs an ~8 ms FLOPs bound —
something specific is pathological, this script says what).

    python scripts/bench_components.py --batch 4 [--k 8] [--fp32] [--no_dropout]

Prints one JSON line {component: ms} at the end.
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no_dropout", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of component names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cape_tpu.config import CAPEConfig
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
    from cape_tpu.models import CAPE
    from cape_tpu.models.cape import level_shapes
    from cape_tpu.train.state import create_train_state
    from cape_tpu.train.train_step import make_train_step

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    B = args.batch
    cfg = CAPEConfig(dropout=0.0 if args.no_dropout else 0.1,
                     batch_size=B, accumulation_steps=1,
                     image_size=args.image_size, bf16=not args.fp32)
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

    variables = model.init(jax.random.PRNGKey(0), batch["query_images"][:1],
                           batch["support_coords"][:1],
                           batch["support_mask"][:1],
                           batch["skeleton_edges"][:1],
                           {k: v[:1] for k, v in batch["targets"].items()})
    params = variables["params"]
    dbatch = jax.device_put(batch)
    dparams = jax.device_put(params)

    shapes = level_shapes(cfg.image_size, cfg.num_feature_levels,
                          dilation=cfg.dilation)
    D = cfg.hidden_dim
    dt = jnp.float32 if args.fp32 else jnp.bfloat16
    srcs = [jax.device_put(
        rng.standard_normal((B, h, w, D)).astype(np.float32).astype(dt))
        for (h, w) in shapes]
    n_mem = sum(h * w for h, w in shapes)
    memory = jax.device_put(
        rng.standard_normal((B, n_mem, D)).astype(np.float32).astype(dt))
    support = jax.device_put(
        rng.standard_normal((B, K, D)).astype(np.float32).astype(dt))
    det = args.no_dropout
    drop_rng = jax.device_put(jax.random.PRNGKey(1))

    def eps_of(c):
        return (c * jnp.float32(1e-37)).astype(jnp.float32)

    def apply_m(method, *a, rngs=None):
        kw = {} if det else {"rngs": {"dropout": drop_rng}}
        return model.apply({"params": dparams}, *a, method=method,
                           deterministic=det, **kw)

    seq_kwargs = {k: dbatch["targets"][k] for k in (
        "seq11", "seq12", "seq21", "seq22",
        "delta_x1", "delta_x2", "delta_y1", "delta_y2")}

    def backbone_fn(c):
        imgs = dbatch["query_images"] + eps_of(c)
        feats = apply_m(
            lambda m, x, deterministic: m.backbone(x.astype(m.dtype)), imgs)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def encoder_fn(c):
        s = [srcs[0] + eps_of(c).astype(srcs[0].dtype)] + srcs[1:]
        mem = apply_m(
            lambda m, ss, deterministic: m.encode_features(
                ss, deterministic=deterministic), s)
        return jnp.sum(mem.astype(jnp.float32))

    def support_fn(c):
        sc = dbatch["support_coords"] + eps_of(c)
        sup = apply_m(
            lambda m, a, b_, e, deterministic: m.encode_support(
                a, b_, e, deterministic=deterministic),
            sc, dbatch["support_mask"], dbatch["skeleton_edges"])
        return jnp.sum(sup.astype(jnp.float32))

    def decoder_fn(c):
        mem = memory + eps_of(c).astype(memory.dtype)
        classes, refs = apply_m(
            lambda m, sk, me, sup, sm, deterministic: m.decoder.forward_train(
                sk, me, m.spatial_shapes, sup, sm,
                deterministic=deterministic),
            seq_kwargs, mem, support, dbatch["support_mask"])
        return jnp.sum(classes.astype(jnp.float32)) + \
            jnp.sum(refs.astype(jnp.float32))

    def forward_fn(c):
        imgs = dbatch["query_images"] + eps_of(c)
        kw = {} if det else {"rngs": {"dropout": drop_rng}}
        out = model.apply({"params": dparams}, imgs,
                          dbatch["support_coords"], dbatch["support_mask"],
                          dbatch["skeleton_edges"], dbatch["targets"],
                          deterministic=det, **kw)
        return jnp.sum(out["pred_logits"]) + jnp.sum(out["pred_coords"])

    from cape_tpu.losses import cape_criterion

    def fwd_bwd_fn(c):
        imgs = dbatch["query_images"] + eps_of(c)

        def loss(p):
            kw = {} if det else {"rngs": {"dropout": drop_rng}}
            out = model.apply({"params": p}, imgs,
                              dbatch["support_coords"],
                              dbatch["support_mask"],
                              dbatch["skeleton_edges"], dbatch["targets"],
                              deterministic=det, **kw)
            return cape_criterion(out, dbatch["targets"], cfg)["total"]

        g = jax.grad(loss)(dparams)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g))

    components = {
        "backbone_fwd": backbone_fn,
        "support_fwd": support_fn,
        "encoder_fwd": encoder_fn,
        "decoder_fwd": decoder_fn,
        "full_fwd": forward_fn,
        "fwd_bwd": fwd_bwd_fn,
    }
    if args.only:
        components = {k: v for k, v in components.items() if k in args.only}

    results = {}
    for name, fn in components.items():
        @jax.jit
        def run(c0):
            def body(i, c):
                # carry feeds the next iteration's input (defeats CSE)
                return (fn(c) * jnp.float32(1e-37)).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.k, body, c0)

        c0 = jnp.float32(0.0)
        out = run(c0)
        float(out)  # compile + warm, hard sync
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = run(c0)
            float(out)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / args.k * 1e3
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.1f} ms/iter (times {[round(x,2) for x in ts]})",
              file=sys.stderr, flush=True)

    # full optimizer step via the chained-dispatch protocol (donated state)
    if args.only is None or "train_step" in (args.only or []):
        state = create_train_state(cfg, variables, steps_per_epoch=100)
        step = make_train_step(model, cfg, steps_per_epoch=100)
        jrng = jax.device_put(jax.random.PRNGKey(0))
        m = None
        for _ in range(2):
            state, m = step(state, dbatch, jrng)
        float(m["total"])
        t0 = time.perf_counter()
        for _ in range(args.k):
            state, m = step(state, dbatch, jrng)
        float(m["total"])
        results["train_step_chained"] = round(
            (time.perf_counter() - t0) / args.k * 1e3, 2)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
