#!/usr/bin/env python
"""Find the fastest TPU formulation of the MSDA gather core.

Round-3 finding: the flagship train step spends ~95% of its device time in
the 6-layer deformable encoder, i.e. in `ms_deform_attn_core`'s 16
`take_along_axis` gathers (4 levels x 4 bilinear corners) with 32-wide
rows — a shape XLA:TPU lowers catastrophically (~140x off the HBM
roofline). This script times alternative formulations of the SAME function
at the encoder's flagship shape, fwd and fwd+bwd, with the
relay-immune chained-`fori_loop` protocol, and checks each variant against
the reference formulation numerically.

    python scripts/bench_msda_variants.py [--k 4] [--variants v0 v1 ...]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corner_terms(spatial_shapes, sampling_locations, attention_weights,
                 dtype):
    """Shared index/weight math: yields (level, corner) -> (idx, w).

    idx: (B, Lq, H, P) int32 into the flattened level grid (level-local);
    w:   (B, Lq, H, P) combined bilinear * attention weight, zeroed OOB.
    """
    import jax.numpy as jnp

    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]
        w_attn = attention_weights[:, :, :, lvl]
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(dtype)
        fy = (y - y0).astype(dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        for dxi, dyi, wgt in (
            (0, 0, (1 - fx) * (1 - fy)),
            (1, 0, fx * (1 - fy)),
            (0, 1, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            cx = x0i + dxi
            cy = y0i + dyi
            valid = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl)
            idx = jnp.clip(cy, 0, Hl - 1) * Wl + jnp.clip(cx, 0, Wl - 1)
            w = (wgt * valid.astype(dtype) * w_attn).astype(dtype)
            yield lvl, idx, w


def make_variants():
    import jax
    import jax.numpy as jnp

    from cape_tpu.ops.msda import ms_deform_attn_core

    def v0_baseline(value, shapes, loc, attn):
        return ms_deform_attn_core(value, shapes, loc, attn)

    def v1_wide_row(value, shapes, loc, attn):
        """Gather full H*Dh=256-wide rows (lane-aligned) per head index,
        then select the head's channel slice with a tiny one-hot einsum."""
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = loc.shape
        flat = value.reshape(B, S, H * Dh)
        eye = jnp.eye(H, dtype=value.dtype)
        out = jnp.zeros((B, Lq, H, Dh), dtype=value.dtype)
        level_start = 0
        for lvl, idx, w in corner_terms(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            gi = (level_start + idx).reshape(B, Lq * H * P)
            g = jnp.take_along_axis(flat, gi[..., None], axis=1)
            g = g.reshape(B, Lq, H, P, H, Dh)
            # select head h's channel block for head h's samples
            g = jnp.einsum("bqhpkd,hk->bqhpd", g, eye)
            out = out + (g * w[..., None]).sum(axis=3)
            level_start += Hl * Wl
        return out.reshape(B, Lq, H * Dh)

    def v3_onehot_small(value, shapes, loc, attn):
        """One-hot matmul (MXU) for levels with HW <= 1024; wide-row
        gather for the big level(s)."""
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = loc.shape
        out = jnp.zeros((B, Lq, H, Dh), dtype=value.dtype)
        flat = value.reshape(B, S, H * Dh)
        eye = jnp.eye(H, dtype=value.dtype)
        level_start = 0
        for lvl, idx, w in corner_terms(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, level_start, HW, 1)
            if HW <= 1024:
                # (B,Lq,H,P,HW) one-hot contracted on MXU; weight folded in
                oh = jax.nn.one_hot(idx, HW, dtype=value.dtype)
                oh = oh * w[..., None]
                out = out + jnp.einsum("bqhps,bshd->bqhd", oh, lv)
            else:
                gi = (level_start + idx).reshape(B, Lq * H * P)
                g = jnp.take_along_axis(flat, gi[..., None], axis=1)
                g = g.reshape(B, Lq, H, P, H, Dh)
                g = jnp.einsum("bqhpkd,hk->bqhpd", g, eye)
                out = out + (g * w[..., None]).sum(axis=3)
            level_start += HW
        return out.reshape(B, Lq, H * Dh)

    def v4_onehot_all(value, shapes, loc, attn):
        """One-hot matmul for every level (pure MXU, no gathers)."""
        B, S, H, Dh = value.shape
        Lq = loc.shape[1]
        out = jnp.zeros((B, Lq, H, Dh), dtype=value.dtype)
        level_start = 0
        for lvl, idx, w in corner_terms(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, level_start, HW, 1)
            oh = jax.nn.one_hot(idx, HW, dtype=value.dtype) * w[..., None]
            out = out + jnp.einsum("bqhps,bshd->bqhd", oh, lv)
            level_start += HW
        return out.reshape(B, Lq, H * Dh)

    return {
        "v0_baseline": v0_baseline,
        "v1_wide_row": v1_wide_row,
        "v3_onehot_small": v3_onehot_small,
        "v4_onehot_all": v4_onehot_all,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, H, P, Dh = args.batch, 8, 4, 32
    s0 = args.image_size // 8
    shapes = tuple((s0 // (1 << i), s0 // (1 << i)) for i in range(4))
    S = sum(h * w for h, w in shapes)
    Lq = S  # encoder self-attention
    print(f"device: {jax.devices()[0]} shapes={shapes} S={S}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    value = jax.device_put(
        rng.standard_normal((B, S, H, Dh)).astype(np.float32)
        .astype(jnp.bfloat16))
    loc = jax.device_put(
        rng.uniform(-0.05, 1.05, (B, Lq, H, 4, P, 2)).astype(np.float32))
    attn = jax.device_put(
        rng.dirichlet(np.ones(4 * P), (B, Lq, H))
        .reshape(B, Lq, H, 4, P).astype(np.float32).astype(jnp.bfloat16))

    variants = make_variants()
    if args.variants:
        variants = {k: v for k, v in variants.items() if k in args.variants}

    # numerical check vs baseline on a small slice (f32 for tolerance)
    from cape_tpu.ops.msda import ms_deform_attn_core
    vs = np.asarray(value[:1, :, :, :].astype(jnp.float32))
    ls = np.asarray(loc[:1, :64])
    ats = np.asarray(attn[:1, :64].astype(jnp.float32))
    ref = np.asarray(ms_deform_attn_core(
        jnp.asarray(vs), shapes, jnp.asarray(ls), jnp.asarray(ats)))

    results = {}
    for name, fn in variants.items():
        if name != "v0_baseline":
            got = np.asarray(fn(jnp.asarray(vs), shapes, jnp.asarray(ls),
                                jnp.asarray(ats)))
            err = float(np.max(np.abs(got - ref)))
            print(f"{name}: max abs err vs baseline {err:.2e}",
                  file=sys.stderr)
            if err > 1e-3:
                print(f"{name}: INCORRECT, skipping timing", file=sys.stderr)
                results[name] = {"error": err}
                continue

        def tgt_fwd(v, l, a):
            return jnp.sum(fn(v, shapes, l, a).astype(jnp.float32))

        def tgt_bwd(v, l, a):
            g = jax.grad(
                lambda vv, ll, aa: jnp.sum(
                    fn(vv, shapes, ll, aa).astype(jnp.float32)),
                argnums=(0, 2))(v, l, a)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        entry = {}
        for tag, tgt in (("fwd", tgt_fwd),) + (
                () if args.fwd_only else (("fwd_bwd", tgt_bwd),)):
            @jax.jit
            def run(c0):
                def body(i, c):
                    eps = (c * jnp.float32(1e-37))
                    return (tgt(value + eps.astype(value.dtype), loc, attn)
                            * jnp.float32(1e-37)).astype(jnp.float32)
                return jax.lax.fori_loop(0, args.k, body, c0)

            try:
                out = run(jnp.float32(0.0))
                float(out)
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    out = run(jnp.float32(0.0))
                    float(out)
                    ts.append(time.perf_counter() - t0)
            except Exception as e:  # e.g. RESOURCE_EXHAUSTED on v4
                entry[tag] = f"failed: {type(e).__name__}"
                print(f"{name} {tag}: FAILED {e}", file=sys.stderr,
                      flush=True)
                continue
            ms = min(ts) / args.k * 1e3
            entry[tag] = round(ms, 2)
            print(f"{name} {tag}: {ms:.1f} ms", file=sys.stderr, flush=True)
        results[name] = entry

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
