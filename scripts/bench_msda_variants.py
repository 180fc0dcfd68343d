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


def level_offsets(spatial_shapes):
    offs, start = [], 0
    for (h, w) in spatial_shapes:
        offs.append(start)
        start += h * w
    return offs


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
        offs = level_offsets(shapes)
        for lvl, idx, w in corner_terms(shapes, loc, attn, value.dtype):
            gi = (offs[lvl] + idx).reshape(B, Lq * H * P)
            g = jnp.take_along_axis(flat, gi[..., None], axis=1)
            g = g.reshape(B, Lq, H, P, H, Dh)
            # select head h's channel block for head h's samples
            g = jnp.einsum("bqhpkd,hk->bqhpd", g, eye)
            out = out + (g * w[..., None]).sum(axis=3)
        return out.reshape(B, Lq, H * Dh)

    def v3_onehot_small(value, shapes, loc, attn):
        """One-hot matmul (MXU) for levels with HW <= 1024; wide-row
        gather for the big level(s)."""
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = loc.shape
        out = jnp.zeros((B, Lq, H, Dh), dtype=value.dtype)
        flat = value.reshape(B, S, H * Dh)
        eye = jnp.eye(H, dtype=value.dtype)
        offs = level_offsets(shapes)
        for lvl, idx, w in corner_terms(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, offs[lvl], HW, 1)
            if HW <= 1024:
                # (B,Lq,H,P,HW) one-hot contracted on MXU; weight folded in
                oh = jax.nn.one_hot(idx, HW, dtype=value.dtype)
                oh = oh * w[..., None]
                out = out + jnp.einsum("bqhps,bshd->bqhd", oh, lv)
            else:
                gi = (offs[lvl] + idx).reshape(B, Lq * H * P)
                g = jnp.take_along_axis(flat, gi[..., None], axis=1)
                g = g.reshape(B, Lq, H, P, H, Dh)
                g = jnp.einsum("bqhpkd,hk->bqhpd", g, eye)
                out = out + (g * w[..., None]).sum(axis=3)
        return out.reshape(B, Lq, H * Dh)

    def v4_onehot_all(value, shapes, loc, attn):
        """One-hot matmul for every level (pure MXU, no gathers)."""
        B, S, H, Dh = value.shape
        Lq = loc.shape[1]
        out = jnp.zeros((B, Lq, H, Dh), dtype=value.dtype)
        offs = level_offsets(shapes)
        for lvl, idx, w in corner_terms(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, offs[lvl], HW, 1)
            oh = jax.nn.one_hot(idx, HW, dtype=value.dtype) * w[..., None]
            out = out + jnp.einsum("bqhps,bshd->bqhd", oh, lv)
        return out.reshape(B, Lq, H * Dh)

    def _quad_level(lv, Wl):
        """(B, HW, Dh) level slice -> (B, F+HW+W+1, 4*Dh) quad rows where
        row s holds [v[s], v[s+1], v[s+W], v[s+W+1]] (F = W+1 front pad so
        base indices down to -W-1 stay in range; OOB corners carry zero
        attention weight so garbage neighbors are harmless)."""
        B, HW, Dh = lv.shape
        F = Wl + 1
        vp = jnp.pad(lv, ((0, 0), (F, Wl + 1), (0, 0)))
        n = F + HW  # quad rows cover base indices s in [-F, HW-1]
        quad = jnp.stack(
            [vp[:, 0:n], vp[:, 1:n + 1],
             vp[:, Wl:n + Wl], vp[:, Wl + 1:n + Wl + 1]], axis=2)
        return quad.reshape(B, n, 4 * Dh)

    def quad_corners(shapes, loc, attn, dtype):
        """Base index (into the F-padded quad array) + 4 corner weights."""
        for lvl, (Hl, Wl) in enumerate(shapes):
            l_ = loc[:, :, :, lvl]
            w_attn = attn[:, :, :, lvl]
            x = l_[..., 0] * Wl - 0.5
            y = l_[..., 1] * Hl - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = (x - x0).astype(dtype)
            fy = (y - y0).astype(dtype)
            x0u = x0.astype(jnp.int32)
            y0u = y0.astype(jnp.int32)
            x0i = jnp.clip(x0u, -1, Wl - 1)
            y0i = jnp.clip(y0u, -1, Hl - 1)
            base = (Wl + 1) + y0i * Wl + x0i  # F offset folded in
            ws = []
            for dxi, dyi, wgt in (
                (0, 0, (1 - fx) * (1 - fy)),
                (1, 0, fx * (1 - fy)),
                (0, 1, (1 - fx) * fy),
                (1, 1, fx * fy),
            ):
                # validity from the UNCLIPPED corner (clipped base would
                # claim an in-range neighbor for a truly OOB corner)
                cx = x0u + dxi
                cy = y0u + dyi
                valid = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl) & \
                    (x0u == x0i) & (y0u == y0i)
                ws.append((wgt * valid.astype(dtype) * w_attn).astype(dtype))
            yield lvl, base, jnp.stack(ws, axis=-1)  # (B,Lq,H,P,4)

    def v5_quad_head(value, shapes, loc, attn):
        """Per-(level, head) gather of 4*Dh=128-wide quad rows: one gather
        per sample covering all 4 bilinear corners."""
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = loc.shape
        out = jnp.zeros((B, Lq, H, Dh), dtype=value.dtype)
        level_start = 0
        for lvl, base, w4 in quad_corners(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, level_start, HW, 1)
            per_head = []
            for h in range(H):
                quad = _quad_level(lv[:, :, h], Wl)  # (B, pad+HW+pad, 4Dh)
                gi = base[:, :, h].reshape(B, Lq * P)
                g = jnp.take_along_axis(quad, gi[..., None], axis=1)
                g = g.reshape(B, Lq, P, 4, Dh)
                per_head.append(
                    (g * w4[:, :, h][..., None]).sum(axis=(2, 3)))
            out = out + jnp.stack(per_head, axis=2)
            level_start += HW
        return out.reshape(B, Lq, H * Dh)

    def v7_quad_headbatch(value, shapes, loc, attn):
        """Quad rows with heads folded into the gather batch dim: ONE
        take_along_axis per level (4 total) instead of 8 per level."""
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = loc.shape
        offs = level_offsets(shapes)
        out = jnp.zeros((B, H, Lq, Dh), dtype=value.dtype)
        for lvl, base, w4 in quad_corners(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, offs[lvl], HW, 1)
            lv = jnp.moveaxis(lv, 2, 1).reshape(B * H, HW, Dh)
            quad = _quad_level(lv, Wl)  # (B*H, n, 4*Dh)
            gi = jnp.moveaxis(base, 2, 1).reshape(B * H, Lq * P)
            g = jnp.take_along_axis(quad, gi[..., None], axis=1)
            g = g.reshape(B, H, Lq, P, 4, Dh)
            w4h = jnp.moveaxis(w4, 2, 1)  # (B,H,Lq,P,4)
            out = out + (g * w4h[..., None]).sum(axis=(3, 4))
        return jnp.moveaxis(out, 1, 2).reshape(B, Lq, H * Dh)

    def probe_pure_gather(value, shapes, loc, attn):
        """Lower bound: the v5 gathers alone (no weight math, no
        interpolation) — NOT the same function; exempt from the
        correctness check."""
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = loc.shape
        offs = level_offsets(shapes)
        acc = jnp.zeros((B, Lq * P, 4 * Dh), dtype=value.dtype)
        for lvl, (Hl, Wl) in enumerate(shapes):
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, offs[lvl], HW, 1)
            l_ = loc[:, :, :, lvl]
            x = (l_[..., 0] * Wl - 0.5).astype(jnp.int32)
            y = (l_[..., 1] * Hl - 0.5).astype(jnp.int32)
            base = jnp.clip((Wl + 1) + y * Wl + x, 0, HW + Wl)
            for h in range(H):
                quad = _quad_level(lv[:, :, h], Wl)
                gi = base[:, :, h].reshape(B, Lq * P)
                acc = acc + jnp.take_along_axis(quad, gi[..., None], axis=1)
        return acc.reshape(B, Lq, P * 4 * H * Dh // H)[:, :, :H * Dh]

    def v8_quad_matmul(value, shapes, loc, attn):
        """Quad rows + corner/point reduction via a constant MXU matmul:
        the gathered (B, Lq, P*4*Dh) stays 512-wide (lane-aligned, no
        narrow-minor temps); weights repeat along lanes; a fixed
        (P*4*Dh, Dh) summing matrix folds corners AND points at once."""
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = loc.shape
        offs = level_offsets(shapes)
        M = jnp.tile(jnp.eye(Dh, dtype=value.dtype), (P * 4, 1))
        out = jnp.zeros((B, Lq, H * Dh), dtype=value.dtype)
        for lvl, base, w4 in quad_corners(shapes, loc, attn, value.dtype):
            Hl, Wl = shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, offs[lvl], HW, 1)
            heads = []
            for h in range(H):
                quad = _quad_level(lv[:, :, h], Wl)
                gi = base[:, :, h].reshape(B, Lq * P)
                g = jnp.take_along_axis(quad, gi[..., None], axis=1)
                g = g.reshape(B, Lq, P * 4 * Dh)
                w = w4[:, :, h].reshape(B, Lq, P * 4)
                gw = g * jnp.repeat(w, Dh, axis=-1)
                heads.append(jnp.einsum("bqk,kd->bqd", gw, M))
            out = out + jnp.concatenate(heads, axis=-1)
        return out

    def v9_quad_mxu(value, shapes, loc, attn):
        """Production quad-row path with the gather swapped for the
        one-hot MXU Pallas kernel (`ops/gather_mxu.py`): the one-hot tile
        is generated in VMEM, so the matmul trick pays no HBM traffic
        (unlike v4's XLA one-hot, which round-trips ~GBs)."""
        return ms_deform_attn_core(value, shapes, loc, attn,
                                   gather_impl="mxu")

    def v10_fused(value, shapes, loc, attn):
        """Single-kernel weighted-one-hot formulation (ops/msda_fused.py):
        bilinear+attention weights folded into the one-hot matrix, one MXU
        matmul per (level, head) against the raw level slab — no quad
        packing, no wide HBM temps, 4x fewer MXU MACs than v9."""
        return ms_deform_attn_core(value, shapes, loc, attn,
                                   gather_impl="fused")

    def v11_quadfused(value, shapes, loc, attn):
        """Quad slab (XLA packing) + single kernel for gather/blend/
        corner-sum (ops/msda_fused.py quadfused): one compare per row like
        v9 but the 512-wide temps never touch HBM."""
        return ms_deform_attn_core(value, shapes, loc, attn,
                                   gather_impl="fusedq")

    return {
        "v0_baseline": v0_baseline,
        "v10_fused": v10_fused,
        "v11_quadfused": v11_quadfused,
        "probe_pure_gather": probe_pure_gather,
        "v8_quad_matmul": v8_quad_matmul,
        "v9_quad_mxu": v9_quad_mxu,
        "v1_wide_row": v1_wide_row,
        "v3_onehot_small": v3_onehot_small,
        "v4_onehot_all": v4_onehot_all,
        "v5_quad_head": v5_quad_head,
        "v7_quad_headbatch": v7_quad_headbatch,
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
    vs = jnp.asarray(np.asarray(value[:1].astype(jnp.float32)))
    ls = jnp.asarray(np.asarray(loc[:1, :64]))
    ats = jnp.asarray(np.asarray(attn[:1, :64].astype(jnp.float32)))
    ref = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn_core(v, shapes, l, a))(vs, ls, ats))

    results = {}
    for name, fn in variants.items():
        if name != "v0_baseline" and not name.startswith("probe_"):
            got = np.asarray(jax.jit(
                lambda v, l, a, f=fn: f(v, shapes, l, a))(vs, ls, ats))
            err = float(np.max(np.abs(got - ref)))
            print(f"{name}: max abs err vs baseline {err:.2e}",
                  file=sys.stderr)
            # TPU f32 einsums accumulate through bf16 MXU passes ->
            # ~2e-3 absolute error is a precision artifact, not a bug
            # (CPU check is exact); threshold accommodates it.
            if not (err <= 5e-3):  # catches NaN too
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
