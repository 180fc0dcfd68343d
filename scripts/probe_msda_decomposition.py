#!/usr/bin/env python
"""Decompose the MSDA forward cost: packing vs gather vs blend.

probe_dynamic_gather measured the one-hot MXU gather at 0.434 ms for a
level-0-sized application; all 32 (level, head) gathers should sum to
~4.8 ms — but the full `ms_deform_attn_core` fwd measures 24.1 ms. This
script times truncated versions of the core (same inputs, same loop
structure) to locate the other ~19 ms:

  stage_pack    : _quad_rows packing only (pad+stack+reshape per head/level)
  stage_gather  : packing + one-hot MXU gathers
  stage_blend   : + lane-repeated weight multiply
  stage_full    : the shipped core (blend + summing matmul)

Run (TPU, one job at a time):
    timeout 1800 python scripts/probe_msda_decomposition.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cape_tpu.ops.msda import (_level_offsets, _quad_bases_and_weights,
                               _quad_rows, ms_deform_attn_core)


def make_stage(stage, gather_impl):
    from cape_tpu.ops.gather_mxu import quad_gather

    def f(value, spatial_shapes, sampling_locations, attention_weights):
        B, S, H, Dh = value.shape
        _, Lq, _, L, P, _ = sampling_locations.shape
        offs = _level_offsets(spatial_shapes)
        sum_m = jnp.tile(jnp.eye(Dh, dtype=value.dtype), (P * 4, 1))
        out = jnp.zeros((B, Lq, H * Dh), dtype=value.dtype)
        for lvl, base, w4 in _quad_bases_and_weights(
                spatial_shapes, sampling_locations, attention_weights,
                value.dtype):
            Hl, Wl = spatial_shapes[lvl]
            HW = Hl * Wl
            lv = jax.lax.dynamic_slice_in_dim(value, offs[lvl], HW, 1)
            heads = []
            for h in range(H):
                quad = _quad_rows(lv[:, :, h], Wl)
                if stage == "pack":
                    heads.append(quad[:, :Lq, :Dh] * w4[:, :, h, 0, :1])
                    continue
                gi = base[:, :, h].reshape(B, Lq * P)
                g = quad_gather(quad, gi, impl=gather_impl)
                g = g.reshape(B, Lq, P * 4 * Dh)
                if stage == "gather":
                    heads.append(g[:, :, :Dh] * w4[:, :, h, 0, :1])
                    continue
                w = w4[:, :, h].reshape(B, Lq, P * 4)
                gw = g * jnp.repeat(w, Dh, axis=-1)
                if stage == "blend":
                    heads.append(gw[:, :, :Dh])
                    continue
                heads.append(jnp.einsum("bqk,kd->bqd", gw, sum_m))
            out = out + jnp.concatenate(heads, axis=-1)
        return out

    if stage == "full":
        return ms_deform_attn_core
    return f


def fori_slope(fn, args, ks=(1, 8), reps=3):
    value, shapes, loc, attn = args

    def chain(k):
        @jax.jit
        def run(value, loc, attn):
            def body(_, c):
                v = value + (c * jnp.float32(1e-37)).astype(value.dtype)
                s = fn(v, shapes, loc, attn)[:, 0, :1].sum()
                return s.astype(jnp.float32) * jnp.float32(1e-37)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    times = {}
    for k in ks:
        run = chain(k)
        float(run(value, loc, attn))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(value, loc, attn))
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
    k0, k1 = ks
    return (times[k1] - times[k0]) / (k1 - k0)


def main():
    # flagship encoder shape
    B, H, Dh, P = 4, 8, 32, 4
    shapes = ((64, 64), (32, 32), (16, 16), (8, 8))
    S = sum(h * w for h, w in shapes)
    Lq = S
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    value = jnp.asarray(rng.standard_normal((B, S, H, Dh)), dt)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, H, len(shapes), P, 2)),
                      jnp.float32)
    attn = jnp.asarray(
        rng.dirichlet(np.ones(len(shapes) * P), (B, Lq, H)).reshape(
            B, Lq, H, len(shapes), P), dt)
    args = (value, shapes, loc, attn)

    impl = os.environ.get("CAPE_MSDA_GATHER", "mxu")
    results = {}
    for stage in ("pack", "gather", "blend", "full"):
        fn = make_stage(stage, impl)
        try:
            per = fori_slope(fn, args)
            results[stage] = round(per * 1e3, 2)
        except Exception as e:  # noqa: BLE001
            results[stage] = f"{type(e).__name__}: {str(e)[:150]}"
        print(stage, "->", results[stage], flush=True)
    print(json.dumps({"gather_impl": impl, "stages_ms": results}))


if __name__ == "__main__":
    main()
