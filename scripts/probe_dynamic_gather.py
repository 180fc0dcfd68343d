#!/usr/bin/env python
"""Probe Mosaic-lowerable dynamic row-gather kernels vs the one-hot MXU
kernel (`ops/gather_mxu.py`).

The MSDA hot loop is a row gather; the shipped one-hot formulation costs
R x n x C MACs per block (measured 24.1 ms fwd at the flagship shape,
~4.5x its own MXU roofline). A VMEM dynamic-slice gather would cost only
the row reads. Mosaic cannot lower `take_along_axis`, but single-row
dynamic slices (`ref[pl.ds(idx, 1), :]`) may lower — this script finds
out ON DEVICE, validates each candidate, and fori-slope times the
winners at the flagship level-0 shape.

Run (TPU, one job at a time on the relay):
    timeout 1200 python scripts/probe_dynamic_gather.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:
    pltpu = None

_BLOCK_ROWS = 256


def _pad_to(x, m):
    return -(-x // m) * m


# ---- candidate A: fori_loop of single-row dynamic slices ----------------
def _kern_rowloop(unroll, gi_ref, slab_ref, out_ref):
    r = out_ref.shape[1]

    def body(j, _):
        idx = gi_ref[0, j, 0]
        out_ref[0, pl.ds(j, 1), :] = slab_ref[0, pl.ds(idx, 1), :]
        return 0

    jax.lax.fori_loop(0, r, body, 0, unroll=unroll)


def make_rowloop(unroll):
    def f(quad, gi):
        B, n, C = quad.shape
        _, N = gi.shape
        Npad = _pad_to(N, _BLOCK_ROWS)
        gi_p = jnp.pad(gi, ((0, 0), (0, Npad - N)))[..., None]
        out = pl.pallas_call(
            functools.partial(_kern_rowloop, unroll),
            grid=(B, Npad // _BLOCK_ROWS),
            in_specs=[
                pl.BlockSpec((1, _BLOCK_ROWS, 1), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, n, C), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _BLOCK_ROWS, C), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Npad, C), quad.dtype),
        )(gi_p, quad)
        return out[:, :N]

    return f


# ---- candidate B: 8 rows/iter, concatenated, one aligned 8-row store ----
def _kern_row8(gi_ref, slab_ref, out_ref):
    r = out_ref.shape[1]

    def body(j, _):
        base = pl.multiple_of(j * 8, 8)
        rows = jnp.concatenate(
            [slab_ref[0, pl.ds(gi_ref[0, j * 8 + k, 0], 1), :]
             for k in range(8)], axis=0)
        out_ref[0, pl.ds(base, 8), :] = rows
        return 0

    jax.lax.fori_loop(0, r // 8, body, 0)


def make_row8():
    def f(quad, gi):
        B, n, C = quad.shape
        _, N = gi.shape
        Npad = _pad_to(N, _BLOCK_ROWS)
        gi_p = jnp.pad(gi, ((0, 0), (0, Npad - N)))[..., None]
        out = pl.pallas_call(
            _kern_row8,
            grid=(B, Npad // _BLOCK_ROWS),
            in_specs=[
                pl.BlockSpec((1, _BLOCK_ROWS, 1), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, n, C), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _BLOCK_ROWS, C), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Npad, C), quad.dtype),
        )(gi_p, quad)
        return out[:, :N]

    return f


# ---- candidate C: scalar-prefetched indices in SMEM ---------------------
def _kern_sprefetch(gi_ref, slab_ref, out_ref):
    # gi_ref: full (B, Npad) int32 in SMEM (scalar-prefetch arg)
    b = pl.program_id(0)
    i = pl.program_id(1)
    r = out_ref.shape[1]

    def body(j, _):
        idx = gi_ref[b, i * r + j]
        out_ref[0, pl.ds(j, 1), :] = slab_ref[0, pl.ds(idx, 1), :]
        return 0

    jax.lax.fori_loop(0, r, body, 0)


def make_sprefetch():
    if pltpu is None:
        raise RuntimeError("no pltpu")

    def f(quad, gi):
        B, n, C = quad.shape
        _, N = gi.shape
        Npad = _pad_to(N, _BLOCK_ROWS)
        gi_p = jnp.pad(gi, ((0, 0), (0, Npad - N)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Npad // _BLOCK_ROWS),
            in_specs=[pl.BlockSpec((1, n, C), lambda b, i, gi_r: (b, 0, 0))],
            out_specs=pl.BlockSpec(
                (1, _BLOCK_ROWS, C), lambda b, i, gi_r: (b, i, 0)),
        )
        out = pl.pallas_call(
            _kern_sprefetch,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, Npad, C), quad.dtype),
        )(gi_p, quad)
        return out[:, :N]

    return f


# ---- harness -------------------------------------------------------------
def fori_slope(fn, args, ks=(1, 8), reps=3):
    """Device time per application via the K-slope protocol (PERF.md).

    The carry feeds back into the gather operand so XLA cannot hoist the
    loop-invariant body (same trick as bench_msda_variants.py)."""

    def chain(k):
        @jax.jit
        def run(quad, gi):
            def body(_, c):
                q = quad + (c * jnp.float32(1e-37)).astype(quad.dtype)
                s = fn(q, gi)[:, 0, :1].sum().astype(jnp.float32)
                return s * jnp.float32(1e-37)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    times = {}
    for k in ks:
        run = chain(k)
        float(run(*args))  # compile+warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
    k0, k1 = ks
    return (times[k1] - times[k0]) / (k1 - k0)


def main():
    B, n, C, N = 4, 4224, 128, 21760  # flagship level-0 shape
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    quad = jnp.asarray(rng.standard_normal((B, n, C)), dt)
    gi = jnp.asarray(rng.integers(0, n, (B, N)), jnp.int32)
    want = np.take_along_axis(np.asarray(quad, np.float32),
                              np.asarray(gi)[..., None], 1)

    from cape_tpu.ops.gather_mxu import _quad_gather_mxu

    candidates = {
        "onehot_mxu(shipped)": _quad_gather_mxu,
        "rowloop_u1": make_rowloop(1),
        "rowloop_u8": make_rowloop(8),
        "row8_concat": make_row8(),
    }
    try:
        candidates["sprefetch_smem"] = make_sprefetch()
    except RuntimeError:
        pass

    results = {}
    for name, fn in candidates.items():
        try:
            t0 = time.perf_counter()
            out = jax.jit(fn)(quad, gi)
            got = np.asarray(jax.device_get(out), np.float32)
            compile_s = time.perf_counter() - t0
            if not np.array_equal(got, want):
                results[name] = {"ok": False, "why": "WRONG RESULT"}
                continue
            per = fori_slope(fn, (quad, gi))
            results[name] = {"ok": True, "ms": round(per * 1e3, 3),
                             "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False,
                             "why": f"{type(e).__name__}: {str(e)[:200]}"}
        print(name, "->", results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
