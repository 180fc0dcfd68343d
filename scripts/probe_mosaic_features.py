#!/usr/bin/env python
"""Minimal single-feature Mosaic lowering probes.

probe_fused_msda's two kernels both die in the remote compile helper with
an opaque HTTP 500. The shipped one-hot kernel compiles, so the failure
is one of the NEW constructs. Each probe below adds exactly one feature
over the known-good baseline; running them isolates the culprit(s).

    timeout 1800 python scripts/probe_mosaic_features.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def run(name, kernel, out_shape, grid, in_specs, out_specs, args, check=None):
    try:
        f = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                           out_specs=out_specs, out_shape=out_shape)
        out = np.asarray(jax.device_get(jax.jit(f)(*args)), np.float32)
        ok = True if check is None else bool(check(out))
        res = {"ok": ok} if ok else {"ok": False, "why": "WRONG RESULT"}
    except Exception as e:  # noqa: BLE001
        res = {"ok": False, "why": f"{type(e).__name__}: {str(e)[:120]}"}
    print(name, "->", res, flush=True)
    return name, res


def main():
    results = {}
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x128 = jnp.asarray(rng.standard_normal((1, 256, 128)), dt)
    x32 = jnp.asarray(rng.standard_normal((1, 512, 32)), dt)

    # 1. baseline: plain copy (known good shape)
    results.update([run(
        "copy128",
        lambda i_ref, o_ref: o_ref.__setitem__(0, i_ref[0]),
        jax.ShapeDtypeStruct((1, 256, 128), dt), (1,),
        [pl.BlockSpec((1, 256, 128), lambda b: (b, 0, 0))],
        pl.BlockSpec((1, 256, 128), lambda b: (b, 0, 0)), (x128,))])

    # 2. minor-32 blocks (pack kernel input)
    results.update([run(
        "copy_minor32",
        lambda i_ref, o_ref: o_ref.__setitem__(0, i_ref[0]),
        jax.ShapeDtypeStruct((1, 512, 32), dt), (1,),
        [pl.BlockSpec((1, 512, 32), lambda b: (b, 0, 0))],
        pl.BlockSpec((1, 512, 32), lambda b: (b, 0, 0)), (x32,))])

    # 3. grid-affine dynamic-slice read (+ static shift)
    def k_ds(i_ref, o_ref):
        i = pl.program_id(0)
        o_ref[0] = i_ref[0, pl.ds(i * 128 + 1, 128), :]

    results.update([run(
        "ds_affine_shift",
        k_ds,
        jax.ShapeDtypeStruct((1, 256, 128), dt), (2,),
        [pl.BlockSpec((1, 512, 128), lambda i: (0, 0, 0))],
        pl.BlockSpec((1, 128, 128), lambda i: (0, i, 0)),
        (jnp.asarray(rng.standard_normal((1, 512, 128)), dt),))])

    # 4. minor concat of two window reads (pack kernel core)
    def k_cat(i_ref, o_ref):
        a = i_ref[0, pl.ds(0, 256), :]
        b = i_ref[0, pl.ds(1, 256), :]
        o_ref[0] = jnp.concatenate([a, b], axis=-1)

    results.update([run(
        "concat_minor32x2",
        k_cat,
        jax.ShapeDtypeStruct((1, 256, 64), dt), (1,),
        [pl.BlockSpec((1, 512, 32), lambda b: (b, 0, 0))],
        pl.BlockSpec((1, 256, 64), lambda b: (b, 0, 0)), (x32,))])

    # 5. in-kernel constants: tiled eye matmul
    def k_const(i_ref, o_ref):
        sum_m = jnp.tile(jnp.eye(32, dtype=jnp.float32), (4, 1))
        o_ref[0] = jnp.dot(i_ref[0].astype(jnp.float32), sum_m,
                           preferred_element_type=jnp.float32).astype(dt)

    results.update([run(
        "const_eye_dot",
        k_const,
        jax.ShapeDtypeStruct((1, 256, 32), dt), (1,),
        [pl.BlockSpec((1, 256, 128), lambda b: (b, 0, 0))],
        pl.BlockSpec((1, 256, 32), lambda b: (b, 0, 0)), (x128,),
        check=lambda out: np.allclose(
            out,
            np.asarray(x128, np.float32).reshape(1, 256, 4, 32).sum(2),
            atol=2e-2)) ])

    # 6. minor-4 input block (weights) + expand matmul
    w4 = jnp.asarray(rng.uniform(0, 1, (1, 256, 4)), dt)

    def k_w4(w_ref, i_ref, o_ref):
        expand = jnp.repeat(jnp.eye(4, dtype=jnp.float32), 32, axis=1)
        wrep = jnp.dot(w_ref[0].astype(jnp.float32), expand,
                       preferred_element_type=jnp.float32)
        o_ref[0] = (i_ref[0].astype(jnp.float32) * wrep).astype(dt)

    results.update([run(
        "minor4_expand",
        k_w4,
        jax.ShapeDtypeStruct((1, 256, 128), dt), (1,),
        [pl.BlockSpec((1, 256, 4), lambda b: (b, 0, 0)),
         pl.BlockSpec((1, 256, 128), lambda b: (b, 0, 0))],
        pl.BlockSpec((1, 256, 128), lambda b: (b, 0, 0)), (w4, x128))])

    # 7. two chained dots in one kernel
    def k_2dot(i_ref, o_ref):
        m1 = jnp.tile(jnp.eye(128, dtype=jnp.float32), (1, 1))
        g = jnp.dot(i_ref[0].astype(jnp.float32), m1,
                    preferred_element_type=jnp.float32)
        sum_m = jnp.tile(jnp.eye(32, dtype=jnp.float32), (4, 1))
        o_ref[0] = jnp.dot(g, sum_m,
                           preferred_element_type=jnp.float32).astype(dt)

    results.update([run(
        "two_dots",
        k_2dot,
        jax.ShapeDtypeStruct((1, 256, 32), dt), (1,),
        [pl.BlockSpec((1, 256, 128), lambda b: (b, 0, 0))],
        pl.BlockSpec((1, 256, 32), lambda b: (b, 0, 0)), (x128,))])

    print(json.dumps({k: v for k, v in results.items()}))


if __name__ == "__main__":
    main()
