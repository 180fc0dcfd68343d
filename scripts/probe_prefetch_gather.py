#!/usr/bin/env python
"""Probe scalar-prefetch / dynamic-index Pallas gathers vs the one-hot MXU
kernel.

The shipped MSDA core (`ops/gather_mxu.py`) turns the row gather into a
one-hot matmul with a structural R x n x C MAC floor. The canonical TPU
escape is scalar-prefetched indices driving real data movement:

- `psgs_row`:    PrefetchScalarGridSpec, ONE row per grid step, the index
                 map itself consults the prefetched index ref (per-block
                 dynamic DMA). Slab viewed (B, n, 1, C) so the (1, 1, 1, C)
                 block satisfies Mosaic's last-two-dims rule.
- `psgs_multi8`: same, but 8 input block specs per program (8 rows/step).
- `dma_loop`:    slab stays in ANY/HBM; indices scalar-prefetched to SMEM;
                 in-kernel fori_loop issues one row-sized
                 `pltpu.make_async_copy` per index straight into the output
                 block, 8 semaphore slots outstanding (DMAs have no sublane
                 alignment constraint — the escape from the vmem_loop
                 failure below).
- `mxu`:         the shipped one-hot kernel (ops/gather_mxu.py).
- `xla`:         jnp.take_along_axis.

Dead end, recorded: a pure-VMEM dynamic row read
(`slab_ref[0, pl.ds(idx, 1), :]` with idx from SMEM) does NOT lower —
Mosaic requires dynamic sublane indices to be provably 8-aligned
("cannot statically prove that index in dimension 1 is a multiple of 8",
vector.load on memref<1x4224x128xbf16, vmem>). Same for the symmetric
dynamic store. Arbitrary-row VMEM addressing is off the table on this
toolchain; data movement must go through DMAs.

Shape = the flagship MSDA level-0 call site: slab (B, 4224, 128) bf16,
indices (B, 21760) — B=4 matches the per-head call in `ops/msda.py`;
B=32 approximates heads folded into the batch. Timing = fori-slope
(k in {1, 8}), correctness = exact row equality vs take_along_axis.

One variant per process (a Mosaic lowering failure can poison the remote
compile helper): run with --variant NAME, or --all to drive subprocesses.

    timeout 3600 python scripts/probe_prefetch_gather.py --all
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_VARIANTS = ("xla", "mxu", "psgs_row", "psgs_multi8", "dma_loop",
             "dma_row0", "vmem_roll8")


def make_gather(variant: str, B: int, n: int, C: int, N: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    if variant == "xla":
        def f(slab, gi):
            return jnp.take_along_axis(slab, gi[..., None], axis=1)
        return f

    if variant == "mxu":
        from cape_tpu.ops.gather_mxu import quad_gather

        def f(slab, gi):
            return quad_gather(slab, gi, impl="mxu")
        return f

    if variant == "psgs_row":
        # slab viewed (B, n, 1, C): block (1, 1, 1, C) has last-two dims
        # == (1, C) == the array's, satisfying Mosaic's block rule while
        # keeping a per-grid-step dynamic row index.
        def kernel(idx_ref, in_ref, out_ref):
            out_ref[...] = in_ref[...]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N),
            in_specs=[pl.BlockSpec(
                (1, 1, 1, C),
                lambda b, i, idx_ref: (b, idx_ref[b, i], 0, 0))],
            out_specs=pl.BlockSpec(
                (1, 1, 1, C), lambda b, i, idx_ref: (b, i, 0, 0)),
        )

        def f(slab, gi):
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, N, 1, C), slab.dtype),
            )(gi, slab.reshape(B, n, 1, C))
            return out.reshape(B, N, C)
        return f

    if variant == "psgs_multi8":
        G = 8
        assert N % G == 0

        def kernel(idx_ref, *refs):
            ins, out_ref = refs[:G], refs[G]
            for g in range(G):
                out_ref[0, 0, g] = ins[g][0, 0, 0]

        def in_spec(g):
            return pl.BlockSpec(
                (1, 1, 1, C),
                lambda b, i, idx_ref, g=g: (b, idx_ref[b, i * G + g], 0, 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N // G),
            in_specs=[in_spec(g) for g in range(G)],
            out_specs=pl.BlockSpec(
                (1, 1, G, C), lambda b, i, idx_ref: (b, i, 0, 0)),
        )

        def f(slab, gi):
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (B, N // G, G, C), slab.dtype),
            )(gi, *([slab.reshape(B, n, 1, C)] * G))
            return out.reshape(B, N, C)
        return f

    if variant == "dma_loop":
        # slab stays in ANY (compiler = HBM at this size); one row-sized
        # DMA per index straight into the VMEM out block, NS outstanding.
        R = N if N <= 1280 else 1280  # 1280 divides N=21760
        assert N % R == 0
        NS = min(8, R)

        def kernel(idx_ref, slab_ref, out_ref, sems):
            b = pl.program_id(0)
            i = pl.program_id(1)

            def row_dma(r):
                idx = idx_ref[b, i * R + r]
                return pltpu.make_async_copy(
                    slab_ref.at[b, pl.ds(idx, 1), :],
                    out_ref.at[0, pl.ds(r, 1), :],
                    sems.at[r % NS],
                )

            def start_body(r, _):
                row_dma(r).start()
                return 0

            def drain_body(r, _):
                row_dma(r).wait()
                return 0

            # issue in a rolling window of NS outstanding copies
            def body(r, _):
                row_dma(r + NS).start()
                row_dma(r).wait()
                return 0

            jax.lax.fori_loop(0, NS, start_body, 0)
            jax.lax.fori_loop(0, R - NS, body, 0)
            jax.lax.fori_loop(R - NS, R, drain_body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N // R),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, R, C), lambda b, i, idx_ref: (b, i, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NS,))],
        )

        def f(slab, gi):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, N, C), slab.dtype),
            )(gi, slab)
        return f

    if variant == "dma_row0":
        # HBM tiling forbids 1-row slices of a tiled dim — so move the row
        # axis to dim 0 (untiled): slab viewed (B*n, 1, C), flat indices,
        # one dim-0-sliced DMA per row into the out block (also viewed
        # with rows in dim 0). Each (1, C) page pads to an (8, 128) HBM
        # tile, so the relayout costs 8x slab bytes once; the per-row DMA
        # still moves 256 B.
        R = N if N <= 1280 else 1280
        assert N % R == 0
        NS = min(8, R)

        def kernel(idx_ref, slab_ref, out_ref, sems):
            i = pl.program_id(0)

            def row_dma(r):
                idx = idx_ref[i * R + r]
                return pltpu.make_async_copy(
                    slab_ref.at[pl.ds(idx, 1)],
                    out_ref.at[pl.ds(r, 1)],
                    sems.at[r % NS],
                )

            def start_body(r, _):
                row_dma(r).start()
                return 0

            def body(r, _):
                row_dma(r + NS).start()
                row_dma(r).wait()
                return 0

            def drain_body(r, _):
                row_dma(r).wait()
                return 0

            jax.lax.fori_loop(0, NS, start_body, 0)
            jax.lax.fori_loop(0, R - NS, body, 0)
            jax.lax.fori_loop(R - NS, R, drain_body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * N // R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (R, 1, C), lambda i, idx_ref: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NS,))],
        )

        def f(slab, gi):
            flat = slab.reshape(B * n, 1, C)
            gflat = (gi + (jnp.arange(B, dtype=gi.dtype) * n)[:, None]
                     ).reshape(B * N)
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B * N, 1, C), slab.dtype),
            )(gflat, flat)
            return out.reshape(B, N, C)
        return f

    if variant == "vmem_roll8":
        # Slab resident in VMEM; dynamic VMEM reads must be 8-aligned, so
        # read the aligned 8-row window containing each index
        # (`pl.multiple_of`), rotate the target row into a known slot with
        # `pltpu.roll` (dynamic shift), one-hot mask, and sum 8 of those
        # into an (8, C) register block stored at an 8-aligned offset.
        R = N if N <= 1280 else 1280
        assert N % R == 0 and R % 8 == 0

        def kernel(idx_ref, slab_ref, out_ref):
            b = pl.program_id(0)
            i = pl.program_id(1)
            rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)

            def body(r, _):
                acc = jnp.zeros((8, C), dtype=jnp.float32)
                for g in range(8):
                    idx = idx_ref[b, i * R + r * 8 + g]
                    base = pl.multiple_of((idx // 8) * 8, 8)
                    # dynamic rotate is 32-bit only: roll in f32
                    win = slab_ref[0, pl.ds(base, 8), :].astype(jnp.float32)
                    # rotate target row (idx - base) to slot g
                    sel = pltpu.roll(win, g - (idx - base), 0)
                    # arithmetic mask: i1 relayout does not lower (PERF.md)
                    acc = acc + sel * (rows8 == g).astype(sel.dtype)
                out_ref[0, pl.ds(pl.multiple_of(r * 8, 8), 8), :] = (
                    acc.astype(out_ref.dtype))
                return 0

            jax.lax.fori_loop(0, R // 8, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N // R),
            in_specs=[pl.BlockSpec(
                (1, n, C), lambda b, i, idx_ref: (b, 0, 0))],
            out_specs=pl.BlockSpec(
                (1, R, C), lambda b, i, idx_ref: (b, i, 0)),
        )

        def f(slab, gi):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, N, C), slab.dtype),
            )(gi, slab)
        return f

    raise ValueError(f"unknown variant {variant!r}")


def run_variant(variant: str, B: int, reps: int, n: int = 4224,
                N: int = 21760) -> dict:
    import jax
    import jax.numpy as jnp

    C = 128
    Npad = N
    rng = np.random.default_rng(0)
    slab = jax.device_put(jnp.asarray(
        rng.standard_normal((B, n, C)).astype(np.float32), jnp.bfloat16))
    gi_np = rng.integers(0, n, (B, Npad)).astype(np.int32)
    gi = jax.device_put(jnp.asarray(gi_np))

    f = make_gather(variant, B, n, C, Npad)

    # correctness: exact row equality on a small prefix
    got = np.asarray(jax.device_get(jax.jit(f)(slab, gi)), np.float32)
    want = np.asarray(jax.device_get(slab), np.float32)
    want = np.take_along_axis(want, gi_np[..., None], axis=1)
    if not (got == want).all():
        bad = int((got != want).sum())
        return {"variant": variant, "B": B, "ok": False,
                "why": f"WRONG RESULT ({bad} mismatched elements)"}

    def slope_time():
        def run_k(k):
            @jax.jit
            def run(c0):
                def body(i, c):
                    eps = (c * jnp.float32(1e-37)).astype(slab.dtype)
                    return jnp.sum(
                        f(slab + eps, gi).astype(jnp.float32)
                    ) * jnp.float32(1e-37)
                return jax.lax.fori_loop(0, k, body, c0)

            out = run(jnp.float32(0.0))
            float(out)  # warm + sync
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(jnp.float32(0.0))
                float(out)
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t33 = run_k(1), run_k(33)
        return (t33 - t1) / 32.0

    per_call = slope_time()
    rows = B * Npad
    return {
        "variant": variant, "B": B, "n": n, "rows": N, "ok": True,
        "us_per_call": round(per_call * 1e6, 1),
        "ns_per_row": round(per_call / rows * 1e9, 2),
        "gb_per_s": round(rows * C * 2 / per_call / 1e9, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None, choices=_VARIANTS)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n", type=int, default=4224,
                    help="slab rows (level size)")
    ap.add_argument("--rows", type=int, default=21760,
                    help="gather rows per batch element (Lq*P)")
    args = ap.parse_args()

    if args.all:
        results = []
        for v in _VARIANTS:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--variant", v, "--batch", str(args.batch),
                   "--reps", str(args.reps), "--n", str(args.n),
                   "--rows", str(args.rows)]
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=600)
                line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() \
                    else ""
                res = json.loads(line) if line.startswith("{") else {
                    "variant": v, "ok": False,
                    "why": (p.stderr or "no output")[-300:]}
            except subprocess.TimeoutExpired:
                res = {"variant": v, "ok": False, "why": "TIMEOUT 600s"}
            print(json.dumps(res), flush=True)
            results.append(res)
        return

    assert args.variant, "--variant or --all required"
    try:
        res = run_variant(args.variant, args.batch, args.reps,
                          n=args.n, N=args.rows)
    except Exception as e:  # noqa: BLE001
        res = {"variant": args.variant, "ok": False,
               "why": f"{type(e).__name__}: {str(e)[:300]}"}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
