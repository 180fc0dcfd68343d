"""Pallas TPU kernel for multi-scale deformable attention (experimental).

Strategy: grid over (batch*heads, query blocks). Each program holds one
(b, h)'s full flattened value slab in VMEM (S x Dh; at the flagship config
S=5440, Dh=32 -> ~350 KB bf16, far under the ~16 MB VMEM budget) and
processes a block of queries. The bilinear gather becomes 4 row-gathers
per (level, point) from the VMEM slab, blended by the in-register bilinear
weights and the softmaxed attention weights — the fused equivalent of the
reference's per-level `F.grid_sample` loop
(`models/deformable_transformer.py:115-141`).

Requires Mosaic's vectorized row-gather (`jnp.take(..., axis=0)` /
take_along_axis inside a kernel). `pallas_supported()` probes this once at
runtime; `cape_tpu.models.deformable` falls back to the XLA-gather core
(`cape_tpu.ops.msda`) when unsupported or when `cfg.use_pallas_msda` is
off. Forward-only: training uses the XLA core (autodiff); this kernel
targets inference/serving.

STATUS (round 2, measured on v5e — details in PERF.md): the current Mosaic
toolchain compiles trivial kernels but rejects this kernel's
arbitrary-size row gather (`_gather_lowering_rule` requires same-shape
take_along_axis), so `pallas_supported()` returns False on hardware and the
XLA core serves all traffic. That is the RIGHT outcome: the XLA core
measures 26 us at the flagship encoder shape — within 2x of the HBM
roofline lower bound (13.6 us) — so a Pallas win is capped at ~5% of
episode latency. Kept as the starting point for a future Mosaic with
general gathers; validated in interpret mode by tests/test_msda_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _msda_kernel(loc_ref, attn_ref, valid_ref, value_ref, out_ref, *,
                 block_q: int, n_corners: int):
    """One (b*h, q-block) program.

    loc_ref:   (block_q, K, 4) fp32 — per corner: flat row index (as float),
               bilinear weight packed separately in attn_ref? No — see
               layout below.
    Layout chosen to keep the kernel simple:
      loc_ref   (block_q, K4) int32 flat row indices (K4 = L*P*4)
      attn_ref  (block_q, K4) fp32 combined weight = bilinear * attention
      valid_ref (block_q, K4) fp32 0/1 in-bounds mask
      value_ref (S, Dh) value slab
      out_ref   (block_q, Dh)
    """
    idx = loc_ref[0]                       # (Q, K4) int32
    w = attn_ref[0] * valid_ref[0]         # (Q, K4)
    val = value_ref[0]                     # (S, Dh)
    q, k4 = idx.shape
    dh = val.shape[-1]
    # Mosaic's dynamic gather wants per-lane indices: broadcast the row
    # index across the lane (feature) dimension and take_along_axis on the
    # sublane dimension.
    idx_flat = jnp.broadcast_to(idx.reshape(q * k4, 1), (q * k4, dh))
    gathered = jnp.take_along_axis(val, idx_flat, axis=0)  # (Q*K4, Dh)
    gathered = gathered.reshape(q, k4, dh)
    out_ref[0] = jnp.sum(gathered * w[..., None].astype(gathered.dtype), axis=1)


def ms_deform_attn_pallas(
    value: jnp.ndarray,                    # (B, S, H, Dh)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,       # (B, Lq, H, L, P, 2)
    attention_weights: jnp.ndarray,        # (B, Lq, H, L, P)
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas path. Index/weight prep happens in XLA (cheap, fusable);
    the gather+blend inner loop runs in the kernel."""
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape

    # ---- corner indices + combined weights (XLA) ----
    idx_parts, w_parts, v_parts = [], [], []
    level_start = 0
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]            # (B, Lq, H, P, 2)
        wa = attention_weights[:, :, :, lvl]              # (B, Lq, H, P)
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        for dxi, dyi, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                              (1, 0, fx * (1 - fy)),
                              (0, 1, (1 - fx) * fy),
                              (1, 1, fx * fy)):
            cx = x0i + dxi; cy = y0i + dyi
            ok = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl)
            flat = level_start + jnp.clip(cy, 0, Hl - 1) * Wl + \
                jnp.clip(cx, 0, Wl - 1)
            idx_parts.append(flat)
            w_parts.append(wgt * wa)
            v_parts.append(ok.astype(jnp.float32))
        level_start += Hl * Wl

    K4 = L * P * 4
    idx = jnp.stack(idx_parts, axis=-1).reshape(B, Lq, H, K4)
    w = jnp.stack(w_parts, axis=-1).reshape(B, Lq, H, K4).astype(jnp.float32)
    valid = jnp.stack(v_parts, axis=-1).reshape(B, Lq, H, K4)

    # (B, H, Lq, ...) flattened over (B*H)
    def bh(x):
        return jnp.swapaxes(x, 1, 2).reshape(B * H, Lq, K4)

    idx_bh, w_bh, valid_bh = bh(idx), bh(w), bh(valid)
    value_bh = jnp.swapaxes(value, 1, 2).reshape(B * H, S, Dh)

    Lq_pad = int(np.ceil(Lq / block_q) * block_q)
    if Lq_pad != Lq:
        pad = ((0, 0), (0, Lq_pad - Lq), (0, 0))
        idx_bh = jnp.pad(idx_bh, pad)
        w_bh = jnp.pad(w_bh, pad)
        valid_bh = jnp.pad(valid_bh, pad)

    grid = (B * H, Lq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_msda_kernel, block_q=block_q, n_corners=K4),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_pad, Dh), value.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, K4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, K4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, K4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_bh, w_bh, valid_bh, value_bh)

    out = out[:, :Lq].reshape(B, H, Lq, Dh)
    return jnp.swapaxes(out, 1, 2).reshape(B, Lq, H * Dh)


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """Probe whether the in-kernel row gather compiles on this backend."""
    if not _HAS_PALLAS:
        return False
    try:
        v = jnp.arange(32, dtype=jnp.float32).reshape(4, 8)
        v = jnp.tile(v, (1, 1, 16))[..., :8].reshape(1, 4, 1, 8)
        value = jnp.zeros((1, 16, 1, 8), jnp.float32)
        loc = jnp.full((1, 4, 1, 1, 2, 2), 0.5, jnp.float32)
        attn = jnp.ones((1, 4, 1, 1, 2), jnp.float32) / 2
        out = ms_deform_attn_pallas(value, [(4, 4)], loc, attn, block_q=4)
        jax.block_until_ready(out)
        return True
    except Exception:
        return False
