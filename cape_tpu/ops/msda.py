"""Multi-scale deformable attention core — the hot sampling kernel.

TPU-native replacement for the reference's `ms_deform_attn_core_pytorch`
(`models/deformable_transformer.py:115-141`), which loops per level calling
`F.grid_sample`. Here the whole gather + bilinear-interpolate + weighted-sum
is expressed as XLA gathers over the flattened multi-level memory with
statically-known level shapes, so XLA fuses the index math, masking and
accumulation into a single tiled program. A Pallas kernel lives in
`msda_pallas.py` for further speedup; this XLA formulation is the
always-correct fallback and the autodiff path.

Bilinear semantics match `F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False)` exactly: with normalized
location `loc` in [0,1], the continuous pixel coordinate is
`loc * size - 0.5`, and out-of-bounds corners contribute zero.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Sample multi-level features at fractional locations and blend.

    Args:
        value: (B, S, H, Dh) flattened multi-level features, S = sum(H_l*W_l).
        spatial_shapes: static list of (H_l, W_l) per level (trace-time
            constants — XLA requires static shapes, SURVEY.md §7.1).
        sampling_locations: (B, Lq, H, L, P, 2) normalized (x, y) in [0,1].
        attention_weights: (B, Lq, H, L, P) softmax weights over L*P.

    Returns:
        (B, Lq, H * Dh) attended features.
    """
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), "levels mismatch"

    # (B, H, S, Dh) so the gather axis is contiguous per head
    value_bh = jnp.swapaxes(value, 1, 2)

    out = jnp.zeros((B, H, Lq, Dh), dtype=value.dtype)
    level_start = 0
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]        # (B, Lq, H, P, 2)
        w_attn = attention_weights[:, :, :, lvl]      # (B, Lq, H, P)
        # grid_sample align_corners=False pixel mapping
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(value.dtype)
        fy = (y - y0).astype(value.dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # accumulate 4 corners; masked-to-zero outside the level
        for dxi, dyi, wgt in (
            (0, 0, (1 - fx) * (1 - fy)),
            (1, 0, fx * (1 - fy)),
            (0, 1, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            cx = x0i + dxi
            cy = y0i + dyi
            valid = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl)
            idx = level_start + jnp.clip(cy, 0, Hl - 1) * Wl + jnp.clip(cx, 0, Wl - 1)
            w = (wgt * valid.astype(value.dtype) * w_attn).astype(value.dtype)
            # (B, Lq, H, P) -> (B, H, Lq*P)
            idx_bh = jnp.swapaxes(idx, 1, 2).reshape(B, H, Lq * P)
            gathered = jnp.take_along_axis(
                value_bh, idx_bh[..., None], axis=2
            )  # (B, H, Lq*P, Dh)
            w_bh = jnp.swapaxes(w, 1, 2).reshape(B, H, Lq * P, 1)
            out = out + (gathered * w_bh).reshape(B, H, Lq, P, Dh).sum(axis=3)
        level_start += Hl * Wl

    # (B, H, Lq, Dh) -> (B, Lq, H*Dh)
    return jnp.swapaxes(out, 1, 2).reshape(B, Lq, H * Dh)


def ms_deform_attn(
    value, spatial_shapes, sampling_locations, attention_weights,
    use_pallas: bool = False,
):
    """Backend dispatch. `use_pallas=True` runs the Pallas kernel forward
    with the XLA core's VJP for training (both compute the same function;
    see msda_pallas.py). Pallas is OPT-IN only — on some backends (e.g. the
    axon remote-compile relay) Mosaic compilation hangs, so there is no
    auto-probe in the hot path."""
    if not use_pallas:
        return ms_deform_attn_core(
            value, spatial_shapes, sampling_locations, attention_weights
        )

    from .msda_pallas import ms_deform_attn_pallas

    shapes = tuple(tuple(s) for s in spatial_shapes)

    @jax.custom_vjp
    def f(v, loc, attn):
        return ms_deform_attn_pallas(v, shapes, loc, attn)

    def f_fwd(v, loc, attn):
        return f(v, loc, attn), (v, loc, attn)

    def f_bwd(res, g):
        v, loc, attn = res
        _, vjp = jax.vjp(
            lambda v_, l_, a_: ms_deform_attn_core(v_, shapes, l_, a_),
            v, loc, attn,
        )
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f(value, sampling_locations, attention_weights)
