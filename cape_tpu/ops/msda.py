"""Multi-scale deformable attention core — the hot sampling kernel.

TPU-native replacement for the reference's `ms_deform_attn_core_pytorch`
(`models/deformable_transformer.py:115-141`), which loops per level calling
`F.grid_sample`.

Formulation (round 3, chosen BY MEASUREMENT — scripts/bench_msda_variants.py):
the naive port gathers each of the 4 bilinear corners separately with
32-element rows, a shape XLA:TPU lowers ~20x off the achievable gather
rate (129.7 ms at the flagship encoder shape, ~95% of the whole train
step). The production path instead packs, per level and head, the 2x2
neighborhood of every grid cell into ONE contiguous 4*Dh = 128-wide row
("quad rows"), so each sample needs a single wide lane-aligned gather that
returns all four corners at once. The P points stay concatenated as a
512-wide lane-aligned row and the bilinear/attention blend + corner/point
reduction happen via lane-repeated weights and one constant (P*4*Dh, Dh)
summing matmul on the MXU — narrow-minor (Dh=32) temps would pad 4x on
TPU tiles, bloating HBM traffic and compile-time memory (B=16 without
remat OOMs with an elementwise reduction). Measured: 32.1 ms forward
(4.0x over naive), 53.1 ms fwd+bwd via plain autodiff (the gather
transpose scatters 128-wide rows, which XLA handles; the 4-corner scatter
of the naive form crashes the TPU compiler).

Bilinear semantics match `F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False)` exactly: with normalized
location `loc` in [0,1], the continuous pixel coordinate is
`loc * size - 0.5`, and out-of-bounds corners contribute zero.
`ms_deform_attn_core_naive` keeps the direct 4-corner-gather formulation
as the numerical oracle for property tests.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .gather_mxu import default_gather_impl, quad_gather
from .msda_fused import fused_level_sample, quadfused_level_sample


#: at/below this many gather rows (Lq * P, static under jit) a call site
#: counts as "tiny" — the inference decode step's Lq=1. Measured on v5e
#: (scripts/probe_decode_impl.py, B=1 17-kpt episode, forced 18-token
#: decode): mxu kernel 109 ms < quad-XLA 131 < flat single-gather 240 <
#: naive per-corner 281. The kernels win even here — the decode loop is
#: bound by XLA per-op launch overhead and pathological tiny-gather
#: lowering, not by the kernels' padded 256-row tiles — so 'auto' keeps
#: the process default at batch 1 and CAPE_MSDA_TINY exists as a
#: per-call-site override for tiny-shape experiments.
_NAIVE_MAX_ROWS = 256

#: at tiny call sites the one-hot kernel pads every (batch x head)
#: program's handful of rows to a 256-row tile, so its cost grows
#: linearly with batch while `take_along_axis` stays cheap — the round-4
#: gather-idiom probe measured the inversion at the decode-step shape
#: (XLA 38.8 us vs one-hot 150.9 us on the B=8 folded slab,
#: scripts/probe_prefetch_gather.py). 'auto' therefore switches tiny
#: DECODE sites (Lq == 1) to XLA at/above this batch (in-context
#: calibration: the round-5 decode sweep + dispatch ablation tables in
#: PERF.md; override: CAPE_MSDA_TINY_XLA_BATCH). Training/teacher-forced
#: call sites (Lq > 1) never take this branch — the inversion was only
#: ever measured at the Lq=1 decode-step shape.
_TINY_XLA_MIN_BATCH = 8


def _resolve_impl_for_shape(n_rows: int, batch: int = 1,
                            lq: int = 1) -> str:
    """Shape-aware resolution of the 'auto' backend (n_rows = Lq * P).

    An explicitly forced CAPE_MSDA_GATHER wins at every shape; only
    'auto' consults CAPE_MSDA_TINY / the batch threshold for tiny call
    sites (n_rows, batch and lq are static under jit). The batch
    threshold applies only to single-query (decode-step) sites.
    """
    if os.environ.get("CAPE_MSDA_GATHER", "auto").lower() != "auto":
        return default_gather_impl()
    if n_rows <= _NAIVE_MAX_ROWS:
        tiny = os.environ.get("CAPE_MSDA_TINY", "").lower()
        if tiny:
            return tiny
        min_b = int(os.environ.get(
            "CAPE_MSDA_TINY_XLA_BATCH", _TINY_XLA_MIN_BATCH))
        if lq == 1 and batch >= min_b:
            return "xla"
    return default_gather_impl()


def _level_offsets(spatial_shapes) -> Tuple[int, ...]:
    offs, start = [], 0
    for (h, w) in spatial_shapes:
        offs.append(start)
        start += h * w
    return tuple(offs)


def _quad_rows(level_value: jnp.ndarray, Wl: int) -> jnp.ndarray:
    """(B, HW, Dh) level slice -> (B, F+HW, 4*Dh) quad rows.

    Row `F + s` holds [v[s], v[s+1], v[s+Wl], v[s+Wl+1]] — the 2x2 bilinear
    neighborhood of flat cell s, contiguous along the lane dimension.
    F = Wl+1 front padding keeps base indices down to -Wl-1 (corner cell
    (-1,-1)) in range; every out-of-bounds corner gets zero weight, so the
    wrap-around neighbors a flat index picks up at row edges are harmless.
    """
    B, HW, Dh = level_value.shape
    F = Wl + 1
    vp = jnp.pad(level_value, ((0, 0), (F, Wl + 1), (0, 0)))
    n = F + HW
    quad = jnp.stack(
        [vp[:, 0:n], vp[:, 1:n + 1],
         vp[:, Wl:n + Wl], vp[:, Wl + 1:n + Wl + 1]], axis=2)
    return quad.reshape(B, n, 4 * Dh)


def _quad_bases_and_weights(spatial_shapes, sampling_locations,
                            attention_weights, dtype):
    """Per level: base row index (F-offset folded in) + 4 corner weights.

    base: (B, Lq, H, P) int32 into the level's quad-row array;
    w4:   (B, Lq, H, P, 4) bilinear * attention weight, zeroed where the
          corner is out of bounds (validity judged on the UNCLIPPED corner
          coordinate — the grid_sample zeros-padding contract).
    """
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]
        w_attn = attention_weights[:, :, :, lvl]
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(dtype)
        fy = (y - y0).astype(dtype)
        x0u = x0.astype(jnp.int32)
        y0u = y0.astype(jnp.int32)
        x0c = jnp.clip(x0u, -1, Wl - 1)
        y0c = jnp.clip(y0u, -1, Hl - 1)
        base = (Wl + 1) + y0c * Wl + x0c
        ws = []
        for dxi, dyi, wgt in (
            (0, 0, (1 - fx) * (1 - fy)),
            (1, 0, fx * (1 - fy)),
            (0, 1, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            cx = x0u + dxi
            cy = y0u + dyi
            valid = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl)
            ws.append((wgt * valid.astype(dtype) * w_attn).astype(dtype))
        yield lvl, base, jnp.stack(ws, axis=-1)


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    gather_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Sample multi-level features at fractional locations and blend.

    Args:
        value: (B, S, H, Dh) flattened multi-level features, S = sum(H_l*W_l).
        spatial_shapes: static list of (H_l, W_l) per level (trace-time
            constants — XLA requires static shapes, SURVEY.md §7.1).
        sampling_locations: (B, Lq, H, L, P, 2) normalized (x, y) in [0,1].
        attention_weights: (B, Lq, H, L, P) softmax weights over L*P.
        gather_impl: 'xla' | 'mxu' row-gather backend, 'fused'/'fusedq'
            for the single-kernel formulations, 'naive' for the direct
            4-corner gather, or 'flat' for the single-gather form.
            None = the CAPE_MSDA_GATHER process default, with the
            CAPE_MSDA_TINY override consulted at/below `_NAIVE_MAX_ROWS`
            gather rows (the inference decode step).

    Returns:
        (B, Lq, H * Dh) attended features.
    """
    if gather_impl is None:
        gather_impl = _resolve_impl_for_shape(
            sampling_locations.shape[1] * sampling_locations.shape[4],
            batch=sampling_locations.shape[0],
            lq=sampling_locations.shape[1])
    if gather_impl == "zero":
        # measurement-only ablation — see ms_deform_attn_core_prequad
        return jnp.zeros(
            (value.shape[0], sampling_locations.shape[1],
             value.shape[2] * value.shape[3]), value.dtype)
    if gather_impl == "naive":
        return ms_deform_attn_core_naive(
            value, spatial_shapes, sampling_locations, attention_weights)
    if gather_impl == "flat":
        return ms_deform_attn_core_flat(
            value, spatial_shapes, sampling_locations, attention_weights)
    if gather_impl == "fused":
        return ms_deform_attn_core_fused(
            value, spatial_shapes, sampling_locations, attention_weights)
    if gather_impl == "fusedq":
        return ms_deform_attn_core_quadfused(
            value, spatial_shapes, sampling_locations, attention_weights)
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), "levels mismatch"

    offs = _level_offsets(spatial_shapes)
    # constant corner/point summing matrix: row p*4*Dh + c*Dh + d -> col d
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
            gi = base[:, :, h].reshape(B, Lq * P)
            g = quad_gather(quad, gi, impl=gather_impl)
            g = g.reshape(B, Lq, P * 4 * Dh)  # 512-wide, lane-aligned
            w = w4[:, :, h].reshape(B, Lq, P * 4)
            gw = g * jnp.repeat(w, Dh, axis=-1)
            heads.append(jnp.einsum("bqk,kd->bqd", gw, sum_m))
        out = out + jnp.concatenate(heads, axis=-1)

    return out


def ms_deform_attn_core_fused(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Single-kernel formulation: weighted one-hot gather+blend in VMEM.

    Same function as `ms_deform_attn_core`, but each (level, head) is ONE
    Pallas kernel application over the RAW level slab (`ops/msda_fused.py`)
    — no quad-row packing, no 512-wide gathered/blended HBM temps, no
    summing einsum. Selected via gather_impl='fused'.
    """
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), "levels mismatch"

    offs = _level_offsets(spatial_shapes)
    # heads fold into the kernel batch once, up front
    vt = jnp.swapaxes(value, 1, 2).reshape(B * H, S, Dh)
    acc = jnp.zeros((B * H, Lq * P, Dh), dtype=value.dtype)
    for lvl, base, w4 in _quad_bases_and_weights(
            spatial_shapes, sampling_locations, attention_weights,
            value.dtype):
        Hl, Wl = spatial_shapes[lvl]
        slab = jax.lax.dynamic_slice_in_dim(vt, offs[lvl], Hl * Wl, 1)
        # strip the quad-row front-pad offset: raw top-left corner index
        gi = jnp.swapaxes(base - (Wl + 1), 1, 2).reshape(B * H, Lq * P)
        w = jnp.swapaxes(w4, 1, 2).reshape(B * H, Lq * P, 4)
        acc = acc + fused_level_sample(slab, gi, w, Wl)
    out = acc.reshape(B, H, Lq, P, Dh).sum(axis=3)
    return jnp.swapaxes(out, 1, 2).reshape(B, Lq, H * Dh)


def ms_deform_attn_core_quadfused(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Quad-row formulation with gather+blend+corner-sum in ONE kernel.

    Same function as `ms_deform_attn_core`; the quad packing stays in XLA
    (Mosaic cannot lower the shifted window reads) but everything after it
    — one-hot gather, lane-repeated weight blend, corner-sum matmul — runs
    inside `ops/msda_fused.quadfused_level_sample`, so the 512-wide
    gathered/blended temps never touch HBM. Selected via
    gather_impl='fusedq'.
    """
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), "levels mismatch"

    offs = _level_offsets(spatial_shapes)
    vt = jnp.swapaxes(value, 1, 2).reshape(B * H, S, Dh)
    acc = jnp.zeros((B * H, Lq * P, Dh), dtype=value.dtype)
    for lvl, base, w4 in _quad_bases_and_weights(
            spatial_shapes, sampling_locations, attention_weights,
            value.dtype):
        Hl, Wl = spatial_shapes[lvl]
        lv = jax.lax.dynamic_slice_in_dim(vt, offs[lvl], Hl * Wl, 1)
        quad = _quad_rows(lv, Wl)  # (B*H, n, 4*Dh)
        gi = jnp.swapaxes(base, 1, 2).reshape(B * H, Lq * P)
        w = jnp.swapaxes(w4, 1, 2).reshape(B * H, Lq * P, 4)
        acc = acc + quadfused_level_sample(quad, gi, w)
    out = acc.reshape(B, H, Lq, P, Dh).sum(axis=3)
    return jnp.swapaxes(out, 1, 2).reshape(B, Lq, H * Dh)


def ms_deform_attn_core_flat(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Single-gather formulation for tiny query counts (the decode step).

    Same function as `ms_deform_attn_core_naive`, but every (level,
    corner) index is made global into the flattened S dimension and ALL
    L*4*P samples per query ride ONE `take_along_axis` + one weighted
    reduce against `value` in its native (B, S, H, Dh) layout (no
    transposes of the big memory). Built as the minimum-op-count XLA
    formulation for the decode step — and still measured SLOWER there
    than the one-hot kernels (240 vs 109 ms per B=1 episode: XLA:TPU
    lowers the tiny broadcast gather pathologically). Kept as a
    selectable, parity-tested variant (CAPE_MSDA_TINY /
    CAPE_MSDA_GATHER='flat'); measurements at `_NAIVE_MAX_ROWS`.
    """
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), "levels mismatch"

    idxs, ws = [], []
    level_start = 0
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]
        w_attn = attention_weights[:, :, :, lvl]
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(value.dtype)
        fy = (y - y0).astype(value.dtype)
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
            idxs.append(level_start + jnp.clip(cy, 0, Hl - 1) * Wl +
                        jnp.clip(cx, 0, Wl - 1))  # (B, Lq, H, P)
            ws.append((wgt * valid.astype(value.dtype) * w_attn)
                      .astype(value.dtype))
        level_start += Hl * Wl

    K = 4 * L * P
    # (B, Lq, H, 4L, P) -> (B, Lq*4L*P, H): gather value rows PER HEAD on
    # axis 1 with a broadcast index — `value` keeps its (B, S, H, Dh)
    # layout, so the (potentially loop-invariant) memory is never
    # re-laid-out inside the decode loop.
    idx = jnp.stack(idxs, axis=3).transpose(0, 1, 3, 4, 2).reshape(
        B, Lq * K, H)
    w = jnp.stack(ws, axis=3).transpose(0, 1, 3, 4, 2).reshape(B, Lq * K, H)
    g = jnp.take_along_axis(value, idx[..., None], axis=1)  # (B, N, H, Dh)
    out = (g * w[..., None]).reshape(B, Lq, K, H, Dh).sum(axis=2)
    return out.reshape(B, Lq, H * Dh)


def quad_level_offsets(spatial_shapes) -> Tuple[int, ...]:
    """Static row offset of each level inside the flat quad slab.

    Level l occupies rows [off_l, off_l + (W_l+1) + H_l*W_l) — the
    `_quad_rows` layout (front pad F = W_l+1 included).
    """
    offs, start = [], 0
    for (h, w) in spatial_shapes:
        offs.append(start)
        start += (w + 1) + h * w
    return tuple(offs)


def precompute_quad_slab(value: jnp.ndarray, spatial_shapes) -> jnp.ndarray:
    """(B, S, H, Dh) projected value -> (B*H, S', 4*Dh) flat quad slab.

    Decode-time prepack: the encoder memory is frozen across the
    autoregressive loop, but `ms_deform_attn_core` rebuilds the quad-row
    neighborhoods of every level x head from scratch at each generated
    token (~4x the memory's bytes of pad+stack traffic per decoder layer
    per step, for an Lq=1 query). Packing ONCE here turns the decode-step
    MSDA into a single 16-row gather from this slab (`..._prequad`).
    S' = sum over levels of (W_l+1) + H_l*W_l (quad-row front pads kept so
    the per-level base indices stay valid after adding the level offset).
    """
    B, S, H, Dh = value.shape
    vt = jnp.swapaxes(value, 1, 2).reshape(B * H, S, Dh)
    offs = _level_offsets(spatial_shapes)
    slabs = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        lv = jax.lax.dynamic_slice_in_dim(vt, offs[lvl], Hl * Wl, 1)
        slabs.append(_quad_rows(lv, Wl))  # (B*H, (Wl+1)+HW, 4*Dh)
    return jnp.concatenate(slabs, axis=1)


def ms_deform_attn_core_prequad(
    quad_slab: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    gather_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Decode-step core against a precomputed quad slab.

    Same function as `ms_deform_attn_core` (reference:
    `models/deformable_transformer.py:115-141`), but the quad-row packing
    is hoisted out (`precompute_quad_slab`) and ALL L*P samples of every
    (batch, head) ride ONE gather — at the decode step that is 16 rows
    per (b, h) instead of 32 separate per-(level, head) pack+gather ops
    over the full memory per layer per token.

    Args:
        quad_slab: (B*H, S', 4*Dh) from `precompute_quad_slab`.
        sampling_locations: (B, Lq, H, L, P, 2); attention_weights
            (B, Lq, H, L, P) as in `ms_deform_attn_core`.
    """
    BH, Sq, C = quad_slab.shape
    Dh = C // 4
    B, Lq, H, L, P, _ = sampling_locations.shape
    assert BH == B * H and L == len(spatial_shapes)
    dtype = quad_slab.dtype

    qoffs = quad_level_offsets(spatial_shapes)
    bases, weights = [], []
    for lvl, base, w4 in _quad_bases_and_weights(
            spatial_shapes, sampling_locations, attention_weights, dtype):
        bases.append(base + qoffs[lvl])   # (B, Lq, H, P) global rows
        weights.append(w4)                # (B, Lq, H, P, 4)
    gi = jnp.stack(bases, axis=3)         # (B, Lq, H, L, P)
    gi = jnp.moveaxis(gi, 2, 1).reshape(B * H, Lq * L * P)
    w = jnp.stack(weights, axis=3)        # (B, Lq, H, L, P, 4)
    w = jnp.moveaxis(w, 2, 1).reshape(B * H, Lq, L * P * 4)

    if gather_impl is None:
        gather_impl = _resolve_impl_for_shape(Lq * L * P, batch=B, lq=Lq)
    if gather_impl == "zero":
        # measurement-only ablation (CAPE_MSDA_TINY=zero): skip the slab
        # gather + blend entirely and emit zeros, so decode-step probes
        # can price the MSDA cross-attention's share of the step without
        # touching the model. NOT a numerically valid decode.
        return jnp.zeros((B, Lq, H * Dh), dtype)
    if gather_impl not in ("mxu", "xla"):
        # Prequad sites are pure row gathers from the packed slab: only
        # the 'xla' take_along_axis and 'mxu' one-hot backends apply.
        # 'naive'/'flat'/'fused'/'fusedq' are whole-core formulations that
        # need the unpacked (B, S, H, Dh) value — a forced request for
        # them here cannot be honored, so say so instead of silently
        # measuring xla (CAPE_DECODE_PREQUAD=0 disables the prepack and
        # routes decode through ms_deform_attn_core where every backend
        # is selectable).
        import warnings
        warnings.warn(
            f"CAPE_MSDA gather impl {gather_impl!r} is not available at "
            "prequad decode sites (only 'xla'/'mxu'); using 'xla'. Set "
            "CAPE_DECODE_PREQUAD=0 to benchmark other backends in the "
            "decode step.", stacklevel=2)
        gather_impl = "xla"
    g = quad_gather(quad_slab, gi, impl=gather_impl)
    g = g.reshape(B * H, Lq, L * P * 4 * Dh)
    gw = g * jnp.repeat(w, Dh, axis=-1)
    sum_m = jnp.tile(jnp.eye(Dh, dtype=dtype), (L * P * 4, 1))
    out = jnp.einsum("bqk,kd->bqd", gw, sum_m)  # (B*H, Lq, Dh)
    out = out.reshape(B, H, Lq, Dh)
    return jnp.swapaxes(out, 1, 2).reshape(B, Lq, H * Dh)


def ms_deform_attn_core_naive(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Direct 4-corner-gather formulation — the numerical oracle.

    Computes the identical function as `ms_deform_attn_core` the obvious
    way (one narrow gather per bilinear corner). ~3.4x slower on TPU and
    its backward crashes the TPU compiler at large shapes; kept ONLY as
    the property-test oracle for the quad-row production path.
    """
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), "levels mismatch"

    value_bh = jnp.swapaxes(value, 1, 2)
    out = jnp.zeros((B, H, Lq, Dh), dtype=value.dtype)
    level_start = 0
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]
        w_attn = attention_weights[:, :, :, lvl]
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(value.dtype)
        fy = (y - y0).astype(value.dtype)
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
            idx = level_start + jnp.clip(cy, 0, Hl - 1) * Wl + \
                jnp.clip(cx, 0, Wl - 1)
            w = (wgt * valid.astype(value.dtype) * w_attn).astype(value.dtype)
            idx_bh = jnp.swapaxes(idx, 1, 2).reshape(B, H, Lq * P)
            gathered = jnp.take_along_axis(
                value_bh, idx_bh[..., None], axis=2
            )
            w_bh = jnp.swapaxes(w, 1, 2).reshape(B, H, Lq * P, 1)
            out = out + (gathered * w_bh).reshape(B, H, Lq, P, Dh).sum(axis=3)
        level_start += Hl * Wl

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
