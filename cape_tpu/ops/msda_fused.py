"""Fused MSDA sampling kernel: weighted one-hot gather+blend on the MXU.

The shipped quad-row core (`ops/msda.py` + `ops/gather_mxu.py`) splits the
hot loop into XLA packing -> Pallas one-hot gather -> XLA blend -> XLA
corner/point summing matmul. Stage-timing it on v5e
(`scripts/probe_msda_decomposition.py`, flagship encoder shape) shows the
split itself is now the cost: pack+gather 9.81 ms, +blend 9.91 ms, but the
full core 26.66 ms — every stage boundary is a (B, Lq*P, 4*Dh) round-trip
through HBM.

This kernel folds the bilinear/attention weights INTO the one-hot matrix
and contracts against the RAW level slab, all in VMEM:

    oh[r, s] = sum_c w_c[r] * (base[r] + shift_c == s)   # VPU, in VMEM
    out[r]   = oh @ level_value                          # one MXU matmul

per (batch*head, level), where shift_c in {0, 1, W, W+1} are the four
bilinear corners of flat cell `base`. Compared to the quad-row path this
eliminates the 2x2-neighborhood packing (no 4x-duplicated quad slab in
HBM), the 512-wide gathered/blended temps, and the summing einsum — and
contracts to Dh=32 lanes instead of 4*Dh=128, i.e. 4x fewer MXU MACs.
Out-of-bounds corners carry zero weight (grid_sample zeros-padding
contract), and any zero-weight corner contributes exactly zero no matter
where its (clipped/wrapped) index points, so no padding rows are needed.

The backward is two transposed contractions in the same kernel:
d_slab = oh^T @ d_out (accumulated across row blocks in VMEM), and
d_w_c[r] = sum_s (base[r]+shift_c == s) * (d_out @ slab^T)[r, s].

Mosaic lowering constraints honored (probe_mosaic_features.py, this
toolchain's remote compiler): minor-1 scalar-per-row operands, in-kernel
constants and chained MXU dots lower; unaligned window reads, minor
concats and minor-4 blocks do NOT — hence five separate (R, 1) operands
instead of one (R, 4) weight block, and `jnp.where` accumulation instead
of stacking.

Reference provenance: computes `ms_deform_attn_core_pytorch`
(`models/deformable_transformer.py:115-141`) / the reference's CUDA
`MSDeformAttnFunction` (`models/ops/functions/ms_deform_attn_func.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pragma: no cover - import guard mirrors gather_mxu.py
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANE = 128
#: output rows per program; the (R, HW_pad) weighted one-hot tile is the
#: VMEM budget driver (~2.2 MB bf16 at the flagship level-0 slab).
_BLOCK_ROWS = 256


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    # Interpret off-TPU so CPU tests exercise the identical kernel logic.
    return jax.default_backend() != "tpu"


def _weighted_onehot(shifts, idx, ws, hwp, dtype):
    """(R, hwp) matrix with w_c at column base+shift_c, built in VMEM.

    The bool hit mask is cast to `dtype` BEFORE any broadcast arithmetic:
    Mosaic cannot relayout i1 vectors (a `jnp.where(hits, wc, 0)` with a
    lane-replicated (R, 1) branch fails with "Invalid relayout ... i1"),
    while f32/bf16 broadcasts lower fine.
    """
    r = idx.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, hwp), 1)
    oh = None
    for c, s in enumerate(shifts):
        m = (idx + s == iota).astype(dtype) * ws[c].astype(dtype)
        oh = m if oh is None else oh + m
    return oh


def _fused_fwd_kernel(shifts, gi_ref, w0_ref, w1_ref, w2_ref, w3_ref,
                      slab_ref, out_ref):
    idx = gi_ref[0]  # (R, 1) int32
    hwp = slab_ref.shape[1]
    ws = (w0_ref[0], w1_ref[0], w2_ref[0], w3_ref[0])
    oh = _weighted_onehot(shifts, idx, ws, hwp, slab_ref.dtype)
    out_ref[0] = jnp.dot(
        oh, slab_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _fused_bwd_kernel(shifts, gi_ref, w0_ref, w1_ref, w2_ref, w3_ref,
                      slab_ref, dout_ref, dslab_ref, dw_ref):
    i = pl.program_id(1)
    idx = gi_ref[0]  # (R, 1) int32
    r = idx.shape[0]
    hwp = slab_ref.shape[1]
    dh = dout_ref.shape[2]
    dt = slab_ref.dtype
    dout = dout_ref[0]

    # d_w_c[r] = <d_out[r], slab[base_r + shift_c]> via the row-dot matrix
    # g_dot[r, s] = <d_out[r], slab[s]> (one MXU pass, reused 4x).
    g_dot = jax.lax.dot_general(
        dout, slab_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, hwp) f32
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, hwp), 1)
    oh = None
    dw = jnp.zeros((r, dh), jnp.float32)
    sel = jnp.eye(4, dh, dtype=jnp.float32)  # corner c -> lane c
    for c, s in enumerate(shifts):
        # i1 vectors cannot be relayouted (see _weighted_onehot) — cast the
        # hit mask once, then everything is f32/bf16 arithmetic.
        hit = (idx + s == iota).astype(dt)  # (R, hwp) 0/1
        wc = (w0_ref, w1_ref, w2_ref, w3_ref)[c][0].astype(dt)
        m = hit * wc
        oh = m if oh is None else oh + m
        dwc = jnp.sum(hit * g_dot, axis=1, keepdims=True)  # (R, 1) f32
        dw = dw + dwc * sel[c:c + 1]
    dw_ref[0] = dw.astype(dw_ref.dtype)

    # d_slab = oh^T @ d_out, accumulated across row blocks.
    contrib = jax.lax.dot_general(
        oh, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (hwp, dh) f32

    @pl.when(i == 0)
    def _init():
        dslab_ref[0] = contrib

    @pl.when(i > 0)
    def _acc():
        dslab_ref[0] = dslab_ref[0] + contrib


def _pad_operands(slab, gi, w4):
    BH, HW, Dh = slab.shape
    _, N = gi.shape
    hwp = _pad_to(HW, _LANE)
    npad = _pad_to(N, _BLOCK_ROWS)
    slab_p = jnp.pad(slab, ((0, 0), (0, hwp - HW), (0, 0)))
    gi_p = jnp.pad(gi, ((0, 0), (0, npad - N)))[..., None]
    w_p = jnp.pad(w4, ((0, 0), (0, npad - N), (0, 0)))
    wrefs = tuple(w_p[:, :, c:c + 1] for c in range(4))
    return slab_p, gi_p, wrefs, hwp, npad


def _scalar_spec(npad):
    return pl.BlockSpec((1, _BLOCK_ROWS, 1), lambda b, i: (b, i, 0))


def _fused_fwd_impl(shifts, slab, gi, w4):
    BH, HW, Dh = slab.shape
    N = gi.shape[1]
    slab_p, gi_p, wrefs, hwp, npad = _pad_operands(slab, gi, w4)
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, shifts),
        grid=(BH, npad // _BLOCK_ROWS),
        in_specs=[_scalar_spec(npad)] * 5 + [
            pl.BlockSpec((1, hwp, Dh), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_ROWS, Dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, npad, Dh), slab.dtype),
        interpret=_interpret(),
    )(gi_p, *wrefs, slab_p)
    return out[:, :N]


def _fused_bwd_impl(shifts, slab, gi, w4, dout):
    BH, HW, Dh = slab.shape
    N = gi.shape[1]
    slab_p, gi_p, wrefs, hwp, npad = _pad_operands(slab, gi, w4)
    dout_p = jnp.pad(dout, ((0, 0), (0, npad - N), (0, 0)))
    dslab, dw = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, shifts),
        grid=(BH, npad // _BLOCK_ROWS),
        in_specs=[_scalar_spec(npad)] * 5 + [
            pl.BlockSpec((1, hwp, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, _BLOCK_ROWS, Dh), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, hwp, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, _BLOCK_ROWS, Dh), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, hwp, Dh), jnp.float32),
            jax.ShapeDtypeStruct((BH, npad, Dh), jnp.float32),
        ),
        interpret=_interpret(),
    )(gi_p, *wrefs, slab_p, dout_p)
    return dslab[:, :HW].astype(slab.dtype), dw[:, :N, :4].astype(w4.dtype)


# ---------------------------------------------------------------------------
# Quad-fused variant: one-hot gather from the QUAD slab (one compare, like
# ops/gather_mxu.py) with the bilinear/attention blend and the corner-sum
# matmul fused into the same kernel. The raw-slab kernel above needs four
# weighted compares over the (R, HW) tile and measures VPU-bound (32.8 ms
# fwd at the flagship shape); this variant keeps the single compare and
# moves only lane-cheap (R, 4*Dh) work in-kernel, eliminating the XLA
# blend + summing-einsum stages (~17 ms of the 26.66 ms quad-MXU core).
# ---------------------------------------------------------------------------


def _lane_bands(dh: int, dtype):
    """(1, 4*Dh) indicator rows: band c is 1 on lanes [c*Dh, (c+1)*Dh)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * dh), 1)
    return [((lane >= c * dh) & (lane < (c + 1) * dh)).astype(dtype)
            for c in range(4)]


def _wrep(w_refs, dh, dtype):
    """(R, 4*Dh) lane-repeated corner weights from four (R, 1) operands."""
    bands = _lane_bands(dh, dtype)
    acc = None
    for c in range(4):
        m = w_refs[c][0].astype(dtype) * bands[c]
        acc = m if acc is None else acc + m
    return acc


def _quadfused_fwd_kernel(gi_ref, w0_ref, w1_ref, w2_ref, w3_ref,
                          slab_ref, out_ref):
    idx = gi_ref[0]  # (R, 1) int32
    r = idx.shape[0]
    npad = slab_ref.shape[1]
    dt = slab_ref.dtype
    dh = out_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, npad), 1)
    onehot = (idx == iota).astype(dt)
    g = jnp.dot(onehot, slab_ref[0],
                preferred_element_type=jnp.float32)  # (R, 4*Dh)
    gw = g * _wrep((w0_ref, w1_ref, w2_ref, w3_ref), dh, jnp.float32)
    sum4 = jnp.tile(jnp.eye(dh, dtype=jnp.float32), (4, 1))
    out_ref[0] = jnp.dot(gw.astype(dt), sum4.astype(dt),
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _quadfused_bwd_kernel(gi_ref, w0_ref, w1_ref, w2_ref, w3_ref,
                          slab_ref, dout_ref, dslab_ref, dw_ref):
    i = pl.program_id(1)
    idx = gi_ref[0]
    r = idx.shape[0]
    npad = slab_ref.shape[1]
    dt = slab_ref.dtype
    dh = dout_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, npad), 1)
    onehot = (idx == iota).astype(dt)
    # d_gw = d_out @ sum4^T (tiles d_out across the 4 corner lane groups)
    sum4t = jnp.tile(jnp.eye(dh, dtype=dt), (1, 4))
    d_gw = jnp.dot(dout_ref[0], sum4t,
                   preferred_element_type=jnp.float32)  # (R, 4*Dh)
    wrep = _wrep((w0_ref, w1_ref, w2_ref, w3_ref), dh, jnp.float32)
    d_g = d_gw * wrep
    # d_w_c = sum over the corner's lane band of d_gw * g
    g = jnp.dot(onehot, slab_ref[0], preferred_element_type=jnp.float32)
    d_wrep = d_gw * g
    dw = jnp.zeros((r, dh), jnp.float32)
    sel = jnp.eye(4, dh, dtype=jnp.float32)  # corner c -> lane c
    for c, band in enumerate(_lane_bands(dh, jnp.float32)):
        dwc = jnp.sum(d_wrep * band, axis=1, keepdims=True)  # (R, 1)
        dw = dw + dwc * sel[c:c + 1]
    dw_ref[0] = dw.astype(dw_ref.dtype)

    contrib = jax.lax.dot_general(
        onehot, d_g.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (npad, 4*Dh)

    @pl.when(i == 0)
    def _init():
        dslab_ref[0] = contrib

    @pl.when(i > 0)
    def _acc():
        dslab_ref[0] = dslab_ref[0] + contrib


def _quadfused_fwd_impl(slab, gi, w4):
    BH, n, C = slab.shape
    Dh = C // 4
    N = gi.shape[1]
    slab_p, gi_p, wrefs, npad_n, npad = _pad_operands(slab, gi, w4)
    out = pl.pallas_call(
        _quadfused_fwd_kernel,
        grid=(BH, npad // _BLOCK_ROWS),
        in_specs=[_scalar_spec(npad)] * 5 + [
            pl.BlockSpec((1, npad_n, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_ROWS, Dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, npad, Dh), slab.dtype),
        interpret=_interpret(),
    )(gi_p, *wrefs, slab_p)
    return out[:, :N]


def _quadfused_bwd_impl(slab, gi, w4, dout):
    BH, n, C = slab.shape
    Dh = C // 4
    N = gi.shape[1]
    slab_p, gi_p, wrefs, npad_n, npad = _pad_operands(slab, gi, w4)
    dout_p = jnp.pad(dout, ((0, 0), (0, npad - N), (0, 0)))
    dslab, dw = pl.pallas_call(
        _quadfused_bwd_kernel,
        grid=(BH, npad // _BLOCK_ROWS),
        in_specs=[_scalar_spec(npad)] * 5 + [
            pl.BlockSpec((1, npad_n, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, _BLOCK_ROWS, Dh), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, npad_n, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, _BLOCK_ROWS, Dh), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, npad_n, C), jnp.float32),
            jax.ShapeDtypeStruct((BH, npad, Dh), jnp.float32),
        ),
        interpret=_interpret(),
    )(gi_p, *wrefs, slab_p, dout_p)
    return dslab[:, :n].astype(slab.dtype), dw[:, :N, :4].astype(w4.dtype)


@jax.custom_vjp
def _quadfused(slab, gi, w4):
    return _quadfused_fwd_impl(slab, gi, w4)


def _quadfused_fwd(slab, gi, w4):
    return _quadfused_fwd_impl(slab, gi, w4), (slab, gi, w4)


def _quadfused_bwd(res, dout):
    slab, gi, w4 = res
    dslab, dw4 = _quadfused_bwd_impl(slab, gi, w4, dout)
    return dslab, None, dw4


_quadfused.defvjp(_quadfused_fwd, _quadfused_bwd)


def quadfused_level_sample(slab: jnp.ndarray, gi: jnp.ndarray,
                           w4: jnp.ndarray) -> jnp.ndarray:
    """Gather+blend+corner-sum over a QUAD slab in one kernel.

    Args:
        slab: (BH, n, 4*Dh) quad rows (`ops/msda._quad_rows` layout).
        gi:   (BH, N) int32 base row index into the quad slab.
        w4:   (BH, N, 4) corner weights (quad lane-group order), zeroed OOB.

    Returns:
        (BH, N, Dh) = sum_c w4[..., c] * slab[gi][c*Dh:(c+1)*Dh].
    """
    return _quadfused(slab, gi, w4)


@functools.lru_cache(maxsize=None)
def _make_fused_sample(Wl: int):
    """custom_vjp closure over the level width (fixes the corner shifts;
    statics live in this cache key so residuals hold only arrays)."""
    shifts = (0, 1, Wl, Wl + 1)

    @jax.custom_vjp
    def f(slab, gi, w4):
        return _fused_fwd_impl(shifts, slab, gi, w4)

    def fwd(slab, gi, w4):
        return _fused_fwd_impl(shifts, slab, gi, w4), (slab, gi, w4)

    def bwd(res, dout):
        slab, gi, w4 = res
        dslab, dw4 = _fused_bwd_impl(shifts, slab, gi, w4, dout)
        return dslab, None, dw4

    f.defvjp(fwd, bwd)
    return f


def fused_level_sample(slab: jnp.ndarray, gi: jnp.ndarray, w4: jnp.ndarray,
                       Wl: int) -> jnp.ndarray:
    """Blend 4 bilinear corners of one feature level in a single kernel.

    Args:
        slab: (BH, HW, Dh) one level's features, heads folded into batch.
        gi:   (BH, N) int32 flat index of the top-left corner (row-major,
              level-local, may be negative / wrapped — zero-weight corners
              contribute nothing regardless).
        w4:   (BH, N, 4) combined bilinear * attention weight per corner
              in shift order (0, 1, Wl, Wl+1), zeroed where OOB.
        Wl:   static level width.

    Returns:
        (BH, N, Dh) = sum_c w4[..., c] * slab[gi + shift_c], rows are
        (query, point) pairs — the point-sum is the caller's.
    """
    return _make_fused_sample(Wl)(slab, gi, w4)


@functools.lru_cache(maxsize=1)
def quadfused_supported() -> bool:
    """Probe once whether the quad-fused kernel compiles+runs here."""
    if not _HAS_PALLAS:
        return False
    try:
        # slab rows 0..3, Dh=32: row r corner c holds r*4+c in every lane
        slab = jnp.repeat(jnp.arange(16.0, dtype=jnp.float32)
                          .reshape(1, 4, 4), 32, axis=2)
        gi = jnp.array([[2, 0, 1, 3]], dtype=jnp.int32)
        w4 = jnp.array([[[1, 0, 0, 0], [0, 1, 0, 0],
                         [0, 0, 0, 0], [0.25, 0.25, 0.25, 0.25]]],
                       jnp.float32)
        out = jax.device_get(jax.jit(quadfused_level_sample)(slab, gi, w4))
        want = jnp.array([8.0, 1.0, 0.0, 13.5])[:, None] * jnp.ones((4, 32))
        return bool(jnp.allclose(out[0], want, atol=1e-3))
    except Exception:  # pragma: no cover - backend-dependent
        return False


@functools.lru_cache(maxsize=1)
def fused_msda_supported() -> bool:
    """Probe once whether the fused kernel compiles+runs on this backend."""
    if not _HAS_PALLAS:
        return False
    try:
        slab = jnp.arange(32.0, dtype=jnp.float32).reshape(1, 4, 8)
        slab = jnp.tile(slab, (1, 1, 16))  # Dh=128 lanes
        gi = jnp.array([[1, 0, -7, 2]], dtype=jnp.int32)
        w4 = jnp.array([[[1, 0, 0, 0], [0, 1, 0, 0],
                         [0, 0, 0, 0], [0.5, 0.5, 0, 0]]], jnp.float32)
        out = jax.device_get(jax.jit(
            lambda s, g, w: fused_level_sample(s, g, w, 2))(slab, gi, w4))
        ref = jax.device_get(slab)[0]
        want = jnp.stack([ref[1], ref[1], 0 * ref[0],
                          0.5 * ref[2] + 0.5 * ref[3]])
        return bool(jnp.allclose(out[0], want, atol=1e-3))
    except Exception:  # pragma: no cover - backend-dependent
        return False
