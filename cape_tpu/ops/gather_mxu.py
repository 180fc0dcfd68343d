"""Row gather as a one-hot MXU matmul — a Pallas TPU kernel.

Why: the MSDA hot loop (`cape_tpu.ops.msda`) is bound by XLA:TPU's
`take_along_axis` row-gather rate (~10.8 ns per 128-wide row on v5e —
PERF.md round 3), ~37x off HBM bandwidth for the same bytes. Mosaic
cannot lower an arbitrary-size row gather either (its gather rule only
accepts same-shape `take_along_axis`), so the classic TPU answer
applies: turn the gather into a matmul. For a query-row block of size R
gathering from an n-row slab,

    out = onehot(idx) @ slab        # (R, n) @ (n, C) on the MXU

where the one-hot tile is *generated in VMEM* (iota-compare on the VPU)
and never touches HBM. XLA's equivalent one-hot formulation measured
40 ms at the flagship shape because the one-hot operand of a dot must be
materialized through HBM (~11 GB of traffic); in-kernel generation
removes exactly that. The backward pass is the transposed matmul
(`d_slab = onehot^T @ d_out`), a scatter-add with the same trick,
accumulated in fp32 across grid steps.

This replaces the gather at `msda.py`'s quad-row call site 1:1 via
`quad_gather(..., impl=...)`; bilinear/attention-weight gradients still
flow through the surrounding XLA blend, so the custom VJP here covers
only gather-in/scatter-back of the value rows (indices get no gradient,
matching `jnp.take_along_axis`).

Reference provenance: the op this accelerates implements
`ms_deform_attn_core_pytorch` (`models/deformable_transformer.py:115-141`)
/ the reference's CUDA `MSDeformAttnFunction` (`models/ops/functions`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pragma: no cover - import guard mirrors msda_pallas.py
    from jax.experimental import pallas as pl

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANE = 128
#: rows of output per program — one (R, n) one-hot tile in VMEM. 256 keeps
#: the tile ≤ ~2.2 MB bf16 at the flagship level-0 slab (n=4224).
_BLOCK_ROWS = 256


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather_fwd_kernel(gi_ref, slab_ref, out_ref):
    idx = gi_ref[0]  # (R, 1) int32
    r = idx.shape[0]
    npad = slab_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, npad), 1)
    onehot = (idx == iota).astype(slab_ref.dtype)
    out_ref[0] = jnp.dot(
        onehot, slab_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _scatter_bwd_kernel(gi_ref, dg_ref, dslab_ref):
    i = pl.program_id(1)
    idx = gi_ref[0]  # (R, 1) int32
    r = idx.shape[0]
    npad = dslab_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, npad), 1)
    onehot = (idx == iota).astype(dg_ref.dtype)
    # onehot^T @ dg — contract the R dimension on the MXU.
    contrib = jax.lax.dot_general(
        onehot, dg_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        dslab_ref[0] = contrib

    @pl.when(i > 0)
    def _acc():
        dslab_ref[0] = dslab_ref[0] + contrib


def _interpret() -> bool:
    # Interpret off-TPU so CPU tests exercise the identical kernel logic.
    return jax.default_backend() != "tpu"


def _gather_mxu_impl(quad: jnp.ndarray, gi: jnp.ndarray) -> jnp.ndarray:
    B, n, C = quad.shape
    _, N = gi.shape
    npad = _pad_to(n, _LANE)
    Npad = _pad_to(N, _BLOCK_ROWS)
    slab = jnp.pad(quad, ((0, 0), (0, npad - n), (0, 0)))
    gi_p = jnp.pad(gi, ((0, 0), (0, Npad - N)))[..., None]  # (B, Npad, 1)
    out = pl.pallas_call(
        _gather_fwd_kernel,
        grid=(B, Npad // _BLOCK_ROWS),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_ROWS, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, npad, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_ROWS, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Npad, C), quad.dtype),
        interpret=_interpret(),
    )(gi_p, slab)
    return out[:, :N]


def _scatter_mxu_impl(dg: jnp.ndarray, gi: jnp.ndarray, n: int) -> jnp.ndarray:
    B, N, C = dg.shape
    npad = _pad_to(n, _LANE)
    Npad = _pad_to(N, _BLOCK_ROWS)
    # zero-padded cotangent rows contribute 0 to the scatter, so the padded
    # gi rows (which alias row 0) are harmless.
    dg_p = jnp.pad(dg, ((0, 0), (0, Npad - N), (0, 0)))
    gi_p = jnp.pad(gi, ((0, 0), (0, Npad - N)))[..., None]
    dslab = pl.pallas_call(
        _scatter_bwd_kernel,
        grid=(B, Npad // _BLOCK_ROWS),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_ROWS, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, _BLOCK_ROWS, C), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, npad, C), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, npad, C), jnp.float32),
        interpret=_interpret(),
    )(gi_p, dg_p)
    return dslab[:, :n]


@functools.lru_cache(maxsize=None)
def _make_quad_gather_mxu(n: int, dtype_name: str):
    """custom_vjp closure over the static slab height / dtype (residuals
    may only hold JAX arrays, so statics live in this cache key)."""
    dt = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def f(quad, gi):
        return _gather_mxu_impl(quad, gi)

    def fwd(quad, gi):
        return _gather_mxu_impl(quad, gi), gi

    def bwd(gi, dg):
        return _scatter_mxu_impl(dg, gi, n).astype(dt), None

    f.defvjp(fwd, bwd)
    return f


def _quad_gather_mxu(quad: jnp.ndarray, gi: jnp.ndarray) -> jnp.ndarray:
    return _make_quad_gather_mxu(quad.shape[1], jnp.dtype(quad.dtype).name)(
        quad, gi)


def quad_gather(quad: jnp.ndarray, gi: jnp.ndarray, impl: str = "xla"):
    """Gather rows `gi` (B, N) int32 from `quad` (B, n, C) -> (B, N, C).

    impl='xla': `jnp.take_along_axis` (the off-TPU default).
    impl='mxu': the one-hot MXU Pallas kernel (this module; the measured
        TPU default — see `default_gather_impl`).
    """
    if impl == "mxu":
        return _quad_gather_mxu(quad, gi)
    if impl == "xla":
        return jnp.take_along_axis(quad, gi[..., None], axis=1)
    raise ValueError(f"unknown gather impl {impl!r}: expected 'xla' or 'mxu'")


@functools.lru_cache(maxsize=1)
def mxu_gather_supported() -> bool:
    """Probe once whether the kernel compiles+runs on this backend."""
    if not _HAS_PALLAS:
        return False
    try:
        quad = jnp.arange(24.0, dtype=jnp.float32).reshape(1, 3, 8)
        quad = jnp.tile(quad, (1, 1, 16))  # C=128
        gi = jnp.array([[2, 0, 1, 2]], dtype=jnp.int32)
        out = jax.jit(_quad_gather_mxu)(quad, gi)
        got = jax.device_get(out)
        want = jax.device_get(quad)[0, [2, 0, 1, 2]]
        return bool((got[0] == want).all())
    except Exception:  # pragma: no cover - backend-dependent
        return False


def default_gather_impl() -> str:
    """Resolve the process-wide default ('CAPE_MSDA_GATHER' env knob).

    'xla' | 'mxu' | 'fused' | 'fusedq' | 'naive' force a backend; 'auto'
    (the default) resolves to the MXU one-hot kernel on a real TPU
    backend when the compile probe passes, else XLA `take_along_axis`.
    The choice is pinned by FULL-TRAIN-STEP measurement on v5e (PERF.md
    round 3): the quad-fused kernel wins the isolated op (fwd+bwd
    36.6 -> 32.9 ms at the flagship encoder shape) but regresses the
    B=4 train step 292 -> 424 ms in context, so 'auto' stays on 'mxu'.
    Call sites with few gather rows (the inference decode step) are
    dispatched shape-aware in `ops/msda._resolve_impl_for_shape`.
    Off-TPU the kernels only exist in interpret mode (test parity, far
    slower than XLA), so 'auto' never selects them there.
    """
    choice = os.environ.get("CAPE_MSDA_GATHER", "auto").lower()
    if choice == "auto":
        if jax.default_backend() != "tpu":
            return "xla"
        return "mxu" if mxu_gather_supported() else "xla"
    if choice in ("xla", "mxu", "fused", "fusedq", "naive", "flat"):
        return choice
    raise ValueError(
        f"CAPE_MSDA_GATHER={choice!r}: expected 'xla', 'mxu', 'fused', "
        "'fusedq', 'naive', 'flat' or 'auto'"
    )
