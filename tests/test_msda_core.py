"""Parity tests for the XLA multi-scale deformable attention core against a
torch `F.grid_sample` oracle (the same primitive the reference delegates to,
`models/deformable_transformer.py:115-141`)."""

import numpy as np
import pytest

from cape_tpu.ops import ms_deform_attn_core


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent oracle: per-level grid_sample, bilinear, zeros padding,
    align_corners=False — then attention-weighted sum over levels/points."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    loc = torch.from_numpy(sampling_locations)
    attn = torch.from_numpy(attention_weights)
    B, S, H, Dh = value.shape
    _, Lq, _, L, P, _ = loc.shape
    splits = [h * w for h, w in spatial_shapes]
    vals = value.split(splits, dim=1)
    grids = 2 * loc - 1
    per_level = []
    for l, (h, w) in enumerate(spatial_shapes):
        v = vals[l].flatten(2).transpose(1, 2).reshape(B * H, Dh, h, w)
        g = grids[:, :, :, l].transpose(1, 2).flatten(0, 1)  # (B*H, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        per_level.append(s)  # (B*H, Dh, Lq, P)
    attn_t = attn.transpose(1, 2).reshape(B * H, 1, Lq, L * P)
    out = (torch.stack(per_level, dim=-2).flatten(-2) * attn_t).sum(-1)
    return out.view(B, H * Dh, Lq).transpose(1, 2).numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_matches_grid_sample(seed):
    rng = np.random.default_rng(seed)
    B, H, Dh, Lq, P = 2, 4, 8, 10, 4
    shapes = [(8, 8), (4, 4), (2, 2)]
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    # locations mostly inside, some outside [0,1] to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Lq, H, L, P)).astype(np.float32)
    w /= w.reshape(B, Lq, H, -1).sum(-1)[..., None, None]

    ours = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    ref = torch_oracle(value, shapes, loc, w)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_msda_out_of_bounds_is_zero():
    B, H, Dh, Lq, P = 1, 2, 4, 3, 2
    shapes = [(4, 4)]
    S = 16
    value = np.ones((B, S, H, Dh), dtype=np.float32)
    loc = np.full((B, Lq, H, 1, P, 2), 5.0, dtype=np.float32)  # far outside
    w = np.ones((B, Lq, H, 1, P), dtype=np.float32) / P
    out = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    np.testing.assert_allclose(out, 0.0)


@pytest.mark.parametrize("lo,hi", [(-0.2, 1.2), (-1.5, 2.5), (0.1, 0.9)])
def test_quad_formulation_matches_naive(lo, hi):
    """The production quad-row formulation must equal the direct 4-corner
    gather oracle — values AND gradients — including far-out-of-bounds
    sampling locations (grid_sample zeros-padding contract)."""
    import jax
    import jax.numpy as jnp

    from cape_tpu.ops.msda import ms_deform_attn_core_naive

    rng = np.random.default_rng(42)
    B, H, Dh, Lq, P = 2, 4, 8, 12, 4
    shapes = [(8, 8), (4, 4), (2, 2)]
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    loc = rng.uniform(lo, hi, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Lq, H, L, P)).astype(np.float32)
    w /= w.reshape(B, Lq, H, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    ref = np.asarray(ms_deform_attn_core_naive(value, shapes, loc, w))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def total(core, v, l, a):
        return jnp.sum(core(v, shapes, l, a) ** 2)

    g_got = jax.grad(total, argnums=(1, 2, 3))(
        ms_deform_attn_core, value, loc, w)
    g_ref = jax.grad(total, argnums=(1, 2, 3))(
        ms_deform_attn_core_naive, value, loc, w)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["fused", "fusedq", "flat"])
@pytest.mark.parametrize("lo,hi", [(-0.2, 1.2), (-1.5, 2.5), (0.1, 0.9)])
def test_fused_formulation_matches_naive(impl, lo, hi):
    """The single-kernel formulations (gather_impl='fused'/'fusedq',
    interpret mode off-TPU) must equal the direct 4-corner gather oracle —
    values AND gradients — including far-out-of-bounds locations."""
    import jax
    import jax.numpy as jnp

    from cape_tpu.ops.msda import ms_deform_attn_core_naive

    rng = np.random.default_rng(7)
    B, H, Dh, Lq, P = 2, 4, 8, 12, 4
    shapes = [(8, 8), (4, 4), (2, 2)]
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    loc = rng.uniform(lo, hi, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Lq, H, L, P)).astype(np.float32)
    w /= w.reshape(B, Lq, H, -1).sum(-1)[..., None, None]

    fused = lambda v, s, l, a: ms_deform_attn_core(v, s, l, a,  # noqa: E731
                                                   gather_impl=impl)
    got = np.asarray(fused(value, shapes, loc, w))
    ref = np.asarray(ms_deform_attn_core_naive(value, shapes, loc, w))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def total(core, v, l, a):
        return jnp.sum(core(v, shapes, l, a) ** 2)

    g_got = jax.grad(total, argnums=(1, 2, 3))(fused, value, loc, w)
    g_ref = jax.grad(total, argnums=(1, 2, 3))(
        ms_deform_attn_core_naive, value, loc, w)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_out_of_bounds_is_zero():
    B, H, Dh, Lq, P = 1, 2, 4, 3, 2
    shapes = [(4, 4)]
    S = 16
    value = np.ones((B, S, H, Dh), dtype=np.float32)
    loc = np.full((B, Lq, H, 1, P, 2), 5.0, dtype=np.float32)  # far outside
    w = np.ones((B, Lq, H, 1, P), dtype=np.float32) / P
    out = np.asarray(
        ms_deform_attn_core(value, shapes, loc, w, gather_impl="fused"))
    np.testing.assert_allclose(out, 0.0)


def test_auto_impl_is_shape_aware(monkeypatch):
    """'auto' must pick the naive 4-corner gather at decode-step row
    counts (the kernels pad every call to a 256-row one-hot tile — 64x
    waste at Lq=1) and only engage kernels at encoder-scale row counts;
    an explicitly forced backend wins at every shape."""
    from cape_tpu.ops.msda import _NAIVE_MAX_ROWS, _resolve_impl_for_shape

    monkeypatch.delenv("CAPE_MSDA_GATHER", raising=False)
    monkeypatch.delenv("CAPE_MSDA_TINY", raising=False)
    # without overrides, every shape uses the process default: the
    # kernels win even at decode-step row counts (PERF.md round 3)
    import jax

    default = "mxu" if jax.default_backend() == "tpu" else "xla"
    assert _resolve_impl_for_shape(4) == default
    assert _resolve_impl_for_shape(_NAIVE_MAX_ROWS + 1) == default
    # CAPE_MSDA_TINY overrides tiny call sites only
    monkeypatch.setenv("CAPE_MSDA_TINY", "flat")
    assert _resolve_impl_for_shape(4) == "flat"
    assert _resolve_impl_for_shape(_NAIVE_MAX_ROWS) == "flat"
    assert _resolve_impl_for_shape(_NAIVE_MAX_ROWS + 1) == default
    monkeypatch.setenv("CAPE_MSDA_GATHER", "mxu")
    assert _resolve_impl_for_shape(4) == "mxu"  # forced wins at any shape


def test_auto_impl_is_batch_aware(monkeypatch):
    """At tiny call sites 'auto' switches to XLA take_along_axis at/above
    the measured batch threshold: the one-hot kernels pad every
    (batch x head) program's handful of rows to a 256-row tile, so their
    cost grows linearly with batch (round-4 gather probe: XLA 38.8 us vs
    one-hot 150.9 us at the B=8 decode-step slab)."""
    from cape_tpu.ops.msda import _TINY_XLA_MIN_BATCH, _resolve_impl_for_shape

    monkeypatch.delenv("CAPE_MSDA_GATHER", raising=False)
    monkeypatch.delenv("CAPE_MSDA_TINY", raising=False)
    monkeypatch.delenv("CAPE_MSDA_TINY_XLA_BATCH", raising=False)
    assert _resolve_impl_for_shape(4, batch=_TINY_XLA_MIN_BATCH) == "xla"
    assert _resolve_impl_for_shape(4, batch=128) == "xla"
    # big-row (encoder) sites never take the tiny-batch branch
    import jax

    default = "mxu" if jax.default_backend() == "tpu" else "xla"
    assert _resolve_impl_for_shape(512, batch=128) == default
    # the batch rule is decode-only (Lq == 1): small-but-multi-query
    # teacher-forced sites keep the process default — the XLA inversion
    # was only ever measured at the Lq=1 decode-step shape
    assert _resolve_impl_for_shape(64, batch=128, lq=16) == default
    # an explicit CAPE_MSDA_TINY still wins over the batch rule
    monkeypatch.setenv("CAPE_MSDA_TINY", "naive")
    assert _resolve_impl_for_shape(4, batch=128) == "naive"
    # threshold is env-tunable
    monkeypatch.delenv("CAPE_MSDA_TINY", raising=False)
    monkeypatch.setenv("CAPE_MSDA_TINY_XLA_BATCH", "1000000")
    assert _resolve_impl_for_shape(4, batch=128) == default


@pytest.mark.parametrize("impl", ["xla", "mxu"])
@pytest.mark.parametrize("lo,hi", [(-0.2, 1.2), (-1.5, 2.5), (0.1, 0.9)])
def test_prequad_formulation_matches_naive(impl, lo, hi):
    """The decode-step prequad path (quad slab packed once + single
    16-row gather per (batch, head)) must equal the direct 4-corner
    gather oracle, including far-out-of-bounds locations."""
    from cape_tpu.ops.msda import (
        ms_deform_attn_core_naive,
        ms_deform_attn_core_prequad,
        precompute_quad_slab,
    )

    rng = np.random.default_rng(7)
    B, H, Dh, Lq, P = 2, 4, 32, 1, 4  # decode step: Lq=1; Dh*4=128 lanes
    shapes = [(8, 8), (4, 4), (2, 2)]
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    loc = rng.uniform(lo, hi, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Lq, H, L, P)).astype(np.float32)
    w /= w.reshape(B, Lq, H, -1).sum(-1)[..., None, None]

    slab = precompute_quad_slab(value, shapes)
    assert slab.shape == (B * H, sum((w_ + 1) + h_ * w_ for h_, w_ in shapes),
                          4 * Dh)
    got = np.asarray(ms_deform_attn_core_prequad(
        slab, shapes, loc, w, gather_impl=impl))
    ref = np.asarray(ms_deform_attn_core_naive(value, shapes, loc, w))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_zero_ablation_impl_reaches_both_cores(monkeypatch):
    """The 'zero' measurement-only ablation (CAPE_MSDA_TINY=zero) must
    actually reach the call site and zero the MSDA output at BOTH cores
    — the exact instrument-wiring failure mode the round-5 noise probe
    taught us to test for (a knob that silently doesn't apply measures
    the wrong thing)."""
    from cape_tpu.ops.msda import (
        _resolve_impl_for_shape,
        ms_deform_attn_core_prequad,
        precompute_quad_slab,
    )

    rng = np.random.default_rng(3)
    B, H, Dh, Lq, P = 2, 2, 4, 1, 4
    shapes = [(4, 4), (2, 2)]
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    loc = rng.uniform(0.1, 0.9, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Lq, H, L, P)).astype(np.float32)

    out = np.asarray(ms_deform_attn_core(
        value, shapes, loc, w, gather_impl="zero"))
    assert out.shape == (B, Lq, H * Dh) and (out == 0).all()

    slab = precompute_quad_slab(value, shapes)
    outq = np.asarray(ms_deform_attn_core_prequad(
        slab, shapes, loc, w, gather_impl="zero"))
    assert outq.shape == (B, Lq, H * Dh) and (outq == 0).all()
    # and the non-ablated path is nonzero on the same inputs
    assert np.abs(np.asarray(ms_deform_attn_core_prequad(
        slab, shapes, loc, w, gather_impl="xla"))).max() > 0

    # env threading: CAPE_MSDA_TINY=zero resolves at tiny sites
    monkeypatch.delenv("CAPE_MSDA_GATHER", raising=False)
    monkeypatch.setenv("CAPE_MSDA_TINY", "zero")
    assert _resolve_impl_for_shape(4, batch=1) == "zero"


def test_msda_is_differentiable():
    import jax
    import jax.numpy as jnp

    shapes = [(4, 4), (2, 2)]
    S = 20
    value = jnp.ones((1, S, 2, 4))
    loc = jnp.full((1, 3, 2, 2, 2, 2), 0.5)
    w = jnp.ones((1, 3, 2, 2, 2)) / 4

    def f(v, l):
        return ms_deform_attn_core(v, shapes, l, w).sum()

    gv, gl = jax.grad(f, argnums=(0, 1))(value, loc)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gl)).all()
