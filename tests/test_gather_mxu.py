"""One-hot MXU gather kernel vs the XLA gather — exact parity.

The kernel runs in interpret mode on CPU (identical program logic; the
Mosaic lowering itself is probed on hardware by
`gather_mxu.mxu_gather_supported`). Forward must match
`jnp.take_along_axis` EXACTLY: the one-hot matmul sums exactly one
nonzero row in fp32, so no rounding is introduced even in bf16.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cape_tpu.ops import msda
from cape_tpu.ops.gather_mxu import default_gather_impl, quad_gather


def _rand_case(seed, B=2, n=37, N=301, C=128, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    quad = jnp.asarray(rs.randn(B, n, C).astype(np.float32)).astype(dtype)
    gi = jnp.asarray(rs.randint(0, n, (B, N)).astype(np.int32))
    return quad, gi


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 37, 301), (1, 128, 256), (3, 5, 7)])
def test_forward_exact(dtype, shape):
    B, n, N = shape
    quad, gi = _rand_case(0, B=B, n=n, N=N, dtype=dtype)
    got = quad_gather(quad, gi, impl="mxu")
    want = quad_gather(quad, gi, impl="xla")
    assert got.dtype == want.dtype and got.shape == want.shape
    assert jnp.array_equal(got, want)


def test_backward_matches_xla_scatter():
    quad, gi = _rand_case(1)
    cot = jnp.asarray(np.random.RandomState(2).randn(*quad.shape[:1], 301, 128)
                      .astype(np.float32))

    def loss(q, impl):
        return (quad_gather(q, gi, impl=impl) * cot).sum()

    g_mxu = jax.grad(lambda q: loss(q, "mxu"))(quad)
    g_xla = jax.grad(lambda q: loss(q, "xla"))(quad)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_xla),
                               rtol=1e-6, atol=1e-5)


def test_indices_get_no_gradient():
    quad, gi = _rand_case(3, N=64)
    # jacfwd/grad w.r.t. int indices is undefined; the custom VJP returns
    # None for gi, so grad w.r.t. quad must still work under jit.
    g = jax.jit(jax.grad(lambda q: quad_gather(q, gi, impl="mxu").sum()))(quad)
    assert g.shape == quad.shape


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_msda_core_mxu_matches_xla(dtype):
    rs = np.random.RandomState(0)
    B, H, Dh, Lq, P = 2, 2, 32, 18, 3
    shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rs.randn(B, S, H, Dh).astype(np.float32)).astype(dtype)
    loc = jnp.asarray(
        rs.uniform(-0.2, 1.2, (B, Lq, H, len(shapes), P, 2)).astype(np.float32))
    attn = jax.nn.softmax(
        jnp.asarray(rs.randn(B, Lq, H, len(shapes), P).astype(np.float32))
        .reshape(B, Lq, H, -1), axis=-1).reshape(B, Lq, H, len(shapes), P)
    out_x = msda.ms_deform_attn_core(value, shapes, loc, attn,
                                     gather_impl="xla")
    out_m = msda.ms_deform_attn_core(value, shapes, loc, attn,
                                     gather_impl="mxu")
    np.testing.assert_allclose(np.asarray(out_x, np.float32),
                               np.asarray(out_m, np.float32),
                               rtol=2e-5, atol=2e-5)

    def loss(v, l, a, impl):
        return msda.ms_deform_attn_core(v, shapes, l, a,
                                        gather_impl=impl).sum()

    gx = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn, "xla")
    gm = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn, "mxu")
    # bf16: the MXU scatter accumulates in fp32 while XLA's scatter-add
    # rounds to bf16 per step — 1-2 ulp drift is expected (and the fp32
    # accumulation is the MORE accurate of the two).
    tol = dict(rtol=3e-5, atol=3e-5) if dtype == jnp.float32 else \
        dict(rtol=2e-2, atol=5e-3)
    for a, b in zip(gx, gm):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), **tol)


def test_default_impl_env(monkeypatch):
    monkeypatch.setenv("CAPE_MSDA_GATHER", "xla")
    assert default_gather_impl() == "xla"
    monkeypatch.setenv("CAPE_MSDA_GATHER", "mxu")
    assert default_gather_impl() == "mxu"
    monkeypatch.setenv("CAPE_MSDA_GATHER", "fused")
    assert default_gather_impl() == "fused"
    monkeypatch.setenv("CAPE_MSDA_GATHER", "fusedq")
    assert default_gather_impl() == "fusedq"
    monkeypatch.setenv("CAPE_MSDA_GATHER", "bogus")
    with pytest.raises(ValueError):
        default_gather_impl()
    # 'auto' (and the unset default) never picks the interpret-mode kernels
    # off-TPU — that would run the whole MSDA path interpreted in CPU tests.
    monkeypatch.setenv("CAPE_MSDA_GATHER", "auto")
    expected = "mxu" if jax.default_backend() == "tpu" else "xla"
    assert default_gather_impl() == expected
    monkeypatch.delenv("CAPE_MSDA_GATHER")
    assert default_gather_impl() == expected
