"""Pallas MSDA kernel logic test (interpret mode — validates the kernel's
index/weight math against the XLA core; compiled-mode usage is gated by
`pallas_supported()` at runtime)."""

import numpy as np
import jax.numpy as jnp

from cape_tpu.ops import ms_deform_attn_core
from cape_tpu.ops.msda_pallas import ms_deform_attn_pallas


def test_pallas_kernel_matches_xla_core_interpret():
    rng = np.random.default_rng(0)
    B, H, Dh, Lq, P = 2, 2, 8, 12, 2
    shapes = [(4, 4), (2, 2)]
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Lq, H, L, P)).astype(np.float32)
    w /= w.reshape(B, Lq, H, -1).sum(-1)[..., None, None]

    ref = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    out = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        block_q=8, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
