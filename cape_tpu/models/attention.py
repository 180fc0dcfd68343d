"""Multi-head attention with split projections and precomputable K/V.

Functionally equivalent to `torch.nn.MultiheadAttention` (packed q/k/v
in-proj with bias + out-proj with bias, scaled dot product, key-padding and
additive attention masks) as used throughout the reference decoder/support
paths. Projections are exposed separately (`project_kv`, `attend`) so that
autoregressive decoding can project static keys/values (support features,
encoder memory) ONCE instead of per step — the TPU-native fix for the
reference's dead `VCache` (`models/kv_cache.py:37-70`, SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative mask value (finite: avoids NaN on all-masked rows)


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.q_proj = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")
        self.attn_dropout = nn.Dropout(self.dropout)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        h = self.num_heads
        return x.reshape(b, l, h, self.d_model // h).transpose(0, 2, 1, 3)

    def project_kv(self, kv_in: jnp.ndarray):
        """Project keys/values once; reuse across decode steps."""
        return self._split(self.k_proj(kv_in)), self._split(self.v_proj(kv_in))

    def project_kv_pre(self, k_in: jnp.ndarray, v_in: jnp.ndarray):
        """Like `project_kv` but with distinct key/value inputs (the decoder
        feeds pre-projected attn_k/attn_v outputs, `dtv2:325-331`)."""
        return self._split(self.k_proj(k_in)), self._split(self.v_proj(v_in))

    def attend(
        self,
        q_in: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Attention with pre-projected K/V.

        Args:
            q_in: (B, Lq, D) query inputs (projected here).
            k, v: (B, H, Lk, Dh) pre-projected keys/values.
            attn_mask: additive (Lq, Lk) or (B, Lq, Lk) float mask, or a
                boolean mask where True = MASKED (torch convention).
            key_padding_mask: (B, Lk) boolean, True = ignore key.
        """
        b, lq, _ = q_in.shape
        h = self.num_heads
        dh = self.d_model // h
        q = self._split(self.q_proj(q_in)) * (dh ** -0.5)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)

        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                add = jnp.where(attn_mask, NEG_INF, 0.0)
            else:
                add = attn_mask
            if add.ndim == 2:
                add = add[None, None]
            elif add.ndim == 3:
                add = add[:, None]
            logits = logits + add.astype(jnp.float32)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], NEG_INF, logits
            )

        weights = nn.softmax(logits, axis=-1).astype(self.dtype)
        weights = self.attn_dropout(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.d_model)
        return self.out_proj(out)

    def __call__(
        self,
        q_in: jnp.ndarray,
        kv_in: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        k, v = self.project_kv(kv_in)
        return self.attend(q_in, k, v, attn_mask, key_padding_mask, deterministic)
