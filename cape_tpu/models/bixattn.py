"""Bidirectional cross-attention (BiXAttn) blocks.

Flax re-design of `models/bixattn.py:32-235`: one shared QK logit matrix is
softmaxed along both axes, so modality A attends to B and B attends to A
with a single matmul. In the reference this powers decoder variant v3
(`deformable_transformer_v2.py:881-948`), an experimental path that is not
CAPE-complete (no support conditioning — SURVEY.md §2.2/§7.5); the blocks
are provided here as standalone, tested components for experimentation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import NEG_INF


def _activation(name: str):
    """Mlp activation by name. 'gelu' is exact (erf) — torch `nn.GELU`'s
    default, which the reference's timm `Mlp` blocks use."""
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "relu":
        return nn.relu
    raise ValueError(f"unsupported activation {name!r}")


class BiXAttn(nn.Module):
    """Shared-logit bidirectional cross-attention (`bixattn.py:32-84`)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (B, N, D)
        y: jnp.ndarray,            # (B, M, D)
        x_mask: Optional[jnp.ndarray] = None,  # (B, N) True = ignore
        y_mask: Optional[jnp.ndarray] = None,  # (B, M) True = ignore
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.num_heads
        dh = self.dim // h

        def proj(name, z):
            out = nn.Dense(self.dim, use_bias=self.qkv_bias,
                           dtype=self.dtype, name=name)(z)
            b, l, _ = z.shape
            return out.reshape(b, l, h, dh).transpose(0, 2, 1, 3)

        qx, vx = proj("q_x", x), proj("v_x", x)
        ky, vy = proj("k_y", y), proj("v_y", y)

        logits = jnp.einsum("bhnd,bhmd->bhnm", qx, ky).astype(jnp.float32)
        logits = logits * (dh ** -0.5)
        if y_mask is not None:
            logits = jnp.where(y_mask[:, None, None, :], NEG_INF, logits)
        attn_x2y = nn.softmax(logits, axis=-1)          # x attends over y
        logits_t = logits
        if x_mask is not None:
            logits_t = jnp.where(x_mask[:, None, :, None], NEG_INF, logits_t)
        attn_y2x = nn.softmax(logits_t, axis=-2)        # y attends over x

        out_x = jnp.einsum("bhnm,bhmd->bhnd", attn_x2y.astype(self.dtype), vy)
        out_y = jnp.einsum("bhnm,bhnd->bhmd", attn_y2x.astype(self.dtype), vx)

        def unproj(name, z, l):
            z = z.transpose(0, 2, 1, 3).reshape(z.shape[0], l, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name=name)(z)

        return (unproj("proj_x", out_x, x.shape[1]),
                unproj("proj_y", out_y, y.shape[1]))


class BiXAttnBlock(nn.Module):
    """Pre-LN bidirectional block with per-modality MLPs
    (`bixattn.py:85-180`)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    act: str = "gelu"                 # v3 builds its blocks with relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_mask=None, y_mask=None):
        nx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        ny = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)
        dx, dy = BiXAttn(self.dim, self.num_heads, dtype=self.dtype)(
            nx, ny, x_mask, y_mask
        )
        x = x + dx
        y = y + dy
        act = _activation(self.act)

        def mlp(z, name):
            h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                         name=f"{name}_fc1")(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(z))
            h = act(h)
            return z + nn.Dense(self.dim, dtype=self.dtype,
                                name=f"{name}_fc2")(h)

        return mlp(x, "mlp_x"), mlp(y, "mlp_y")


class CAOneSidedBlock(nn.Module):
    """One-sided cross-attention block (last-layer variant,
    `bixattn.py:181-235`): x attends to y; y passes through."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    act: str = "gelu"                 # v3 builds its blocks with relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_mask=None, y_mask=None):
        from .attention import MultiHeadAttention

        nx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        ny = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)
        dx = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype)(
            nx, ny, key_padding_mask=y_mask
        )
        x = x + dx
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        )
        x = x + nn.Dense(self.dim, dtype=self.dtype)(_activation(self.act)(h))
        return x, y
