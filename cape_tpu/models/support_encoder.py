"""Geometric support encoder — geometry-only support conditioning.

Flax re-design of `models/geometric_support_encoder.py:22-238`:
coordinate MLP + 2D sine PE of (x, y) + 1D sequence PE -> optional GCN
pre-encoding over the skeleton adjacency -> N post-LN transformer encoder
layers with key-padding masking. The all-keypoints-masked edge case zeroes
that sample's output (reference lines 197-226); with the finite NEG_INF
masking in attention no temporary unmasking is needed.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiHeadAttention
from .graph import GCNLayer, adj_from_skeleton
from .position_encoding import coords_sine_embed, interleaved_1d_table


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch `nn.TransformerEncoderLayer` semantics)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                  dtype=self.dtype)(
            x, x, key_padding_mask=key_padding_mask, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype)(y)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class GeometricSupportEncoder(nn.Module):
    """Encode support keypoints + skeleton into (B, N, D) features.

    Input mask convention: True = INVALID keypoint (same as the reference
    encoder input after `CAPEModel`'s polarity flip — the wrapper passes
    `~support_mask` where support_mask is True-for-ignore; see
    `cape_model.py:118-123`. Here we standardize on True = invalid
    throughout the framework and document it once.)
    """

    hidden_dim: int = 256
    num_layers: int = 3
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    use_gcn: bool = True
    num_gcn_layers: int = 2
    max_seq_pe: int = 100
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        coords: jnp.ndarray,
        mask: jnp.ndarray,
        skeleton_edges: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """coords: (B, N, 2) in [0,1]; mask: (B, N) True=invalid;
        skeleton_edges: (B, E, 2) int32, -1 padded."""
        B, N, _ = coords.shape

        # 1-2. coordinate MLP + 2D spatial sine PE
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="coord_mlp_0")(coords)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="coord_mlp_1")(h)
        h = h + coords_sine_embed(coords, self.hidden_dim // 2).astype(h.dtype)

        # 3. 1D sequence PE (which keypoint in the ordering)
        pe = interleaved_1d_table(self.max_seq_pe, self.hidden_dim)[:N]
        h = h + jnp.asarray(pe, dtype=h.dtype)

        # 4. optional GCN pre-encoding over the skeleton
        if self.use_gcn and skeleton_edges is not None:
            adj = adj_from_skeleton(N, skeleton_edges, mask)
            for i in range(self.num_gcn_layers):
                h = GCNLayer(self.hidden_dim, dtype=self.dtype,
                             name=f"gcn_{i}")(h, adj)

        # 5. transformer self-attention with key-padding mask
        for i in range(self.num_layers):
            h = TransformerEncoderLayer(
                self.hidden_dim, self.nhead, self.dim_feedforward,
                self.dropout, dtype=self.dtype, name=f"layer_{i}"
            )(h, key_padding_mask=mask, deterministic=deterministic)

        # zero out fully-masked samples (invalid data guard,
        # geometric_support_encoder.py:197-226)
        all_masked = mask.all(axis=1)
        return jnp.where(all_masked[:, None, None], 0.0, h)


class SupportPoseGraphEncoder(nn.Module):
    """Legacy support encoder (`models/support_encoder.py:8-133`), selected
    by the reference when `--use_geometric_encoder` is off: coordinate MLP +
    binary edge-presence embedding scaled by node degree / 10 + 1D PE +
    transformer + final LayerNorm.

    NOTE on mask polarity (reference quirk preserved in spirit, fixed in
    convention): the legacy encoder received the raw support mask
    (True = ignore) but inverted it before passing as key_padding_mask
    (`support_encoder.py:` `attn_mask = ~support_mask`), i.e. it attended
    to INVALID keypoints — a latent bug in the non-default path. Here the
    framework-wide convention (True = invalid = ignored) is applied
    consistently instead.
    """

    hidden_dim: int = 256
    num_layers: int = 3
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, mask, skeleton_edges=None, deterministic=True):
        """coords: (B, N, 2); mask: (B, N) True=invalid;
        skeleton_edges: (B, E, 2) int32, -1 padded, 0-indexed — the data
        layer normalizes COCO 1-indexed skeletons at load
        (`cape_tpu/data/coco.py:category_skeleton`), so unlike the
        reference's `support_encoder.py:_build_adjacency_matrix` no shift
        happens here (shifting again would corrupt every edge)."""
        from .graph import adj_from_skeleton
        from .position_encoding import interleaved_1d_table

        B, N, _ = coords.shape
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="coord_mlp_0")(coords)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="coord_mlp_1")(h)

        if skeleton_edges is not None:
            adj = adj_from_skeleton(N, skeleton_edges,
                                    jnp.zeros((B, N), bool))
            # binary adjacency (pre-normalization channel is row-normalized;
            # recover binary by > 0)
            binary = (adj[:, 1] > 0).astype(jnp.float32)
            degree = binary.sum(axis=2)
            has_conn = (degree > 0).astype(jnp.int32)
            edge_emb = nn.Embed(2, self.hidden_dim, dtype=self.dtype,
                                name="edge_embedding")(has_conn)
            scale = jnp.clip(degree, 1.0, None)[..., None] / 10.0
            combined = jnp.concatenate([h, edge_emb * scale.astype(h.dtype)],
                                       axis=-1)
            h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         name="coord_edge_proj")(combined)

        pe = interleaved_1d_table(max(N, 64), self.hidden_dim)[:N]
        h = h + jnp.asarray(pe, h.dtype)
        for i in range(self.num_layers):
            h = TransformerEncoderLayer(
                self.hidden_dim, self.nhead, self.dim_feedforward,
                self.dropout, dtype=self.dtype, name=f"layer_{i}"
            )(h, key_padding_mask=mask, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(h)
