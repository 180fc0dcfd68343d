"""Positional encodings (pure functions — computed at trace time).

Parity targets:
- `image_sine_pe_2d`: `PositionEmbeddingSine` with an all-valid mask
  (`models/position_encoding.py:8-40`). All images in this framework are
  resized to a fixed square, so the reference's cumsum-over-mask reduces to
  a deterministic function of (h, w) — no NestedTensor needed.
  (`models/deformable_transformer_v2.py:33-52`), [sin | cos] concatenated.
- `interleaved_1d_table`: support-encoder sequence PE
  (`models/positional_encoding.py:7-38`), sin/cos interleaved.
- `coords_sine_embed`: `SinePositionalEncoding2D.forward_coordinates`
  (`models/positional_encoding.py:39-94`), output = [pos_y | pos_x].
- `query_sine_embed`: decoder query PE from reference points
  (`models/deformable_transformer_v2.py:1006-1021`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def image_sine_pe_2d(h: int, w: int, d_model: int, temperature: float = 10000.0,
                     scale: float = 2 * math.pi) -> np.ndarray:
    """(h, w, d_model) sine PE for a fully-valid feature map."""
    num_pos_feats = d_model // 2
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    eps = 1e-6
    y_embed = (y_embed - 0.5) / (y_embed[-1:, :] + eps) * scale
    x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
                     ).reshape(h, w, num_pos_feats)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
                     ).reshape(h, w, num_pos_feats)
    return np.concatenate([pos_y, pos_x], axis=2)


def interleaved_1d_table(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) table, sin/cos interleaved (torch-tutorial style)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def coords_sine_embed(coords: jnp.ndarray, num_feats: int,
                      temperature: float = 10000.0,
                      scale: float = 2 * math.pi) -> jnp.ndarray:
    """Sine embedding of continuous (x, y) in [0,1].

    Args:
        coords: (..., 2) with (x, y) order.
    Returns:
        (..., 2*num_feats) = concat(pos_y, pos_x), each axis interleaving
        sin of even dims / cos of odd dims.
    """
    x = coords[..., 0] * scale
    y = coords[..., 1] * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t

    def inter(p):
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
                         ).reshape(*p.shape[:-1], num_feats)

    return jnp.concatenate([inter(py), inter(px)], axis=-1)


def query_sine_embed(ref_points: jnp.ndarray, num_pos_feats: int = 128,
                     temperature: float = 10000.0) -> jnp.ndarray:
    """Decoder query PE of reference points.

    Args:
        ref_points: (..., 2) in [0,1].
    Returns:
        (..., 2*num_pos_feats), coordinate-major layout matching
        `get_query_pos_embed` (`deformable_transformer_v2.py:1006-1021`).
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos = (ref_points * scale)[..., None] / dim_t  # (..., 2, F)
    out = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
    return out.reshape(*ref_points.shape[:-1], 2 * num_pos_feats)
