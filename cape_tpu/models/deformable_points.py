"""MSDeformablePoints — learned content-based sampling of encoder memory.

TPU-native counterpart of `models/deformable_points.py:31-130` (the sampler
behind the reference's experimental decoder variant v41, SURVEY.md §2.2):
per feature level, a grouped conv head predicts a coarse grid of 2D offsets
from the (1x1-projected) features; the features are then bilinearly sampled
at `reference + offset` per attention head and the per-level sample grids
are concatenated into a compact token set (e.g. K/V for cross-attention).

Differences from the torch original (all mechanical, none semantic):
- NHWC layout end to end (flax convention; torch is NCHW);
- `grid_sample(align_corners=True)` is an explicit gather+blend
  (`_bilinear_sample`) instead of a framework op;
- heads are the conv group dimension exactly as in the reference
  (`feature_group_count=n_heads`).

Reference quirk NOT replicated (SURVEY.md §7.5 policy): the original feeds
`grid_sample` a raw `cur_x.reshape(B*heads, hc, H, W)` of the
channels-LAST `(B, H*W, C)` memory (`deformable_points.py:126`), which
reinterprets feature channels as spatial positions — the sampled "values"
are scrambled. Here the value tensor is split per head properly (the same
einops rearrange the module itself uses for the offset branch). The parity
test oracles against the reference weights with this one layout fix
applied (`tests/test_torch_parity.py::TestDeformablePointsParity`).

Kept out of the flagship CAPE path (v1 decoder), same as the reference —
v41 never shipped for CAPE (`deformable_transformer_v2.py:728-811` is
incompatible with support conditioning). Provided for inventory parity and
as a building block for sparse-memory decoding experiments.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _bilinear_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample (B, H, W, C) at normalized grid (B, Hk, Wk, 2) in [-1, 1]
    (x, y order), align_corners=True semantics (torch `F.grid_sample`)."""
    B, H, W, C = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    flat = img.reshape(B, H * W, C)

    def take(yy, xx):
        idx = yy * W + xx                       # (B, Hk, Wk)
        return jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(*idx.shape, C)

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


class MSDeformablePoints(nn.Module):
    """Per-level learned sampling grids (reference
    `deformable_points.py:31-130`)."""

    embed_dim: int
    n_levels: int
    n_heads: int
    offset_range_factor: float = -1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hc = self.embed_dim // self.n_heads
        ks = [(self.n_levels - 1 - i) * 2 + 1 for i in range(self.n_levels)]
        st = [2 ** (self.n_levels - i) for i in range(self.n_levels)]
        self.kernel_sizes, self.strides_ = ks, st
        self.proj_q = [
            nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    name=f"proj_q_{i}")
            for i in range(self.n_levels)
        ]
        # grouped offset conv: heads are the group dim; depthwise-style
        # conv + LN + GELU + 1x1 -> 2 offset channels per head-position
        self.conv_offset_a = [
            nn.Conv(hc, (ks[i], ks[i]), strides=(st[i], st[i]),
                    padding=ks[i] // 2, feature_group_count=self.n_heads
                    if hc % self.n_heads == 0 else 1,
                    dtype=self.dtype, name=f"conv_offset_a_{i}")
            for i in range(self.n_levels)
        ]
        self.offset_norm = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"offset_norm_{i}")
            for i in range(self.n_levels)
        ]
        self.conv_offset_b = [
            nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"conv_offset_b_{i}")
            for i in range(self.n_levels)
        ]

    @staticmethod
    def _ref_points(hk: int, wk: int) -> jnp.ndarray:
        """(Hk, Wk, 2) normalized (y, x) reference grid in [-1, 1]
        (reference `_get_ref_points`)."""
        ys = (jnp.linspace(0.5, hk - 0.5, hk) / hk) * 2.0 - 1.0
        xs = (jnp.linspace(0.5, wk - 0.5, wk) / wk) * 2.0 - 1.0
        ry, rx = jnp.meshgrid(ys, xs, indexing="ij")
        return jnp.stack([ry, rx], axis=-1)

    def __call__(self, x: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        """x: (B, sum(Hl*Wl), C) flattened multi-level features ->
        (B, sum(Hk*Wk), C) sampled tokens."""
        B, _, C = x.shape
        hc = self.embed_dim // self.n_heads
        splits, start = [], 0
        for (H, W) in spatial_shapes:
            splits.append((start, H, W))
            start += H * W

        outs = []
        for i, (off, H, W) in enumerate(splits):
            cur = x[:, off: off + H * W].reshape(B, H, W, C)
            q = self.proj_q[i](cur)                       # (B, H, W, C)
            # (B*g, H, W, hc): per-head offset prediction
            qg = q.reshape(B, H, W, self.n_heads, hc)
            qg = jnp.moveaxis(qg, 3, 1).reshape(B * self.n_heads, H, W, hc)
            o = self.conv_offset_a[i](qg)
            # exact (erf) GELU — torch nn.GELU default; flax defaults to
            # the tanh approximation
            o = nn.gelu(self.offset_norm[i](o), approximate=False)
            offset = self.conv_offset_b[i](o)             # (B*g, Hk, Wk, 2)
            hk, wk = offset.shape[1], offset.shape[2]
            if self.offset_range_factor >= 0:
                rng = jnp.asarray([1.0 / hk, 1.0 / wk], offset.dtype)
                offset = jnp.tanh(offset) * rng * self.offset_range_factor
            ref = self._ref_points(hk, wk).astype(offset.dtype)
            pos = offset + ref[None]
            if self.offset_range_factor < 0:
                pos = jnp.clip(pos, -1.0, 1.0)            # (y, x)
            # sample per head: grid wants (x, y)
            grid = pos[..., ::-1]
            vg = cur.reshape(B, H, W, self.n_heads, hc)
            vg = jnp.moveaxis(vg, 3, 1).reshape(B * self.n_heads, H, W, hc)
            samp = _bilinear_sample(vg, grid)             # (B*g, hk, wk, hc)
            samp = samp.reshape(B, self.n_heads, hk * wk, hc)
            samp = jnp.moveaxis(samp, 1, 2).reshape(B, hk * wk, C)
            outs.append(samp)
        return jnp.concatenate(outs, axis=1)
