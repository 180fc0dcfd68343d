"""Skeleton-graph utilities — vectorized, fixed-shape, jit-friendly.

TPU re-design of `models/graph_utils.py`: the reference builds adjacency
matrices in a per-batch Python loop from ragged edge lists
(`graph_utils.py:15-80`); here edges arrive as a static-shape (B, E, 2)
int32 array padded with -1 and the whole batch adjacency is one scatter.
Semantics preserved: symmetrization, out-of-range edge filtering,
visibility masking, row normalization, dual-channel [self-loops, neighbors]
stacking, and the GCN layer's dual-channel einsum aggregation
(`graph_utils.py:83-186`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def adj_from_skeleton(
    num_pts: int,
    edges: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Build the dual-channel normalized adjacency.

    Args:
        num_pts: static number of (padded) keypoints N.
        edges: (B, E, 2) int32 edge list, -1-padded. Edges with any index
            outside [0, N) are ignored (parity with `graph_utils.py:54-63`).
        mask: (B, N) boolean, True = invalid/invisible keypoint.

    Returns:
        (B, 2, N, N): channel 0 = diag(~mask), channel 1 = row-normalized
        symmetric adjacency with masked rows/cols zeroed.
    """
    B, E, _ = edges.shape
    e0, e1 = edges[..., 0], edges[..., 1]
    valid = (e0 >= 0) & (e0 < num_pts) & (e1 >= 0) & (e1 < num_pts)
    e0c = jnp.clip(e0, 0, num_pts - 1)
    e1c = jnp.clip(e1, 0, num_pts - 1)

    adj = jnp.zeros((B, num_pts, num_pts), jnp.float32)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, E))
    adj = adj.at[b_idx, e0c, e1c].max(valid.astype(jnp.float32))
    adj = jnp.maximum(adj, jnp.swapaxes(adj, 1, 2))  # symmetric (undirected)

    keep = (~mask).astype(jnp.float32)
    adj = adj * keep[:, :, None] * keep[:, None, :]

    row_sum = adj.sum(axis=-1, keepdims=True)
    adj = jnp.where(row_sum > 0, adj / jnp.where(row_sum > 0, row_sum, 1.0), 0.0)

    self_loops = jnp.zeros_like(adj).at[
        :, jnp.arange(num_pts), jnp.arange(num_pts)
    ].set(keep)
    return jnp.stack([self_loops, adj], axis=1)


class GCNLayer(nn.Module):
    """Dual-channel graph convolution (`graph_utils.py:83-186`).

    The reference's Conv1d(k=1) expanding features x kernel_size is a Dense
    to 2*out_features followed by per-channel aggregation over the adjacency.
    """

    out_features: int
    kernel_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        """x: (B, N, C), adj: (B, K, N, N) -> (B, N, out_features)."""
        assert adj.shape[1] == self.kernel_size
        h = nn.Dense(self.out_features * self.kernel_size, dtype=self.dtype)(x)
        B, N, _ = h.shape
        h = h.reshape(B, N, self.kernel_size, self.out_features)
        h = h.transpose(0, 2, 1, 3)  # (B, K, N, C_out)
        # out[w] = sum_k sum_v h[k, v] * adj[k, v, w]  (graph_utils.py:166)
        out = jnp.einsum("bkvc,bkvw->bwc", h, adj.astype(h.dtype))
        return nn.relu(out)
