"""Graph adjacency + geometric support encoder tests (ports the invariants
of the reference `tests/test_graph_utils.py` and
`tests/test_geometric_support_encoder.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cape_tpu.models.graph import GCNLayer, adj_from_skeleton
from cape_tpu.models.support_encoder import GeometricSupportEncoder


def edges_array(edge_list, E=8):
    out = np.full((1, E, 2), -1, np.int32)
    if edge_list:
        out[0, : len(edge_list)] = edge_list
    return jnp.asarray(out)


class TestAdjacency:
    def test_symmetry_and_normalization(self):
        edges = edges_array([[0, 1], [1, 2], [2, 0]])
        mask = jnp.zeros((1, 3), bool)
        adj = np.asarray(adj_from_skeleton(3, edges, mask))
        assert adj.shape == (1, 2, 3, 3)
        nb = adj[0, 1]
        np.testing.assert_allclose(nb, nb.T, atol=1e-6)
        np.testing.assert_allclose(nb.sum(-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(adj[0, 0], np.eye(3), atol=1e-6)

    def test_out_of_range_edges_filtered(self):
        edges = edges_array([[0, 1], [5, 6], [-1, -1]])
        mask = jnp.zeros((1, 3), bool)
        adj = np.asarray(adj_from_skeleton(3, edges, mask))
        # only edge (0,1) survives
        assert adj[0, 1, 0, 1] == 1.0 and adj[0, 1, 1, 0] == 1.0
        assert adj[0, 1, 2].sum() == 0.0

    def test_masked_keypoints_zeroed(self):
        edges = edges_array([[0, 1], [1, 2]])
        mask = jnp.asarray([[False, True, False]])
        adj = np.asarray(adj_from_skeleton(3, edges, mask))
        assert adj[0, 1, :, 1].sum() == 0 and adj[0, 1, 1, :].sum() == 0
        assert adj[0, 0, 1, 1] == 0.0  # masked self-loop removed

    def test_matches_reference_semantics_oracle(self):
        """Dense-math oracle computed independently in numpy."""
        rng = np.random.default_rng(0)
        N, E = 6, 10
        el = rng.integers(0, N, (E, 2)).tolist()
        mask = rng.uniform(size=(1, N)) > 0.7
        ours = np.asarray(adj_from_skeleton(N, edges_array(el, E),
                                            jnp.asarray(mask)))
        a = np.zeros((N, N))
        for i, j in el:
            a[i, j] = 1
        a = np.maximum(a, a.T)
        keep = ~mask[0]
        a = a * keep[:, None] * keep[None, :]
        s = a.sum(-1, keepdims=True)
        a = np.divide(a, s, out=np.zeros_like(a), where=s > 0)
        np.testing.assert_allclose(ours[0, 1], a, atol=1e-6)
        np.testing.assert_allclose(ours[0, 0], np.diag(keep.astype(float)),
                                   atol=1e-6)


class TestGCN:
    def test_shapes_and_grad(self):
        layer = GCNLayer(out_features=16)
        x = jnp.ones((2, 5, 8))
        adj = jnp.ones((2, 2, 5, 5)) / 5
        params = layer.init(jax.random.PRNGKey(0), x, adj)
        out = layer.apply(params, x, adj)
        assert out.shape == (2, 5, 16)

        def f(p):
            return layer.apply(p, x, adj).sum()

        g = jax.grad(f)(params)
        assert all(np.isfinite(np.asarray(v)).all()
                   for v in jax.tree_util.tree_leaves(g))


class TestSupportEncoder:
    def setup_method(self):
        self.enc = GeometricSupportEncoder(
            hidden_dim=32, num_layers=1, nhead=4, dim_feedforward=64,
            dropout=0.0, use_gcn=True, num_gcn_layers=1,
        )
        rng = np.random.default_rng(0)
        self.coords = jnp.asarray(rng.uniform(size=(2, 6, 2)), jnp.float32)
        self.mask = jnp.zeros((2, 6), bool).at[:, 4:].set(True)
        self.edges = jnp.asarray(
            np.tile(np.array([[[0, 1], [1, 2], [2, 3]]], np.int32), (2, 1, 1))
        )
        self.params = self.enc.init(jax.random.PRNGKey(0), self.coords,
                                    self.mask, self.edges)

    def test_output_shape(self):
        out = self.enc.apply(self.params, self.coords, self.mask, self.edges)
        assert out.shape == (2, 6, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_masked_keys_do_not_affect_valid_outputs(self):
        out1 = self.enc.apply(self.params, self.coords, self.mask, self.edges)
        coords2 = self.coords.at[:, 4:].set(0.999)  # only masked slots change
        out2 = self.enc.apply(self.params, coords2, self.mask, self.edges)
        np.testing.assert_allclose(
            np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5
        )

    def test_all_masked_sample_returns_zeros(self):
        mask = jnp.ones((2, 6), bool).at[1].set(False)
        out = self.enc.apply(self.params, self.coords, mask, self.edges)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)
        assert np.abs(np.asarray(out[1])).sum() > 0

    def test_keypoint_order_matters(self):
        """1D sequence PE must break permutation invariance."""
        out1 = self.enc.apply(self.params, self.coords, self.mask, self.edges)
        perm = jnp.asarray([1, 0, 2, 3, 4, 5])
        out2 = self.enc.apply(self.params, self.coords[:, perm], self.mask,
                              self.edges)
        assert not np.allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 1]),
                               atol=1e-4)


class TestLegacyEncoderEdgeIndexing:
    """Regression for the round-2 code-review finding: the legacy
    SupportPoseGraphEncoder must NOT re-shift skeleton edges — the data
    layer already normalizes COCO 1-indexed skeletons to 0-indexed
    (`cape_tpu/data/coco.py:category_skeleton`). A second shift turned
    edge (0,1) into a self-loop and disconnected the chain's last node."""

    def test_chain_connectivity_drives_edge_embedding(self):
        import jax
        import jax.numpy as jnp

        from cape_tpu.models.support_encoder import SupportPoseGraphEncoder

        enc = SupportPoseGraphEncoder(hidden_dim=32, num_layers=1, nhead=4,
                                      dim_feedforward=64, dropout=0.0)
        B, N = 1, 5
        coords = np.random.default_rng(0).uniform(size=(B, N, 2)).astype(np.float32)
        mask = np.zeros((B, N), bool)
        # 0-indexed chain over nodes 0..3; node 4 isolated
        edges = np.full((B, 4, 2), -1, np.int32)
        edges[0, :3] = [[0, 1], [1, 2], [2, 3]]
        params = enc.init(jax.random.PRNGKey(0), coords, mask, edges)

        from cape_tpu.models.graph import adj_from_skeleton

        adj = np.asarray(adj_from_skeleton(N, jnp.asarray(edges),
                                           jnp.zeros((B, N), bool)))
        binary = adj[0, 1] > 0
        # chain end-points have 1 neighbor, middles 2, isolated node 0
        np.testing.assert_array_equal(binary.sum(1), [1, 2, 2, 1, 0])
        # the encoder runs and is finite with the same edges
        out = enc.apply(params, coords, mask, edges)
        assert np.isfinite(np.asarray(out)).all()

    def test_cape_forward_with_legacy_encoder(self):
        import jax

        from cape_tpu.config import tiny_test_config
        from cape_tpu.models import CAPE
        from test_config_knobs import _batch

        cfg = tiny_test_config(use_geometric_encoder=False)
        model = CAPE(cfg)
        imgs, sc, sm, se, targets = _batch(cfg, batch=1, seed=0)
        params = model.init(jax.random.PRNGKey(0), imgs, sc, sm, se, targets)
        out = model.apply(params, imgs, sc, sm, se, targets)
        assert np.isfinite(np.asarray(out["pred_coords"])).all()
