"""Weight-transplant parity for decoder variants v2-v6 vs the reference.

Oracles the experimental decoder layers
(`models/deformable_transformer_v2.py:373-948`) the same way
`test_torch_parity.py` oracles the v1 layer: build the torch module
read-only, transplant every weight into the flax module, assert outputs
agree. These layers are dead code in the reference (its decoder loop
passes support kwargs their forwards do not accept, `dtv2:1085-1091`), so
each is exercised standalone exactly as written.

v41's prefix uses the layout-FIXED sampler (see
`cape_tpu/models/deformable_points.py` docstring); its oracle monkeypatches
the reference's `point_sampler` with the same fix, keeping the rest of the
reference layer untouched.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import ref_modules
from test_torch_parity import dense, layer_norm, mha, msda_params, t2n

torch.manual_seed(0)

D, HEADS, LEVELS, POINTS, FFN = 32, 4, 2, 2, 64
L = 5                                  # token sequence length
SHAPES = ((4, 4), (2, 2))              # -> S = 20 memory tokens
S = sum(h * w for h, w in SHAPES)
B = 2


def fixture():
    rng = np.random.default_rng(7)
    tgt = rng.normal(size=(B, L, D)).astype(np.float32)
    query_pos = rng.normal(size=(B, L, D)).astype(np.float32)
    refpts = rng.uniform(0.1, 0.9, (B, L, LEVELS, 2)).astype(np.float32)
    src = rng.normal(size=(B, S, D)).astype(np.float32)
    causal = np.where(np.triu(np.ones((L, L), np.float32), 1) > 0,
                      -1e9, 0.0).astype(np.float32)
    return tgt, query_pos, refpts, src, causal


def torch_level_args():
    shapes_t = torch.as_tensor(SHAPES, dtype=torch.long)
    level_start = torch.cat(
        [shapes_t.new_zeros(1),
         (shapes_t[:, 0] * shapes_t[:, 1]).cumsum(0)[:-1]]
    )
    return shapes_t, level_start


def ffn_params(ref):
    return {"linear1": dense(ref.linear1), "linear2": dense(ref.linear2),
            "norm3": layer_norm(ref.norm3)}


def run_ref(ref, tgt, query_pos, refpts, src, causal, concat=False):
    shapes_t, level_start = torch_level_args()
    with torch.no_grad():
        out, src_out = ref(
            torch.from_numpy(tgt), torch.from_numpy(query_pos),
            torch.from_numpy(refpts), torch.from_numpy(src),
            shapes_t, level_start, None,
            tgt_masks=torch.from_numpy(causal), attn_concat_src=concat,
        )
    return t2n(out), (None if src_out is None else t2n(src_out))


# ---------------------------------------------------------------------------
class TestV2Parity:
    def test_forward(self):
        dtv2 = ref_modules.dtv2()
        from cape_tpu.models.decoder_variants import DecoderLayerV2

        torch.manual_seed(21)
        ref = dtv2.TransformerDecoderLayerV2(
            d_model=D, d_ffn=FFN, dropout=0.0, activation="relu",
            n_levels=LEVELS, n_heads=HEADS, n_points=POINTS,
        ).eval()
        tgt, query_pos, refpts, src, causal = fixture()
        ref_out, _ = run_ref(ref, tgt, query_pos, refpts, src, causal)

        params = {
            "cross_attn": msda_params(ref.cross_attn),
            "norm1": layer_norm(ref.norm1),
            "self_attn": mha(ref.self_attn),
            "norm2": layer_norm(ref.norm2),
            "ffn": ffn_params(ref),
        }
        ours = DecoderLayerV2(D, FFN, 0.0, LEVELS, HEADS, POINTS).apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(query_pos),
            jnp.asarray(refpts), jnp.asarray(src), SHAPES,
            jnp.asarray(causal),
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
def bix_block_params(block):
    """Reference BiXAttnBlock -> our BiXAttnBlock param tree
    (`bixattn.py:85-138`; fused rv projections split into r/v halves)."""
    a = block.attn
    rv_lat = t2n(a.rv_latents.weight)          # (2D, D)
    rv_pat = t2n(a.rv_patches.weight)
    return {
        "LayerNorm_0": layer_norm(block.norm1_lat),
        "LayerNorm_1": layer_norm(block.norm1_pat),
        "BiXAttn_0": {
            "q_x": {"kernel": rv_lat[:D].T},
            "v_x": {"kernel": rv_lat[D:].T},
            "k_y": {"kernel": rv_pat[:D].T},
            "v_y": {"kernel": rv_pat[D:].T},
            "proj_x": dense(a.proj_lat),
            "proj_y": dense(a.proj_pat),
        },
        "LayerNorm_2": layer_norm(block.norm2_lat),
        "mlp_x_fc1": dense(block.mlp_lat.fc1),
        "mlp_x_fc2": dense(block.mlp_lat.fc2),
        "LayerNorm_3": layer_norm(block.norm2_pat),
        "mlp_y_fc1": dense(block.mlp_pat.fc1),
        "mlp_y_fc2": dense(block.mlp_pat.fc2),
    }


def ca_block_params(block):
    """Reference CAOneSidedBlock -> our CAOneSidedBlock param tree
    (`bixattn.py:182-235`; r/rv projections mapped onto the MHA's split
    q/k/v with zero biases — rv_bias=False in the reference)."""
    a = block.attn
    rv_pat = t2n(a.rv_patches.weight)
    zero = np.zeros(D, np.float32)
    return {
        "LayerNorm_0": layer_norm(block.norm1_lat),
        "LayerNorm_1": layer_norm(block.norm1_pat),
        "MultiHeadAttention_0": {
            "q_proj": {"kernel": t2n(a.r_latents.weight).T, "bias": zero},
            "k_proj": {"kernel": rv_pat[:D].T, "bias": zero},
            "v_proj": {"kernel": rv_pat[D:].T, "bias": zero},
            "out_proj": dense(a.proj_lat),
        },
        "LayerNorm_2": layer_norm(block.norm2_lat),
        "Dense_0": dense(block.mlp_lat.fc1),
        "Dense_1": dense(block.mlp_lat.fc2),
    }


class TestV3Parity:
    @pytest.mark.parametrize("is_last", [False, True])
    def test_forward(self, is_last):
        dtv2 = ref_modules.dtv2()
        from cape_tpu.models.decoder_variants import DecoderLayerV3

        torch.manual_seed(31 + is_last)
        ref = dtv2.TransformerDecoderLayerV3(
            d_model=D, d_ffn=FFN, dropout=0.0, activation="relu",
            n_levels=LEVELS, n_heads=HEADS, n_points=POINTS,
            is_last_layer=is_last,
        ).eval()
        tgt, query_pos, refpts, src, causal = fixture()
        ref_out, ref_src = run_ref(ref, tgt, query_pos, refpts, src, causal)

        params = {
            "self_attn": mha(ref.self_attn),
            "norm2": layer_norm(ref.norm2),
            "cross_attn": (ca_block_params(ref.cross_attn) if is_last
                           else bix_block_params(ref.cross_attn)),
            "ffn": ffn_params(ref),
        }
        ours, ours_src = DecoderLayerV3(
            D, FFN, 0.0, HEADS, is_last=is_last,
        ).apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(query_pos),
            jnp.asarray(refpts), jnp.asarray(src), SHAPES,
            jnp.asarray(causal),
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-4, atol=1e-5)
        if is_last:
            # one-sided block leaves the memory unchanged (dtv2:1092-1093
            # keeps the old src when the layer returns None)
            np.testing.assert_allclose(np.asarray(ours_src), src, atol=0)
            assert ref_src is None
        else:
            np.testing.assert_allclose(np.asarray(ours_src), ref_src,
                                       rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
def vc_common_params(ref):
    return {
        "self_attn": mha(ref.self_attn),
        "norm2": layer_norm(ref.norm2),
        "cross_attn": msda_params(ref.cross_attn),
        "norm1": layer_norm(ref.norm1),
        "ffn": ffn_params(ref),
    }


def make_vc(variant):
    from cape_tpu.models.decoder_variants import DecoderLayerVC

    return DecoderLayerVC(variant=variant, d_model=D, d_ffn=FFN,
                          dropout=0.0, n_levels=LEVELS, n_heads=HEADS,
                          n_points=POINTS, attn_concat_src=True,
                          use_qkv_proj=False)


class TestV5V6Parity:
    @pytest.mark.parametrize("version", ["v5", "v6"])
    def test_forward(self, version):
        dtv2 = ref_modules.dtv2()

        torch.manual_seed(51)
        cls = (dtv2.TransformerDecoderLayerV5 if version == "v5"
               else dtv2.TransformerDecoderLayerV6)
        ref = cls(d_model=D, d_ffn=FFN, dropout=0.0, activation="relu",
                  n_levels=LEVELS, n_heads=HEADS, n_points=POINTS,
                  use_qkv_proj=False).eval()
        tgt, query_pos, refpts, src, causal = fixture()
        ref_out, _ = run_ref(ref, tgt, query_pos, refpts, src, causal,
                             concat=True)

        ours = make_vc(version).apply(
            {"params": vc_common_params(ref)}, jnp.asarray(tgt),
            jnp.asarray(query_pos), jnp.asarray(refpts), jnp.asarray(src),
            SHAPES, jnp.asarray(causal),
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-4, atol=1e-5)


class TestV4Parity:
    def test_forward(self):
        dtv2 = ref_modules.dtv2()

        torch.manual_seed(41)
        ref = dtv2.TransformerDecoderLayerV4(
            d_model=D, d_ffn=FFN, dropout=0.0, activation="relu",
            n_levels=LEVELS, n_heads=HEADS, n_points=POINTS,
            use_qkv_proj=False,
        ).eval()
        # the sampler heads are zero-initialized (`dtv2:637-649`);
        # perturb them so the oracle is not degenerate (uniform weights,
        # query-independent offsets)
        with torch.no_grad():
            ref.sampling_offsets.weight.normal_(0, 0.5)
            ref.attention_weights.weight.normal_(0, 0.5)
            ref.attention_weights.bias.normal_(0, 0.1)
        tgt, query_pos, refpts, src, causal = fixture()
        ref_out, _ = run_ref(ref, tgt, query_pos, refpts, src, causal,
                             concat=True)

        params = vc_common_params(ref)
        params["sampling_offsets"] = dense(ref.sampling_offsets)
        params["attention_weights"] = dense(ref.attention_weights)
        params["source_proj"] = dense(ref.source_proj)
        ours = make_vc("v4").apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(query_pos),
            jnp.asarray(refpts), jnp.asarray(src), SHAPES,
            jnp.asarray(causal),
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-4, atol=1e-5)


class TestV41Parity:
    def test_forward(self):
        dtv2 = ref_modules.dtv2()
        ref_modules.install_reference()
        import einops
        import torch.nn.functional as F

        torch.manual_seed(411)
        ref = dtv2.TransformerDecoderLayerV41(
            d_model=D, d_ffn=FFN, dropout=0.0, activation="relu",
            n_levels=LEVELS, n_heads=HEADS, n_points=POINTS,
            use_qkv_proj=False,
        ).eval()
        sampler = ref.point_sampler

        def fixed_sampler(x, spatial_shapes, level_start_index=None):
            """Reference sampler with its value-layout bug fixed (split the
            channels-last memory per head with the proper rearrange — see
            `cape_tpu/models/deformable_points.py` docstring)."""
            outs, start = [], 0
            for i, (H, W) in enumerate(SHAPES):
                cur = x[:, start:start + H * W]
                start += H * W
                q = sampler.proj_q[i](einops.rearrange(
                    cur, "b (h w) c -> b c h w", h=H, w=W))
                q_off = einops.rearrange(
                    q, "b (g c) h w -> (b g) c h w", g=HEADS)
                offset = sampler.conv_offset[i](q_off)
                hk, wk = offset.shape[2], offset.shape[3]
                offset = einops.rearrange(offset, "b two h w -> b h w two")
                refpts = sampler._get_ref_points(hk, wk, B, torch.float32,
                                                 offset.device)
                pos = (offset + refpts).clamp(-1.0, 1.0)
                vg = einops.rearrange(
                    cur, "b (h w) (g c) -> (b g) c h w", h=H, w=W, g=HEADS)
                samp = F.grid_sample(vg, pos[..., (1, 0)], mode="bilinear",
                                     align_corners=True)
                outs.append(einops.rearrange(
                    samp, "(b g) c hk wk -> b (hk wk) (g c)", b=B))
            return torch.cat(outs, dim=1)

        del ref.point_sampler          # torch only allows Module children;
        ref.point_sampler = fixed_sampler  # plain attr after the delete
        tgt, query_pos, refpts, src, causal = fixture()
        ref_out, _ = run_ref(ref, tgt, query_pos, refpts, src, causal,
                             concat=True)

        mod = make_vc("v41")
        init = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(query_pos),
            jnp.asarray(refpts), jnp.asarray(src), SHAPES,
            jnp.asarray(causal),
        )
        params = jax.tree_util.tree_map(np.asarray, init)["params"]
        params.update(vc_common_params(ref))
        ps = params["point_sampler"]
        for i in range(LEVELS):
            q = sampler.proj_q[i]
            ps[f"proj_q_{i}"]["kernel"] = t2n(q.weight.permute(2, 3, 1, 0))
            ps[f"proj_q_{i}"]["bias"] = t2n(q.bias)
            ca = sampler.conv_offset[i][0]
            ps[f"conv_offset_a_{i}"]["kernel"] = t2n(
                ca.weight.permute(2, 3, 1, 0))
            ps[f"conv_offset_a_{i}"]["bias"] = t2n(ca.bias)
            ln = sampler.conv_offset[i][1].norm
            ps[f"offset_norm_{i}"]["scale"] = t2n(ln.weight)
            ps[f"offset_norm_{i}"]["bias"] = t2n(ln.bias)
            cb = sampler.conv_offset[i][3]
            ps[f"conv_offset_b_{i}"]["kernel"] = t2n(
                cb.weight.permute(2, 3, 1, 0))
        ours = mod.apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(query_pos),
            jnp.asarray(refpts), jnp.asarray(src), SHAPES,
            jnp.asarray(causal),
        )
        # atol 2e-3 for the same reason as TestDeformablePointsParity:
        # conv accumulation-order noise near bilinear cell boundaries
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
class TestVariantDecoderStack:
    """The Decoder drives every variant through the shared refinement /
    class-head loop (`dtv2:1072-1126`), and the decode path rejects
    non-v1 loudly."""

    @pytest.mark.parametrize("layer_type",
                             ["v2", "v3", "v4", "v41", "v5", "v6"])
    def test_forward_train_and_decode_guard(self, layer_type):
        from cape_tpu.models.decoder import Decoder

        dec = Decoder(num_layers=2, d_model=D, d_ffn=FFN, dropout=0.0,
                      n_levels=LEVELS, n_heads=HEADS, n_points=POINTS,
                      vocab_size=50, seq_len=L, pad_id=49,
                      layer_type=layer_type)
        rng = np.random.default_rng(3)
        seq_kwargs = {
            k: jnp.asarray(rng.integers(0, 50, (B, L)), jnp.int32)
            for k in ("seq11", "seq12", "seq21", "seq22")
        }
        seq_kwargs.update({
            k: jnp.asarray(rng.uniform(0, 1, (B, L)), jnp.float32)
            for k in ("delta_x1", "delta_x2", "delta_y1", "delta_y2")
        })
        memory = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
        support = jnp.asarray(rng.normal(size=(B, 3, D)), jnp.float32)
        smask = jnp.zeros((B, 3), bool)

        variables = dec.init(
            jax.random.PRNGKey(0), seq_kwargs, memory, SHAPES,
            support, smask, method=Decoder.forward_train,
        )
        classes, refs = dec.apply(
            variables, seq_kwargs, memory, SHAPES, support, smask,
            method=Decoder.forward_train,
        )
        assert classes.shape == (2, B, L, 3)
        assert refs.shape == (2, B, L, 2)
        assert np.isfinite(np.asarray(classes)).all()
        assert np.isfinite(np.asarray(refs)).all()

        with pytest.raises(ValueError, match="layer_type='v1'"):
            dec.apply(variables, memory, support, SHAPES,
                      method=Decoder.precompute_static)
