"""Reference-checkpoint import (cape_tpu/utils/torch_import.py).

Builds the reference CAPE stack at tiny dims (read-only import via
ref_modules, like the parity suites), lays its live tensors out as the
exact state-dict the reference trainer saves
(`base_model.transformer.* / base_model.class_embed.* /
support_encoder.*` — `scripts/eval_cape_checkpoint.py:175-223`), and
checks the importer reproduces the weight-transplant mapping leaf by
leaf, rejects wrong architectures loudly, and round-trips through the
CLI (`scripts/import_torch_checkpoint.py`) into an orbax checkpoint a
fresh TrainState can restore.
"""

import argparse
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

import ref_modules
from test_torch_parity import t2n

from cape_tpu.config import tiny_test_config
from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
from cape_tpu.models.cape import CAPE
from cape_tpu.utils.torch_import import (
    CheckpointImportError,
    config_from_reference_args,
    import_reference_state_dict,
)

D, HEADS, FFN, LAYERS = 64, 4, 128, 2


def _tiny_cfg():
    return tiny_test_config(remat_encoder=False)


class _RefMLP(nn.Module):
    def __init__(self, d, out):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(d, d), nn.Linear(d, d), nn.Linear(d, out)])


def _build_reference_tiny(cfg):
    torch.manual_seed(3)
    ref_modules.install_reference()
    m = ref_modules.dtv2()
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    tr = m.DeformableTransformer(
        d_model=D, nhead=HEADS, num_encoder_layers=LAYERS,
        num_decoder_layers=LAYERS, dim_feedforward=FFN, dropout=0.0,
        poly_refine=True, return_intermediate_dec=True, aux_loss=True,
        num_feature_levels=cfg.num_feature_levels,
        dec_n_points=cfg.dec_n_points, enc_n_points=cfg.enc_n_points,
        query_pos_type="sine", vocab_size=tok.vocab_size,
        seq_len=cfg.seq_len, dec_layer_type="v1", pad_idx=tok.pad)
    tr.decoder.class_embed = nn.ModuleList(
        [nn.Linear(D, 3) for _ in range(LAYERS)])
    tr.decoder.coords_embed = nn.ModuleList(
        [_RefMLP(D, 2) for _ in range(LAYERS)])
    query_embed = nn.Embedding(cfg.seq_len, 2)
    g = ref_modules.geometric_support_encoder()
    sup = g.GeometricSupportEncoder(
        hidden_dim=D, num_encoder_layers=cfg.support_encoder_layers,
        nhead=HEADS, dim_feedforward=FFN, dropout=0.0,
        use_gcn_preenc=True, num_gcn_layers=cfg.num_gcn_layers)
    return tr, query_embed, sup


def _init_variables(cfg):
    model = CAPE(cfg)
    rng = np.random.default_rng(0)
    S, K, E = cfg.image_size, cfg.max_support_keypoints, cfg.max_skeleton_edges
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    t = tokenize_keypoints(tok, rng.uniform(5, S - 5, (6, 2)), S, S)
    return model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, S, S, 3), np.float32),
        np.zeros((1, K, 2), np.float32),
        np.zeros((1, K), bool),
        np.full((1, E, 2), -1, np.int32),
        {k: np.stack([v]) for k, v in t.items()},
    )


def _reference_layout_sd(cfg, tr, query_embed, sup, variables):
    """Lay the live tensors out exactly as CAPEModel.state_dict() does."""
    sd = {}
    for k, v in tr.state_dict().items():
        sd[f"base_model.transformer.{k}"] = t2n(v)
    # the wrapper aliases the per-layer heads at base_model level too
    # (`roomformer_v2.py:246-247`); the importer reads the base_model copy
    for i in range(LAYERS):
        for k, v in tr.decoder.class_embed[i].state_dict().items():
            sd[f"base_model.class_embed.{i}.{k}"] = t2n(v)
        for k, v in tr.decoder.coords_embed[i].state_dict().items():
            sd[f"base_model.coords_embed.{i}.{k}"] = t2n(v)
    sd["base_model.query_embed.weight"] = t2n(query_embed.weight)
    for k, v in sup.state_dict().items():
        sd[f"support_encoder.{k}"] = t2n(v)
    # input projections: fabricate from the initialized tree shapes
    # (the parity stacks bypass them; real checkpoints carry them)
    rng = np.random.default_rng(5)
    p = jax.tree_util.tree_map(np.asarray, variables)["params"]
    for i in range(cfg.num_feature_levels):
        hwio = p[f"input_proj_{i}"]["layers_0"]["kernel"]
        sd[f"base_model.input_proj.{i}.0.weight"] = rng.normal(
            0, 0.02, hwio.shape).astype(np.float32).transpose(3, 2, 0, 1)
        sd[f"base_model.input_proj.{i}.0.bias"] = rng.normal(
            0, 0.02, hwio.shape[-1]).astype(np.float32)
        sd[f"base_model.input_proj.{i}.1.weight"] = np.ones(
            hwio.shape[-1], np.float32)
        sd[f"base_model.input_proj.{i}.1.bias"] = np.zeros(
            hwio.shape[-1], np.float32)
    # the reference's trained-but-dead tensors must be ignored
    sd["support_cross_attention_layers.0.in_proj_weight"] = np.zeros(
        (3 * D, D), np.float32)
    sd["support_attn_layer_norms.0.weight"] = np.ones(D, np.float32)
    return sd


@pytest.fixture(scope="module")
def imported():
    cfg = _tiny_cfg()
    tr, query_embed, sup = _build_reference_tiny(cfg)
    variables = _init_variables(cfg)
    sd = _reference_layout_sd(cfg, tr, query_embed, sup, variables)
    out = import_reference_state_dict(sd, variables, cfg)
    return dict(cfg=cfg, tr=tr, query_embed=query_embed, sup=sup,
                variables=variables, sd=sd, params=out["params"])


def test_transformer_leaves_match(imported):
    p, tr = imported["params"], imported["tr"]
    el0 = tr.encoder.layers[0]
    np.testing.assert_array_equal(
        p["encoder"]["layer_0"]["self_attn"]["sampling_offsets"]["kernel"],
        t2n(el0.self_attn.sampling_offsets.weight).T)
    np.testing.assert_array_equal(
        p["encoder"]["layer_1"]["norm2"]["scale"],
        t2n(tr.encoder.layers[1].norm2.weight))
    np.testing.assert_array_equal(
        p["level_embed"], t2n(tr.level_embed))

    d = p["decoder"]
    np.testing.assert_array_equal(
        d["token_embed"]["embedding"], t2n(tr.decoder.token_embed.weight))
    np.testing.assert_array_equal(
        d["query_embed"], t2n(imported["query_embed"].weight))
    dl0 = tr.decoder.layers[0]
    # torch MHA in_proj split into q/k/v
    np.testing.assert_array_equal(
        d["layer_0"]["self_attn"]["q_proj"]["kernel"],
        t2n(dl0.self_attn.in_proj_weight)[:D].T)
    np.testing.assert_array_equal(
        d["layer_0"]["self_attn"]["v_proj"]["bias"],
        t2n(dl0.self_attn.in_proj_bias)[2 * D:])
    # attn_q is bias-free in the reference (dtv2:277-279)
    assert "bias" not in d["layer_0"]["attn_q"]
    np.testing.assert_array_equal(
        d["class_head_1"]["kernel"],
        t2n(tr.decoder.class_embed[1].weight).T)
    np.testing.assert_array_equal(
        d["coords_head_0"]["Dense_2"]["bias"],
        t2n(tr.decoder.coords_embed[0].layers[2].bias))


def test_support_and_proj_leaves_match(imported):
    p, sup, sd = imported["params"], imported["sup"], imported["sd"]
    s = p["support_encoder"]
    np.testing.assert_array_equal(
        s["coord_mlp_0"]["kernel"], t2n(sup.coord_mlp[0].weight).T)
    np.testing.assert_array_equal(
        s["gcn_0"]["Dense_0"]["kernel"],
        t2n(sup.gcn_layers[0].conv.weight)[:, :, 0].T)
    np.testing.assert_array_equal(
        s["layer_0"]["Dense_1"]["bias"],
        t2n(sup.transformer_encoder.layers[0].linear2.bias))
    # input projections: OIHW -> HWIO round trip
    got = p["input_proj_2"]["layers_0"]["kernel"]
    want = sd["base_model.input_proj.2.0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


def test_missing_key_raises_with_key_name(imported):
    sd = dict(imported["sd"])
    del sd["base_model.query_embed.weight"]
    with pytest.raises(CheckpointImportError, match="query_embed"):
        import_reference_state_dict(sd, imported["variables"],
                                    imported["cfg"])


def test_shape_mismatch_raises(imported):
    sd = dict(imported["sd"])
    sd["base_model.query_embed.weight"] = np.zeros((7, 2), np.float32)
    with pytest.raises(CheckpointImportError, match="shape mismatch"):
        import_reference_state_dict(sd, imported["variables"],
                                    imported["cfg"])


def test_non_v1_layer_type_rejected(imported):
    cfg = imported["cfg"].replace(dec_layer_type="v3")
    with pytest.raises(CheckpointImportError, match="v1"):
        import_reference_state_dict(imported["sd"], imported["variables"],
                                    cfg)


def test_config_from_reference_args():
    args = dict(hidden_dim=64, nheads=4, enc_layers=2, dec_layers=2,
                dim_feedforward=128, dropout=0.1, seq_len=24,
                vocab_size=100, support_encoder_layers=1, num_gcn_layers=1,
                lr=1e-4, irrelevant_flag="ignored", job_dir="/content/x")
    cfg = config_from_reference_args(args, image_size=64,
                                     backbone="resnet_tiny")
    assert cfg.hidden_dim == 64 and cfg.seq_len == 24
    assert cfg.support_encoder_layers == 1 and cfg.lr == 1e-4
    assert cfg.image_size == 64 and cfg.backbone == "resnet_tiny"


@pytest.mark.slow
def test_cli_roundtrip(tmp_path, imported):
    """torch.save a reference-format checkpoint, run the import CLI, and
    restore the result into a fresh TrainState."""
    cfg = imported["cfg"]
    ckpt = {
        "model": {k: torch.from_numpy(np.array(v))
                  for k, v in imported["sd"].items()},
        "args": argparse.Namespace(
            hidden_dim=D, nheads=HEADS, enc_layers=LAYERS, dec_layers=LAYERS,
            dim_feedforward=FFN, dropout=0.0, seq_len=cfg.seq_len,
            vocab_size=cfg.vocab_size,
            support_encoder_layers=cfg.support_encoder_layers,
            num_gcn_layers=cfg.num_gcn_layers),
        "epoch": 7,
        "best_pck": 0.4321,
    }
    pth = tmp_path / "checkpoint_best.pth"
    torch.save(ckpt, pth)
    out_dir = tmp_path / "imported"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "import_torch_checkpoint.py"),
         "--torch_checkpoint", str(pth), "--output_dir", str(out_dir),
         "--set", "image_size=64", "--set", "backbone=resnet_tiny",
         "--set", "max_support_keypoints=12", "--set", "min_decode_len=2",
         "--set", "bf16=false"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    ckpt_dir = out_dir / "epoch_7"
    assert ckpt_dir.is_dir(), res.stdout

    meta = json.loads((ckpt_dir / "meta.json").read_text())
    assert meta["epoch"] == 7 and meta["best_pck"] == 0.4321
    assert meta["config"]["hidden_dim"] == D
    assert meta["extra"]["imported_from"].endswith("checkpoint_best.pth")

    # restore into a fresh TrainState and spot-check a transplanted leaf
    from cape_tpu.config import CAPEConfig
    from cape_tpu.train import create_train_state
    from cape_tpu.utils.checkpoint import CheckpointManager

    rcfg = CAPEConfig(**meta["config"])
    variables = _init_variables(rcfg)
    target = create_train_state(rcfg, variables, steps_per_epoch=1)
    mgr = CheckpointManager(str(out_dir))
    state, meta2 = mgr.restore(str(ckpt_dir), target)
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["token_embed"]["embedding"]),
        imported["sd"]["base_model.transformer.decoder.token_embed.weight"])


def test_legacy_support_encoder_import(imported):
    """Checkpoints trained with --use_geometric_encoder off carry a
    SupportPoseGraphEncoder (`support_encoder.py:8-52`); the importer maps
    it onto cape_tpu's legacy module and rejects a mismatched config."""
    ref_modules.install_reference()
    from models import support_encoder as legacy_mod

    torch.manual_seed(11)
    cfg = _tiny_cfg().replace(use_geometric_encoder=False)
    sup = legacy_mod.SupportPoseGraphEncoder(
        hidden_dim=D, nheads=HEADS,
        num_encoder_layers=cfg.support_encoder_layers,
        dim_feedforward=FFN, dropout=0.0)

    sd = {k: v for k, v in imported["sd"].items()
          if not k.startswith("support_encoder.")}
    for k, v in sup.state_dict().items():
        sd[f"support_encoder.{k}"] = t2n(v)

    variables = _init_variables(cfg)
    out = import_reference_state_dict(sd, variables, cfg)
    s = out["params"]["support_encoder"]
    np.testing.assert_array_equal(
        s["coord_mlp_0"]["kernel"], t2n(sup.coord_embedding[0].weight).T)
    np.testing.assert_array_equal(
        s["edge_embedding"]["embedding"], t2n(sup.edge_embedding.weight))
    np.testing.assert_array_equal(
        s["coord_edge_proj"]["bias"], t2n(sup.coord_edge_proj.bias))
    np.testing.assert_array_equal(
        s["final_norm"]["scale"], t2n(sup.norm.weight))
    np.testing.assert_array_equal(
        s["layer_0"]["MultiHeadAttention_0"]["q_proj"]["kernel"],
        t2n(sup.transformer_encoder.layers[0].self_attn.in_proj_weight)[:D].T)

    # encoder-kind / config mismatch is caught before any key lookup fails
    with pytest.raises(CheckpointImportError, match="use_geometric_encoder"):
        import_reference_state_dict(sd, imported["variables"],
                                    imported["cfg"])
