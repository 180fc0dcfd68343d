"""Import reference (PyTorch) CAPE checkpoints into cape_tpu.

The reference trains `CAPEModel(base_model=RoomFormerV2)` and saves
`{'model': state_dict, 'args': Namespace, 'epoch', 'best_pck'}`
(`scripts/eval_cape_checkpoint.py:175-223`). A user switching to cape_tpu
keeps those trained weights: this module maps every live tensor of the
reference state dict onto the `CAPE` param tree —

    base_model.backbone.0.body.*      -> backbone (BN folded to affine)
    base_model.input_proj.{i}.{0,1}.* -> input_proj_{i} (conv + GroupNorm)
    base_model.transformer.*          -> level_embed / encoder / decoder
    base_model.{class,coords}_embed.* -> decoder per-layer heads
    base_model.query_embed.weight     -> decoder anchor table
    support_encoder.*                 -> geometric support encoder, or the
                                         legacy SupportPoseGraphEncoder when
                                         the checkpoint was trained with
                                         --use_geometric_encoder off

and drops, by design, the reference's trained-but-unused tensors
(`support_cross_attention_layers` / `support_attn_layer_norms` /
`support_proj` — defined in `cape_model.py:54-75` but never applied in
forward; SURVEY.md §7.5).

The numerical layout transforms (weight transposes, in_proj splits,
Conv1d->Dense, BN folding) are the exact mappings proven by the
weight-transplant parity suites (`tests/test_torch_parity.py`,
`tests/test_fullstack_parity.py`): teacher-forced per-layer outputs and
full autoregressive decodes match the reference bit-for-bit-modulo-fp
after this conversion.

This module is torch-free: it consumes a `{key: np.ndarray}` dict (the
CLI, `scripts/import_torch_checkpoint.py`, does the `torch.load` and
tensor->numpy conversion).
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import jax
import numpy as np

from ..config import CAPEConfig


class CheckpointImportError(ValueError):
    """A reference key is missing or shaped wrong for the target config."""


# ---------------------------------------------------------------------------
# leaf converters (numpy mirrors of tests/test_torch_parity.py helpers)
# ---------------------------------------------------------------------------
def _dense(sd, key):
    out = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T)}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _mha(sd, key, d):
    """torch.nn.MultiheadAttention -> cape_tpu MultiHeadAttention."""
    w, b = sd[f"{key}.in_proj_weight"], sd[f"{key}.in_proj_bias"]
    return {
        "q_proj": {"kernel": np.ascontiguousarray(w[:d].T), "bias": b[:d]},
        "k_proj": {"kernel": np.ascontiguousarray(w[d:2 * d].T),
                   "bias": b[d:2 * d]},
        "v_proj": {"kernel": np.ascontiguousarray(w[2 * d:].T),
                   "bias": b[2 * d:]},
        "out_proj": _dense(sd, f"{key}.out_proj"),
    }


def _msda(sd, key):
    return {
        "sampling_offsets": _dense(sd, f"{key}.sampling_offsets"),
        "attention_weights": _dense(sd, f"{key}.attention_weights"),
        "value_proj": _dense(sd, f"{key}.value_proj"),
        "output_proj": _dense(sd, f"{key}.output_proj"),
    }


def _gcn(sd, key):
    """GCNLayer Conv1d(in, out*k, 1) -> Dense(in -> out*k)."""
    w = sd[f"{key}.conv.weight"][:, :, 0]  # (out*k, in)
    return {"Dense_0": {"kernel": np.ascontiguousarray(w.T),
                        "bias": sd[f"{key}.conv.bias"]}}


def _conv2d(sd, key):
    """Conv2d OIHW -> flax HWIO."""
    out = {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _gn(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _subdict(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
def config_from_reference_args(args: Dict[str, Any], **overrides) -> CAPEConfig:
    """Build a CAPEConfig from the reference's pickled `args` Namespace
    (passed as a plain dict). Only architecture-relevant fields transfer;
    anything absent keeps the cape_tpu default; kwargs win over both."""
    field_map = [
        "hidden_dim", "nheads", "enc_layers", "dec_layers",
        "dim_feedforward", "dropout", "num_feature_levels",
        "dec_n_points", "enc_n_points", "seq_len", "vocab_size",
        "image_size", "num_gcn_layers", "use_gcn_preenc",
        "support_encoder_layers", "aux_loss", "lr", "lr_backbone",
        "label_smoothing", "eos_weight",
    ]
    kw = {}
    for f in field_map:
        if f in args and args[f] is not None:
            kw[f] = args[f]
    if args.get("dec_layer_type"):
        kw["dec_layer_type"] = args["dec_layer_type"]
    kw.update(overrides)
    return CAPEConfig(**kw)


def import_reference_state_dict(
    sd: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    cfg: CAPEConfig,
) -> Dict[str, Any]:
    """Map a reference CAPEModel state dict onto a freshly-initialized
    CAPE variables tree; returns a new `{"params": ...}` tree.

    Raises CheckpointImportError with the offending reference key on any missing
    tensor or shape mismatch.
    """
    if cfg.dec_layer_type != "v1":
        raise CheckpointImportError(
            f"dec_layer_type={cfg.dec_layer_type!r}: checkpoint import "
            "supports the CAPE-shipped v1 decoder layer (the reference's "
            "v2-v6 experiments are teacher-forced-only and were never the "
            "released protocol)"
        )
    p = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables)["params"]
    )
    tr = "base_model.transformer"

    try:
        # ---- backbone (BN stats folded into frozen affines) -----------
        bsd = _subdict(sd, "base_model.backbone.0.body.")
        if bsd:
            from ..models.backbone import load_torch_resnet50_state

            p["backbone"] = load_torch_resnet50_state(p["backbone"], bsd)

        # ---- input projections ----------------------------------------
        for i in range(cfg.num_feature_levels):
            proj = p[f"input_proj_{i}"]
            proj["layers_0"] = _conv2d(sd, f"base_model.input_proj.{i}.0")
            proj["layers_1"] = _gn(sd, f"base_model.input_proj.{i}.1")

        # ---- encoder ----------------------------------------------------
        p["level_embed"] = sd[f"{tr}.level_embed"]
        for i in range(cfg.enc_layers):
            el = f"{tr}.encoder.layers.{i}"
            p["encoder"][f"layer_{i}"] = {
                "self_attn": _msda(sd, f"{el}.self_attn"),
                "norm1": _ln(sd, f"{el}.norm1"),
                "Dense_0": _dense(sd, f"{el}.linear1"),
                "Dense_1": _dense(sd, f"{el}.linear2"),
                "norm2": _ln(sd, f"{el}.norm2"),
            }

        # ---- decoder ----------------------------------------------------
        d = p["decoder"]
        dec = f"{tr}.decoder"
        d["token_embed"]["embedding"] = sd[f"{dec}.token_embed.weight"]
        d["query_embed"] = sd["base_model.query_embed.weight"]
        d["pos_trans"] = _dense(sd, f"{dec}.pos_trans")
        d["pos_trans_norm"] = _ln(sd, f"{dec}.pos_trans_norm")
        D = cfg.hidden_dim
        for i in range(cfg.dec_layers):
            dl = f"{dec}.layers.{i}"
            d[f"layer_{i}"] = {
                "attn_q": _dense(sd, f"{dl}.attn_q"),
                "attn_k": _dense(sd, f"{dl}.attn_k"),
                "attn_v": _dense(sd, f"{dl}.attn_v"),
                "self_attn": _mha(sd, f"{dl}.self_attn", D),
                "norm2": _ln(sd, f"{dl}.norm2"),
                "support_attn": _mha(sd, f"{dl}.support_attn", D),
                "norm_support": _ln(sd, f"{dl}.norm_support"),
                "cross_attn": _msda(sd, f"{dl}.cross_attn"),
                "norm1": _ln(sd, f"{dl}.norm1"),
                "linear1": _dense(sd, f"{dl}.linear1"),
                "linear2": _dense(sd, f"{dl}.linear2"),
                "norm3": _ln(sd, f"{dl}.norm3"),
            }
            # per-layer heads: stored twice in the reference state dict
            # (base_model.class_embed.N and transformer.decoder.class_embed.N
            # alias the same tensors); read the base_model copy
            d[f"class_head_{i}"] = _dense(sd, f"base_model.class_embed.{i}")
            d[f"coords_head_{i}"] = {
                f"Dense_{j}": _dense(
                    sd, f"base_model.coords_embed.{i}.layers.{j}")
                for j in range(3)
            }

        # ---- support encoder (geometric default / legacy graph) ----------
        s = p["support_encoder"]
        legacy = "support_encoder.coord_embedding.0.weight" in sd
        if legacy != (not cfg.use_geometric_encoder):
            want = "false" if legacy else "true"
            raise CheckpointImportError(
                "checkpoint carries a "
                f"{'SupportPoseGraphEncoder' if legacy else 'GeometricSupportEncoder'}"
                f" but config has use_geometric_encoder={cfg.use_geometric_encoder}"
                f" — pass --set use_geometric_encoder={want}"
            )
        if legacy:
            # SupportPoseGraphEncoder (`support_encoder.py:8-52`): coord MLP
            # + edge-presence embedding + projection + final norm
            s["coord_mlp_0"] = _dense(sd, "support_encoder.coord_embedding.0")
            s["coord_mlp_1"] = _dense(sd, "support_encoder.coord_embedding.2")
            s["edge_embedding"] = {
                "embedding": sd["support_encoder.edge_embedding.weight"]}
            s["coord_edge_proj"] = _dense(sd, "support_encoder.coord_edge_proj")
            s["final_norm"] = _ln(sd, "support_encoder.norm")
        else:
            s["coord_mlp_0"] = _dense(sd, "support_encoder.coord_mlp.0")
            s["coord_mlp_1"] = _dense(sd, "support_encoder.coord_mlp.2")
            if cfg.use_gcn_preenc:
                for i in range(cfg.num_gcn_layers):
                    s[f"gcn_{i}"] = _gcn(sd, f"support_encoder.gcn_layers.{i}")
        for i in range(cfg.support_encoder_layers):
            sl = f"support_encoder.transformer_encoder.layers.{i}"
            s[f"layer_{i}"] = {
                "MultiHeadAttention_0": _mha(sd, f"{sl}.self_attn", D),
                "LayerNorm_0": _ln(sd, f"{sl}.norm1"),
                "Dense_0": _dense(sd, f"{sl}.linear1"),
                "Dense_1": _dense(sd, f"{sl}.linear2"),
                "LayerNorm_1": _ln(sd, f"{sl}.norm2"),
            }
    except KeyError as e:
        raise CheckpointImportError(
            f"reference checkpoint is missing key {e.args[0]!r} — wrong "
            "architecture args for this checkpoint?"
        ) from None

    # shape audit against the initialized tree (catches silent config
    # mismatches before orbax ever sees the params)
    ref = jax.tree_util.tree_map(np.asarray, variables)["params"]
    flat_new = _flatten(p)
    flat_ref = _flatten(ref)
    for k, v in flat_ref.items():
        if k not in flat_new:
            raise CheckpointImportError(f"converted tree lost param {k}")
        if tuple(flat_new[k].shape) != tuple(v.shape):
            raise CheckpointImportError(
                f"shape mismatch at {k}: checkpoint {flat_new[k].shape} "
                f"vs model {v.shape} — config does not match checkpoint"
            )
    return {"params": p}


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out
