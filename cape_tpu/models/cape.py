"""CAPE model: backbone -> deformable encoder -> support-conditioned causal
decoder, plus the fused autoregressive decode loop.

Composition parity with `models/roomformer_v2.py:149-693` +
`models/cape_model.py:9-229`, re-architected for TPU:

- one module, one parameter tree (the reference's wrapper injected support
  features via mutable decoder attributes and kept a trained-but-unused
  duplicate cross-attention stack — `cape_model.py:60-78`, dropped per
  SURVEY.md §7.5);
- fixed square images -> static level shapes, no NestedTensor masks;
- `autoregressive_decode` is a single `lax.scan` over `seq_len` steps with
  static KV caches and ON-DEVICE re-tokenization + token-type branching,
  replacing the reference's per-step host Python loop
  (`roomformer_v2.py:481-597`) — the reference's dominant inference cost
  (SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CAPEConfig
from ..data.tokenizer import DiscreteTokenizer
from ..data.token_types import TokenType
from .backbone import ResNet50
from .decoder import Decoder, LayerCache
from .deformable import DeformableEncoder
from .position_encoding import image_sine_pe_2d
from .support_encoder import GeometricSupportEncoder


def level_shapes(image_size: int, num_levels: int,
                 dilation: bool = False) -> Tuple[Tuple[int, int], ...]:
    """Static feature-map shapes: strides 8/16/32 (+64 for the extra level
    projected from layer4, `roomformer_v2.py:196-205`). DC5 dilation keeps
    layer4 at stride 16 (`backbone.py:77-84`), so the strides become
    8/16/16 (+32)."""
    strides = [8, 16, 16, 32] if dilation else [8, 16, 32, 64]
    return tuple((image_size // s, image_size // s)
                 for s in strides[:num_levels])


class CAPE(nn.Module):
    """Full category-agnostic pose estimation model."""

    cfg: CAPEConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        self.dtype = dtype
        # 'resnet50' is the production backbone; 'resnet_tiny' shrinks block
        # counts for fast unit tests while keeping the exact architecture.
        blocks = (1, 1, 1, 1) if cfg.backbone == "resnet_tiny" else (3, 4, 6, 3)
        self.backbone = ResNet50(input_channels=cfg.input_channels,
                                 dtype=dtype, block_counts=blocks,
                                 dilation=cfg.dilation)
        if cfg.support_fusion_method != "cross_attention":
            # The reference's 'concat'/'add' branches are dead code: they
            # define support_proj (`cape_model.py:54-56`) but never apply
            # it in forward — only cross_attention is wired.
            raise ValueError(
                f"support_fusion_method={cfg.support_fusion_method!r}: only "
                "'cross_attention' is functional (matches the reference)"
            )
        if cfg.position_embedding in ("learned", "v3"):
            # PositionEmbeddingLearned (`position_encoding.py:41-64`):
            # per-axis tables, pe = concat(col[x], row[y]); tables sized to
            # the largest feature level instead of the reference's fixed 50
            # so 512px inputs (stride-8 level = 64) are covered.
            max_hw = max(h for h, _ in level_shapes(
                cfg.image_size, cfg.num_feature_levels, cfg.dilation))
            init = nn.initializers.uniform(scale=1.0)
            self.row_embed = self.param(
                "row_embed", init, (max_hw, cfg.hidden_dim // 2))
            self.col_embed = self.param(
                "col_embed", init, (max_hw, cfg.hidden_dim // 2))
        elif cfg.position_embedding not in ("sine", "v2"):
            raise ValueError(
                f"position_embedding={cfg.position_embedding!r}: 'sine'/'v2' "
                "or 'learned'/'v3' (reference position_encoding.py:76-81)"
            )
        # 1x1 conv + GroupNorm(32) per backbone level; extra stride-2 3x3
        # level from layer4 (`roomformer_v2.py:186-214`)
        self.input_projs = [
            nn.Sequential([
                nn.Conv(cfg.hidden_dim, (1, 1), use_bias=True,
                        kernel_init=nn.initializers.xavier_uniform(),
                        dtype=dtype),
                nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype),
            ], name=f"input_proj_{i}")
            for i in range(3)
        ]
        self.input_proj_extra = nn.Sequential([
            nn.Conv(cfg.hidden_dim, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=True,
                    kernel_init=nn.initializers.xavier_uniform(), dtype=dtype),
            nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype),
        ], name="input_proj_3")
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (cfg.num_feature_levels, cfg.hidden_dim),
        )
        self.encoder = DeformableEncoder(
            num_layers=cfg.enc_layers, d_model=cfg.hidden_dim,
            d_ffn=cfg.dim_feedforward, dropout=cfg.dropout,
            n_levels=cfg.num_feature_levels, n_heads=cfg.nheads,
            n_points=cfg.enc_n_points, remat=cfg.use_remat_encoder,
            use_pallas=cfg.use_pallas_msda, dtype=dtype,
        )
        self.decoder = Decoder(
            num_layers=cfg.dec_layers, d_model=cfg.hidden_dim,
            d_ffn=cfg.dim_feedforward, dropout=cfg.dropout,
            n_levels=cfg.num_feature_levels, n_heads=cfg.nheads,
            n_points=cfg.dec_n_points, vocab_size=cfg.token_vocab_size,
            seq_len=cfg.seq_len, num_classes=cfg.num_token_classes,
            pad_id=cfg.num_bins * cfg.num_bins + 3,
            use_pallas=cfg.use_pallas_msda,
            layer_type=cfg.dec_layer_type,
            attn_concat_src=cfg.dec_attn_concat_src,
            qkv_proj=cfg.dec_qkv_proj,
            query_pos_type=cfg.query_pos_type,
            poly_refine=cfg.with_poly_refine, dtype=dtype,
        )
        if cfg.use_geometric_encoder:
            self.support_encoder = GeometricSupportEncoder(
                hidden_dim=cfg.hidden_dim,
                num_layers=cfg.support_encoder_layers,
                nhead=cfg.nheads, dim_feedforward=cfg.dim_feedforward,
                dropout=cfg.dropout, use_gcn=cfg.use_gcn_preenc,
                num_gcn_layers=cfg.num_gcn_layers,
                max_seq_pe=max(cfg.max_support_keypoints, 100), dtype=dtype,
            )
        else:
            # legacy encoder path (`cape_model.py:44-51`)
            from .support_encoder import SupportPoseGraphEncoder

            self.support_encoder = SupportPoseGraphEncoder(
                hidden_dim=cfg.hidden_dim,
                num_layers=cfg.support_encoder_layers,
                nhead=cfg.nheads, dim_feedforward=cfg.dim_feedforward,
                dropout=cfg.dropout, dtype=dtype,
            )

    # ------------------------------------------------------------------
    @property
    def spatial_shapes(self) -> Tuple[Tuple[int, int], ...]:
        return level_shapes(self.cfg.image_size, self.cfg.num_feature_levels,
                            self.cfg.dilation)

    def _level_pe(self, h: int, w: int) -> jnp.ndarray:
        """(h, w, D) positional encoding for one feature level."""
        if self.cfg.position_embedding in ("learned", "v3"):
            x_emb = self.col_embed[:w].astype(self.dtype)   # (w, D/2)
            y_emb = self.row_embed[:h].astype(self.dtype)   # (h, D/2)
            return jnp.concatenate([
                jnp.broadcast_to(x_emb[None, :, :], (h, w, x_emb.shape[-1])),
                jnp.broadcast_to(y_emb[:, None, :], (h, w, y_emb.shape[-1])),
            ], axis=-1)
        return jnp.asarray(
            image_sine_pe_2d(h, w, self.cfg.hidden_dim), self.dtype
        )

    def encode_image(self, images: jnp.ndarray,
                     deterministic: bool = True) -> jnp.ndarray:
        """(B, S, S, 3) uint8 or float32 -> (B, sum(Hl*Wl), D) memory.

        uint8 input is normalized ON DEVICE (float32 /255 + optional
        ImageNet mean/std — same op order as the host path in
        `data/mp100.py`, so the two are bit-identical); this lets the
        loader ship 4x fewer H2D bytes (`cfg.uint8_transfer`). float
        input is assumed host-normalized (reference behavior,
        `mp100_cape.py:437-444`).
        """
        cfg = self.cfg
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
            if cfg.image_norm:
                from ..data.mp100 import IMAGENET_MEAN, IMAGENET_STD
                images = (images - IMAGENET_MEAN) / IMAGENET_STD
        feats = self.backbone(images.astype(self.dtype))
        srcs = [self.input_projs[i](feats[i]) for i in range(3)]
        if cfg.num_feature_levels > 3:
            srcs.append(self.input_proj_extra(feats[-1]))
        return self.encode_features(srcs, deterministic=deterministic)

    def encode_features(self, srcs, deterministic: bool = True) -> jnp.ndarray:
        """Post-projection feature levels -> encoder memory.

        Args:
            srcs: list of (B, Hl, Wl, D) channel-last levels matching
                `spatial_shapes` (the outputs of the input projections,
                `roomformer_v2.py:306-327`). Split from `encode_image` so the
                full-stack parity oracle can feed both implementations
                identical post-proj features (backbone excluded).
        """
        flat, pos_flat = [], []
        for lvl, src in enumerate(srcs):
            b, h, w, d = src.shape
            pe = self._level_pe(h, w)
            lvl_pos = pe.reshape(1, h * w, d) + \
                self.level_embed[lvl].astype(self.dtype)
            flat.append(src.reshape(b, h * w, d))
            pos_flat.append(jnp.broadcast_to(lvl_pos, (b, h * w, d)))
        src_flat = jnp.concatenate(flat, axis=1)
        pos = jnp.concatenate(pos_flat, axis=1)
        return self.encoder(src_flat, pos, self.spatial_shapes,
                            deterministic=deterministic)

    def encode_support(self, coords, mask, skeleton_edges,
                       deterministic: bool = True) -> jnp.ndarray:
        return self.support_encoder(
            coords.astype(self.dtype), mask, skeleton_edges,
            deterministic=deterministic,
        )

    # ------------------------------------------------------------------
    def __call__(self, images, support_coords, support_mask, skeleton_edges,
                 targets: Dict[str, jnp.ndarray], deterministic: bool = True):
        """Teacher-forced training forward.

        Returns dict: pred_logits (B, L, 3), pred_coords (B, L, 2),
        aux_classes/aux_coords (num_layers-1, B, L, ...) when aux_loss.
        """
        memory = self.encode_image(images, deterministic=deterministic)
        support = self.encode_support(support_coords, support_mask,
                                      skeleton_edges,
                                      deterministic=deterministic)
        seq_kwargs = {
            k: targets[k] for k in (
                "seq11", "seq12", "seq21", "seq22",
                "delta_x1", "delta_x2", "delta_y1", "delta_y2",
            )
        }
        classes, refs = self.decoder.forward_train(
            seq_kwargs, memory, self.spatial_shapes, support, support_mask,
            deterministic=deterministic,
        )
        out = {
            "pred_logits": classes[-1].astype(jnp.float32),
            "pred_coords": refs[-1].astype(jnp.float32),
        }
        if self.cfg.aux_loss:
            out["aux_classes"] = classes[:-1].astype(jnp.float32)
            out["aux_coords"] = refs[:-1].astype(jnp.float32)
        return out

    # ------------------------------------------------------------------
    # decode-path methods (called via .apply(..., method=...) from
    # autoregressive_decode below)
    def decode_static(self, memory, support_features):
        return self.decoder.precompute_static(memory, support_features,
                                              self.spatial_shapes)

    def decode_step(self, token_inputs, pos_index, mem_values, support_kvs,
                    support_mask, caches):
        return self.decoder.forward_step(
            token_inputs, pos_index, mem_values, self.spatial_shapes,
            support_kvs, support_mask, caches,
        )


# ----------------------------------------------------------------------
def autoregressive_decode(
    model: CAPE,
    params,
    images: jnp.ndarray,
    support_coords: jnp.ndarray,
    support_mask: jnp.ndarray,
    skeleton_edges: jnp.ndarray,
    force_length: Optional[int] = None,
    encoded: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    max_len: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Fused on-device autoregressive generation.

    Replaces `RoomFormerV2.forward_inference` (`roomformer_v2.py:385-677`):
    encoder runs once (== enc_cache), then a `lax.while_loop` generates up
    to seq_len tokens with static KV caches, exiting as soon as every
    sample has emitted EOS (parity with the reference's
    `while i < max_len and unfinish_flag.any()`). The per-sample Python
    token-type branching (`:530-597`) becomes vectorized `jnp.where`
    selects; re-tokenization of predicted coordinates (floor/ceil corner
    ids + deltas, `:533-555`) happens on device. Output buffers are
    statically (B, seq_len, ...); steps never executed stay at their
    defaults (zero logits/coords, valid=False).

    Returns dict:
        pred_logits (B, L, 3) — per-step class-head logits
        pred_coords (B, L, 2) — per-step coordinates (clipped to [0,1])
        gen_valid   (B, L) bool — True where a coordinate was generated
        lengths     (B,) int32 — generated tokens incl. EOS
        unfinished  (B,) bool — True if a sample hit max_len without EOS

    `max_len` (static) caps generation below cfg.seq_len AND sizes the
    KV caches/output buffers to it: every decode step's self-attention
    runs over `max_len` cache slots instead of seq_len, so when the
    episode's keypoint count is known (the eval protocol always knows
    it — `engine_cape.py:743-798` extracts exactly K coords) a tight
    cap cuts per-step cost with bit-identical results for any episode
    that finishes within it (future slots are masked either way; only
    EOS-failure truncation behavior moves in, exactly like the
    reference's max_len). Outputs are padded back to (B, seq_len, ...)
    so the caller contract is unchanged.
    """
    cfg = model.cfg
    tok = DiscreteTokenizer(num_bins=cfg.num_bins, seq_len=cfg.seq_len)
    B = support_coords.shape[0]
    L = cfg.seq_len if max_len is None else min(int(max_len), cfg.seq_len)
    # NOTE: force_length may exceed L — generation then truncates at L
    # with unfinished=True, the reference's incomplete-generation
    # behavior (`roomformer_v2.py:608-621`), pinned by
    # test_68_keypoint_decode_overflows_short_seq.
    nb = cfg.num_bins

    if encoded is None:
        memory = model.apply(params, images, method=CAPE.encode_image)
        support = model.apply(params, support_coords, support_mask,
                              skeleton_edges, method=CAPE.encode_support)
    else:
        # precomputed (memory, support) — used by the full-stack parity
        # oracle to bypass the backbone and feed identical features
        memory, support = encoded
    mem_values, support_kvs = model.apply(params, memory, support,
                                          method=CAPE.decode_static)
    dtype = memory.dtype
    dh = cfg.hidden_dim // cfg.nheads
    z = jnp.zeros((B, cfg.nheads, L, dh), dtype)
    caches = [LayerCache(z, z) for _ in range(cfg.dec_layers)]

    # initial token state: BOS with deltas (0, 0) (`roomformer_v2.py:362-383`)
    def ids(v):
        return jnp.full((B, 1), v, jnp.int32)

    state = {
        "seq11": ids(tok.bos), "seq12": ids(tok.bos),
        "seq21": ids(tok.bos), "seq22": ids(tok.bos),
        "delta_x1": jnp.zeros((B, 1), jnp.float32),
        "delta_y1": jnp.zeros((B, 1), jnp.float32),
        "delta_x2": jnp.ones((B, 1), jnp.float32),
        "delta_y2": jnp.ones((B, 1), jnp.float32),
    }
    unfinished = jnp.ones((B,), bool)
    buffers = {
        "logits": jnp.zeros((B, L, 3), jnp.float32),
        "coords": jnp.zeros((B, L, 2), jnp.float32),
        "valid": jnp.zeros((B, L), bool),
        "active": jnp.zeros((B, L), bool),
    }

    def step(carry, i):
        state, caches, unfinished = carry
        logits, ref, caches = model.apply(
            params, state, i, mem_values, support_kvs, support_mask, caches,
            method=CAPE.decode_step,
        )
        logits = logits.astype(jnp.float32)   # (B, 1, 3)
        coords = ref.astype(jnp.float32)      # (B, 1, 2)
        cls = jnp.argmax(logits[:, 0], axis=-1)            # (B,)

        # token-type branching (`roomformer_v2.py:530-597`):
        # EOS before min_len is treated as a coordinate
        is_eos = (cls == TokenType.eos) & (i >= cfg.min_decode_len)
        if force_length is not None:
            # benchmark/debug knob: force every sample to generate exactly
            # force_length tokens regardless of predicted token types
            is_eos = (is_eos & False) | (i >= force_length - 1)
        is_coord = (cls == TokenType.coord) | (
            (cls == TokenType.eos) & (i < cfg.min_decode_len)
        )
        emit_coord = is_coord & unfinished

        xy = jnp.clip(coords[:, 0], 0.0, 1.0)              # (B, 2)
        q = xy * (nb - 1)
        xf = jnp.floor(q[:, 0]); yf = jnp.floor(q[:, 1])
        xc = jnp.ceil(q[:, 0]);  yc = jnp.ceil(q[:, 1])
        dx = (q[:, 0] - xf); dy = (q[:, 1] - yf)
        xf = xf.astype(jnp.int32); yf = yf.astype(jnp.int32)
        xc = xc.astype(jnp.int32); yc = yc.astype(jnp.int32)

        def pick(coord_id):
            """coord corner id if coord; sep/eos/pad specials otherwise."""
            special = jnp.where(is_eos, tok.eos, tok.sep)
            live = jnp.where(emit_coord, coord_id, special)
            return jnp.where(unfinished, live, tok.pad).astype(jnp.int32)

        new_state = {
            "seq11": pick(xf * nb + yf)[:, None],
            "seq12": pick(xf * nb + yc)[:, None],
            "seq21": pick(xc * nb + yf)[:, None],
            "seq22": pick(xc * nb + yc)[:, None],
        }
        d_x = jnp.where(emit_coord, dx, 0.0)
        d_y = jnp.where(emit_coord, dy, 0.0)
        new_state["delta_x1"] = d_x[:, None]
        new_state["delta_y1"] = d_y[:, None]
        new_state["delta_x2"] = (1.0 - d_x)[:, None]
        new_state["delta_y2"] = (1.0 - d_y)[:, None]

        new_unfinished = unfinished & ~is_eos
        ys = {
            "logits": logits[:, 0],
            "coords": xy,
            "valid": emit_coord,
            "active": unfinished,
        }
        return (new_state, caches, new_unfinished), ys

    def cond(carry):
        i, _, _, unfinished, _ = carry
        return (i < L) & jnp.any(unfinished)

    def body(carry):
        i, state, caches, unfinished, bufs = carry
        (state, caches, unfinished), ys = step((state, caches, unfinished), i)
        bufs = {
            k: jax.lax.dynamic_update_slice_in_dim(
                bufs[k], ys[k][:, None].astype(bufs[k].dtype), i, axis=1
            )
            for k in bufs
        }
        return (i + 1, state, caches, unfinished, bufs)

    _, _, _, unfinished, buffers = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), state, caches, unfinished,
                     buffers)
    )
    lengths = buffers["active"].sum(axis=1).astype(jnp.int32)
    pad = cfg.seq_len - L
    if pad:  # restore the (B, seq_len, ...) caller contract
        buffers = {k: jnp.pad(v, ((0, 0), (0, pad)) + ((0, 0),) * (v.ndim - 2))
                   for k, v in buffers.items()}
    return {
        "pred_logits": buffers["logits"],
        "pred_coords": buffers["coords"],
        "gen_valid": buffers["valid"],
        "lengths": lengths,
        "unfinished": unfinished,
    }
