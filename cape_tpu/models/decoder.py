"""Causal token decoder with support cross-attention and deformable image
cross-attention, plus iterative coordinate refinement.

Flax re-design of the reference's v1 decoder layer and decoder
(`models/deformable_transformer_v2.py:262-370, 951-1131`) — the only
CAPE-complete variant (SURVEY.md §2.2). Two execution paths share one
parameter set:

- `forward_train`: full teacher-forced sequence with a causal mask.
- `forward_step`: one token with static-shape KV caches — used inside the
  `lax.scan` autoregressive decode (`cape_tpu.models.cape`). Keys/values of
  the *static* attention inputs (support features, encoder memory) are
  projected once via `precompute_*` methods instead of per step.

Semantics preserved per layer (`deformable_transformer_v2.py:320-370`):
pre-projections attn_q/k/v (no bias) -> causal self-attention (+query_pos
on q only) -> support cross-attention with key-padding mask -> deformable
cross-attention at the refined reference point (+query_pos) -> FFN; post-LN
residuals throughout. Refinement: ref = sigmoid(offset + inv_sigmoid(ref))
per layer (`:1096-1102`), anchors = sigmoid(learned query_embed)
(`roomformer_v2.py:241-244`).
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import MultiHeadAttention
from .decoder_variants import DecoderLayerV2, DecoderLayerV3, DecoderLayerVC
from .deformable import MSDeformAttn
from .position_encoding import query_sine_embed

#: decoder-layer variants (`deformable_transformer_v2.py:76-115` dispatch).
#: v1 is the flagship CAPE layer; v2-v6 are the reference's experimental,
#: support-free layers (see `decoder_variants.py`).
LAYER_TYPES = ("v1", "v2", "v3", "v4", "v41", "v5", "v6")


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parity with `util/misc.py:436-440`."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


class MLPHead(nn.Module):
    """3-layer MLP coords head (`roomformer_v2.py:956-968` MLP), zero-init
    final layer (`roomformer_v2.py:223-224`)."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        return nn.Dense(
            self.out_dim, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
        )(x)


class LayerCache(NamedTuple):
    """Static-shape self-attention KV cache for one decoder layer."""

    k: jnp.ndarray  # (B, H, L, Dh)
    v: jnp.ndarray  # (B, H, L, Dh)


class DecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    use_pallas: bool = False
    # extra q/k/v pre-projections before self-attention; the reference
    # builds Identity instead when disabled (`dtv2:276-282`)
    qkv_proj: bool = True
    # prepend the raw encoder memory to self-attention K/V
    # (`--dec_attn_concat_src`, `dtv2:333-337`); teacher-forced path only
    concat_src: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.qkv_proj:
            no_bias = dict(use_bias=False, dtype=self.dtype)
            self.attn_q = nn.Dense(self.d_model, **no_bias)
            self.attn_k = nn.Dense(self.d_model, **no_bias)
            self.attn_v = nn.Dense(self.d_model, **no_bias)
        else:
            self.attn_q = self.attn_k = self.attn_v = lambda x: x
        self.self_attn = MultiHeadAttention(self.d_model, self.n_heads,
                                            self.dropout, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.support_attn = MultiHeadAttention(self.d_model, self.n_heads,
                                               self.dropout, dtype=self.dtype)
        self.norm_support = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.cross_attn = MSDeformAttn(self.d_model, self.n_levels,
                                       self.n_heads, self.n_points,
                                       use_pallas=self.use_pallas,
                                       dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.linear1 = nn.Dense(self.d_ffn, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    # -- static-input projections (decode-time caching) ----------------
    def support_kv(self, support_features):
        return self.support_attn.project_kv(support_features)

    def memory_value(self, memory):
        return self.cross_attn.project_value(memory)

    def _ffn(self, x, deterministic):
        y = self.drop(nn.relu(self.linear1(x)), deterministic=deterministic)
        y = self.linear2(y)
        return self.norm3(x + self.drop(y, deterministic=deterministic))

    def memory_quads(self, memory, spatial_shapes):
        return self.cross_attn.project_value_quads(memory, spatial_shapes)

    def _post_self(self, tgt, memory_value, spatial_shapes, query_pos,
                   reference_points, support_k, support_v, support_mask,
                   deterministic, prequad=False):
        """Support cross-attn + deformable cross-attn + FFN (shared).

        prequad=True: `memory_value` is the (B*H, S', 4*Dh) quad slab
        from `memory_quads` (the KV-cached decode step)."""
        s2 = self.support_attn.attend(
            tgt, support_k, support_v, key_padding_mask=support_mask,
            deterministic=deterministic,
        )
        tgt = self.norm_support(tgt + self.drop(s2, deterministic=deterministic))
        if prequad:
            c2 = self.cross_attn.step_call(
                tgt + query_pos, reference_points, memory_value,
                spatial_shapes
            )
        else:
            c2 = self.cross_attn(
                tgt + query_pos, reference_points, memory_value,
                spatial_shapes
            )
        tgt = self.norm1(tgt + self.drop(c2, deterministic=deterministic))
        return self._ffn(tgt, deterministic)

    # -- full-sequence (teacher forcing) --------------------------------
    def forward_train(
        self,
        tgt: jnp.ndarray,                 # (B, L, D)
        query_pos: jnp.ndarray,           # (B, L, D)
        reference_points: jnp.ndarray,    # (B, L, n_levels, 2)
        memory: jnp.ndarray,              # (B, S, D)
        spatial_shapes: Sequence[Tuple[int, int]],
        causal_mask: jnp.ndarray,         # (L, L) additive float
        support_features: jnp.ndarray,    # (B, N, D)
        support_mask: jnp.ndarray,        # (B, N) True = ignore
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = self.attn_q(tgt) + query_pos
        k_in, v_in = self.attn_k(tgt), self.attn_v(tgt)
        if self.concat_src:
            # reference concatenates the RAW memory before the attention's
            # own input projections (`dtv2:333-337`), prefix always
            # attendable
            k_in = jnp.concatenate([memory, k_in], axis=1)
            v_in = jnp.concatenate([memory, v_in], axis=1)
            causal_mask = jnp.concatenate(
                [jnp.zeros((causal_mask.shape[0], memory.shape[1]),
                           causal_mask.dtype), causal_mask], axis=1)
        k, v = self.self_attn.project_kv_pre(k_in, v_in)
        t2 = self.self_attn.attend(q, k, v, attn_mask=causal_mask,
                                   deterministic=deterministic)
        tgt = self.norm2(tgt + self.drop(t2, deterministic=deterministic))
        sk, sv = self.support_kv(support_features)
        return self._post_self(
            tgt, self.memory_value(memory), spatial_shapes, query_pos,
            reference_points, sk, sv, support_mask, deterministic,
        )

    # -- single step with KV cache ---------------------------------------
    def forward_step(
        self,
        tgt_t: jnp.ndarray,               # (B, 1, D)
        query_pos_t: jnp.ndarray,         # (B, 1, D)
        reference_points_t: jnp.ndarray,  # (B, 1, n_levels, 2)
        memory_quads: jnp.ndarray,        # (B*H, S', 4*Dh) quad slab, or
        #                                   (B, S, H, Dh) plain value cache
        #                                   (CAPE_DECODE_PREQUAD=0)
        spatial_shapes: Sequence[Tuple[int, int]],
        cache: LayerCache,
        pos_index: jnp.ndarray,           # scalar int32 current position
        support_k: jnp.ndarray,
        support_v: jnp.ndarray,
        support_mask: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, LayerCache]:
        q = self.attn_q(tgt_t) + query_pos_t
        k_t, v_t = self.self_attn.project_kv_pre(
            self.attn_k(tgt_t), self.attn_v(tgt_t)
        )  # (B, H, 1, Dh)
        k = jax.lax.dynamic_update_slice_in_dim(cache.k, k_t, pos_index, axis=2)
        v = jax.lax.dynamic_update_slice_in_dim(cache.v, v_t, pos_index, axis=2)
        # mask future (unwritten) cache slots
        L = k.shape[2]
        future = jnp.arange(L)[None, :] > pos_index  # (1, L)
        t2 = self.self_attn.attend(q, k, v, attn_mask=future[None, :, :])
        tgt = self.norm2(tgt_t + t2)
        out = self._post_self(
            tgt, memory_quads, spatial_shapes, query_pos_t,
            reference_points_t, support_k, support_v, support_mask,
            deterministic=True, prequad=memory_quads.ndim == 3,
        )
        return out, LayerCache(k, v)


class Decoder(nn.Module):
    """Token embedding + N decoder layers + per-layer refinement heads."""

    num_layers: int = 6
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    vocab_size: int = 1940
    seq_len: int = 200
    num_classes: int = 3
    pad_id: int = 1939
    use_pallas: bool = False
    # decoder-layer variant (`dtv2:76-115`). v1 = the CAPE-complete layer
    # (support cross-attention + KV-cached autoregressive decode). v2-v6 =
    # the reference's experimental support-free layers, teacher-forced path
    # only — exactly the capability the reference has (they crash on its
    # CAPE/decode path, see decoder_variants.py).
    layer_type: str = "v1"
    # prepend src-derived tokens (v4/v41/v5/v6) or the raw memory (v1) to
    # self-attention K/V (`--dec_attn_concat_src`; the reference builder
    # then disables the extra q/k/v pre-projections, `dtv2:80-115`)
    attn_concat_src: bool = False
    # extra q/k/v pre-projections (`--dec_qkv_proj`, default on); the
    # effective value is `qkv_proj and not attn_concat_src` (`dtv2:80`)
    qkv_proj: bool = True
    # 'sine' | 'none' (`deformable_transformer_v2.py:1078-1081`)
    query_pos_type: str = "sine"
    # iterative refinement per layer; off = only the last layer refines the
    # anchor (`deformable_transformer_v2.py:1096-1114`, use_anchor branch)
    poly_refine: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        def embed_init(key, shape, dtype=jnp.float32):
            e = jax.random.normal(key, shape, dtype) * (self.d_model ** -0.5)
            return e.at[self.pad_id].set(0.0)

        self.token_embed = nn.Embed(self.vocab_size, self.d_model,
                                    embedding_init=embed_init,
                                    dtype=self.dtype)
        # learned coordinate anchors (`roomformer_v2.py:241-244`)
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.seq_len, 2)
        )
        if self.query_pos_type not in ("sine", "none"):
            raise ValueError(
                f"query_pos_type={self.query_pos_type!r}: the reference "
                "decoder supports 'sine' and 'none' only "
                "(deformable_transformer_v2.py:1078-1081)"
            )
        if self.query_pos_type == "sine":
            self.pos_trans = nn.Dense(self.d_model, dtype=self.dtype)
            self.pos_trans_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if self.layer_type not in LAYER_TYPES:
            raise ValueError(
                f"layer_type={self.layer_type!r}: expected one of "
                f"{LAYER_TYPES} (dtv2:76-115)"
            )
        use_qkv = self.qkv_proj and not self.attn_concat_src  # dtv2:80
        if self.layer_type == "v1":
            self.layers = [
                DecoderLayer(self.d_model, self.d_ffn, self.dropout,
                             self.n_levels, self.n_heads, self.n_points,
                             use_pallas=self.use_pallas,
                             qkv_proj=use_qkv,
                             concat_src=self.attn_concat_src,
                             dtype=self.dtype, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        elif self.layer_type == "v2":
            self.layers = [
                DecoderLayerV2(self.d_model, self.d_ffn, self.dropout,
                               self.n_levels, self.n_heads, self.n_points,
                               use_pallas=self.use_pallas,
                               dtype=self.dtype, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        elif self.layer_type == "v3":
            self.layers = [
                DecoderLayerV3(self.d_model, self.d_ffn, self.dropout,
                               self.n_heads,
                               is_last=(i == self.num_layers - 1),
                               dtype=self.dtype, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        else:
            self.layers = [
                DecoderLayerVC(variant=self.layer_type,
                               d_model=self.d_model, d_ffn=self.d_ffn,
                               dropout=self.dropout, n_levels=self.n_levels,
                               n_heads=self.n_heads, n_points=self.n_points,
                               attn_concat_src=self.attn_concat_src,
                               use_qkv_proj=use_qkv,
                               use_pallas=self.use_pallas,
                               dtype=self.dtype, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        bias_init = nn.initializers.constant(-jnp.log((1 - 0.01) / 0.01))
        self.class_heads = [
            nn.Dense(self.num_classes, bias_init=bias_init, dtype=self.dtype,
                     name=f"class_head_{i}")
            for i in range(self.num_layers)
        ]
        self.coords_heads = [
            MLPHead(self.d_model, 2, dtype=self.dtype, name=f"coords_head_{i}")
            for i in range(self.num_layers)
        ]

    # ------------------------------------------------------------------
    def seq_embed(self, seq11, seq12, seq21, seq22,
                  delta_x1, delta_x2, delta_y1, delta_y2) -> jnp.ndarray:
        """Bilinear 4-corner token embedding (`dtv2:984-997`)."""
        e11 = self.token_embed(seq11)
        e21 = self.token_embed(seq21)
        e12 = self.token_embed(seq12)
        e22 = self.token_embed(seq22)
        return (
            e11 * (delta_x2 * delta_y2)[..., None]
            + e21 * (delta_x1 * delta_y2)[..., None]
            + e12 * (delta_x2 * delta_y1)[..., None]
            + e22 * (delta_x1 * delta_y1)[..., None]
        )

    def anchors(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.query_embed.astype(jnp.float32))

    def _query_pos(self, ref: jnp.ndarray) -> jnp.ndarray:
        if self.query_pos_type == "none":
            return jnp.zeros(ref.shape[:-1] + (self.d_model,), self.dtype)
        pe = query_sine_embed(ref, self.d_model // 2).astype(self.dtype)
        return self.pos_trans_norm(self.pos_trans(pe))

    def _refine(self, lid: int, x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
        """Layer-lid coordinate refinement of the reference point.

        poly_refine: every layer refines (`dtv2:1096-1102`). Otherwise only
        the final layer applies its offset to the anchor (use_anchor branch,
        `dtv2:1104-1112`); intermediate layers pass the anchor through, so
        aux coord losses still train the anchors — as in the reference.
        """
        if not self.poly_refine and lid != self.num_layers - 1:
            return ref
        head = lid if self.poly_refine else -1
        offset = self.coords_heads[head](x).astype(jnp.float32)
        return jax.nn.sigmoid(offset + inverse_sigmoid(ref))

    # ------------------------------------------------------------------
    def forward_train(
        self,
        seq_kwargs,
        memory: jnp.ndarray,
        spatial_shapes: Sequence[Tuple[int, int]],
        support_features: jnp.ndarray,
        support_mask: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Teacher-forced full-sequence decode.

        Returns:
            classes: (num_layers, B, L, num_classes)
            refs:    (num_layers, B, L, 2)
        """
        x = self.seq_embed(
            seq_kwargs["seq11"], seq_kwargs["seq12"], seq_kwargs["seq21"],
            seq_kwargs["seq22"], seq_kwargs["delta_x1"], seq_kwargs["delta_x2"],
            seq_kwargs["delta_y1"], seq_kwargs["delta_y2"],
        )
        B, L, _ = x.shape
        causal = jnp.where(
            jnp.triu(jnp.ones((L, L), jnp.float32), k=1) > 0, -1e9, 0.0
        )
        ref = jnp.broadcast_to(self.anchors()[None, :L], (B, L, 2))

        classes, refs = [], []
        for lid, layer in enumerate(self.layers):
            query_pos = self._query_pos(ref)
            ref_input = jnp.broadcast_to(
                ref[:, :, None, :], (B, L, self.n_levels, 2)
            )
            if self.layer_type == "v1":
                x = layer.forward_train(
                    x, query_pos, ref_input, memory, spatial_shapes, causal,
                    support_features, support_mask,
                    deterministic=deterministic,
                )
            elif self.layer_type == "v3":
                # v3 updates the memory too; thread it through the stack
                # (`dtv2:1092-1093`)
                x, memory = layer(
                    x, query_pos, ref_input, memory, spatial_shapes, causal,
                    deterministic=deterministic,
                )
            else:
                x = layer(
                    x, query_pos, ref_input, memory, spatial_shapes, causal,
                    deterministic=deterministic,
                )
            ref = self._refine(lid, x, ref)
            classes.append(self.class_heads[lid](x))
            refs.append(ref)
        return jnp.stack(classes), jnp.stack(refs)

    # ------------------------------------------------------------------
    def _require_v1(self, what: str):
        if self.layer_type != "v1":
            raise ValueError(
                f"{what} requires layer_type='v1': the v2-v6 variants are "
                "teacher-forced-only experimental layers, as in the "
                "reference (they crash on its CAPE/decode path — "
                "dtv2:1085-1091 passes support kwargs their forwards do "
                "not accept; v2/v3 also lack KV caches)"
            )
        if self.attn_concat_src:
            raise ValueError(
                f"{what} does not support attn_concat_src: prepending the "
                "full encoder memory to every self-attention step would "
                "grow each decode step's keys from L to S+L (the reference "
                "pays this, dtv2:333-337); train/eval this experimental "
                "flag teacher-forced only"
            )

    def precompute_static(self, memory, support_features, spatial_shapes):
        """Per-layer projections of decode-time-constant inputs.

        Memory is pre-projected AND pre-packed into per-layer quad slabs
        (`ops.msda.precompute_quad_slab`) so every decode step's MSDA is
        one 16-row gather instead of a full repack of the frozen memory
        (the reference recomputes value_proj per generated token,
        `roomformer_v2.py:385-677`; its VCache was dead code).

        Memory trade: a quad slab holds each value row 4x (once per
        bilinear corner role), so the decode cache is ~4x the plain
        (B, S, H, Dh) value cache, per layer — at the flagship shape
        ~17 MB/layer (bf16, B=1) vs ~4.3 MB. CAPE_DECODE_PREQUAD=0 opts
        out for memory-constrained batched serving: the plain per-layer
        value cache is kept and each decode step repacks on the fly via
        `ms_deform_attn_core` (slower, all gather backends selectable)."""
        self._require_v1("autoregressive decode (precompute_static)")
        if os.environ.get("CAPE_DECODE_PREQUAD", "1") == "0":
            mem_values = [l.memory_value(memory) for l in self.layers]
        else:
            mem_values = [l.memory_quads(memory, spatial_shapes)
                          for l in self.layers]
        support_kvs = [l.support_kv(support_features) for l in self.layers]
        return mem_values, support_kvs

    def init_caches(self, batch: int) -> List[LayerCache]:
        dh = self.d_model // self.n_heads
        z = jnp.zeros((batch, self.n_heads, self.seq_len, dh), self.dtype)
        return [LayerCache(z, z) for _ in self.layers]

    def forward_step(
        self,
        token_inputs,                     # dict of (B, 1) arrays
        pos_index: jnp.ndarray,           # scalar int32
        mem_values,                       # list of quad slabs (or plain
        #                                   value caches, see
        #                                   precompute_static)
        spatial_shapes,
        support_kvs,                      # list[(k, v)]
        support_mask,
        caches: List[LayerCache],
    ):
        """One autoregressive step.

        Returns:
            logits: (B, 1, num_classes) — final layer class head
            coords: (B, 1, 2) — final refined reference point
            new_caches
        """
        x = self.seq_embed(
            token_inputs["seq11"], token_inputs["seq12"],
            token_inputs["seq21"], token_inputs["seq22"],
            token_inputs["delta_x1"], token_inputs["delta_x2"],
            token_inputs["delta_y1"], token_inputs["delta_y2"],
        )
        B = x.shape[0]
        anchor = jax.lax.dynamic_slice_in_dim(
            self.anchors(), pos_index, 1, axis=0
        )  # (1, 2)
        ref = jnp.broadcast_to(anchor[None], (B, 1, 2))

        new_caches = []
        logits = None
        for lid, layer in enumerate(self.layers):
            query_pos = self._query_pos(ref)
            ref_input = jnp.broadcast_to(
                ref[:, :, None, :], (B, 1, self.n_levels, 2)
            )
            sk, sv = support_kvs[lid]
            x, cache = layer.forward_step(
                x, query_pos, ref_input, mem_values[lid], spatial_shapes,
                caches[lid], pos_index, sk, sv, support_mask,
            )
            new_caches.append(cache)
            ref = self._refine(lid, x, ref)
            logits = self.class_heads[lid](x)
        return logits, ref, new_caches
