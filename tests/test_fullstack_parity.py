"""FULL-STACK weight-transplant parity against the reference (round-3 #1).

Per-module parity (tests/test_torch_parity.py) leaves the composition glue
unproven: the 6-layer deformable encoder stack with dense reference points
(`models/deformable_transformer.py:155-291`), the full `TransformerDecoder`
loop with anchors / sine query-PE / iterative refinement / per-layer heads
(`models/deformable_transformer_v2.py:951-1131`), and the autoregressive
decode protocol (`models/roomformer_v2.py:385-677`). A single glue mismatch
(level-embed addition, PE frequency layout, refinement ordering) would pass
every per-module test and still break PCK parity.

This file builds the reference's full CAPE-default stack (6+6 layers,
d=256, heads injected — backbone excluded, both sides fed identical
post-input-proj feature levels), transplants EVERY weight into `CAPE`, and
asserts:

1. the image sine PE matches `PositionEmbeddingSine(normalize=True)`;
2. teacher-forced PER-LAYER classes and refined coordinates match;
3. the autoregressive decode emits the IDENTICAL token-type sequence,
   corner-token ids, per-step coordinates, and generated lengths as the
   reference `forward_inference` protocol (KV-cached, min_len=6) on
   multiple random inputs.

Reference modules are imported READ-ONLY as numerical oracles
(tests/ref_modules.py) — no reference code is copied.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

import ref_modules
from test_torch_parity import (
    _edges_to_padded,
    dense,
    gcn_params,
    layer_norm,
    mha,
    msda_params,
    t2n,
)

from cape_tpu.config import CAPEConfig
from cape_tpu.data.tokenizer import DiscreteTokenizer
from cape_tpu.models.cape import CAPE, autoregressive_decode

pytestmark = pytest.mark.slow

D, HEADS, FFN = 256, 8, 1024
ENC_LAYERS = DEC_LAYERS = 6
LEVELS, POINTS = 4, 4
IMAGE = 128                      # levels 16/8/4/2 -> S = 340 memory tokens
SEQ_LEN = 24
NUM_BINS = 44                    # vocab_size 2000 -> 44^2 + 4 = 1940 tokens
N_KPTS = 10
B = 2


class _RefMLP(nn.Module):
    """Coords head shape of `roomformer_v2.py:178-237` (MLP d->d->d->2)."""

    def __init__(self, d, out):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(d, d), nn.Linear(d, d), nn.Linear(d, out)])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x) if i == len(self.layers) - 1 else torch.relu(l(x))
        return x


def _build_reference():
    """Reference DeformableTransformer (v1, poly_refine, sine query-PE) +
    GeometricSupportEncoder at the CAPE-default architecture."""
    ref_modules.install_reference()
    m = ref_modules.dtv2()
    tok = DiscreteTokenizer(num_bins=NUM_BINS, seq_len=SEQ_LEN)
    tr = m.DeformableTransformer(
        d_model=D, nhead=HEADS, num_encoder_layers=ENC_LAYERS,
        num_decoder_layers=DEC_LAYERS, dim_feedforward=FFN, dropout=0.0,
        poly_refine=True, return_intermediate_dec=True, aux_loss=True,
        num_feature_levels=LEVELS, dec_n_points=POINTS, enc_n_points=POINTS,
        query_pos_type="sine", vocab_size=tok.vocab_size, seq_len=SEQ_LEN,
        dec_layer_type="v1", pad_idx=tok.pad,
    )
    # heads the wrapper model injects (`roomformer_v2.py:228-246`); default
    # torch init (NOT zero-init) so refinement offsets are non-trivial
    tr.decoder.class_embed = nn.ModuleList(
        [nn.Linear(D, 3) for _ in range(DEC_LAYERS)])
    # bias the final head toward EOS so random-weight decode terminates
    # before seq_len and the EOS/min_len branches are exercised
    with torch.no_grad():
        tr.decoder.class_embed[-1].bias[2] += 2.0
    tr.decoder.coords_embed = nn.ModuleList(
        [_RefMLP(D, 2) for _ in range(DEC_LAYERS)])
    query_embed = nn.Embedding(SEQ_LEN, 2)

    g = ref_modules.geometric_support_encoder()
    sup = g.GeometricSupportEncoder(
        hidden_dim=D, num_encoder_layers=3, nhead=HEADS,
        dim_feedforward=FFN, dropout=0.0, use_gcn_preenc=True,
        num_gcn_layers=2)
    tr.eval()
    sup.eval()
    return tr, query_embed, sup, tok


def _transplant(variables, tr, query_embed, sup):
    """Copy every reference weight into the CAPE param tree (backbone and
    input projections excluded — both sides consume identical post-proj
    features)."""
    p = jax.tree_util.tree_map(np.asarray, variables)["params"]

    p["level_embed"] = t2n(tr.level_embed)
    for i, el in enumerate(tr.encoder.layers):
        q = p["encoder"][f"layer_{i}"]
        q["self_attn"] = msda_params(el.self_attn)
        q["norm1"] = layer_norm(el.norm1)
        q["Dense_0"] = dense(el.linear1)
        q["Dense_1"] = dense(el.linear2)
        q["norm2"] = layer_norm(el.norm2)

    d = p["decoder"]
    d["token_embed"]["embedding"] = t2n(tr.decoder.token_embed.weight)
    d["query_embed"] = t2n(query_embed.weight)
    d["pos_trans"] = dense(tr.decoder.pos_trans)
    d["pos_trans_norm"] = layer_norm(tr.decoder.pos_trans_norm)
    for i, dl in enumerate(tr.decoder.layers):
        d[f"layer_{i}"] = {
            "attn_q": dense(dl.attn_q),
            "attn_k": dense(dl.attn_k),
            "attn_v": dense(dl.attn_v),
            "self_attn": mha(dl.self_attn),
            "norm2": layer_norm(dl.norm2),
            "support_attn": mha(dl.support_attn),
            "norm_support": layer_norm(dl.norm_support),
            "cross_attn": msda_params(dl.cross_attn),
            "norm1": layer_norm(dl.norm1),
            "linear1": dense(dl.linear1),
            "linear2": dense(dl.linear2),
            "norm3": layer_norm(dl.norm3),
        }
        d[f"class_head_{i}"] = dense(tr.decoder.class_embed[i])
        d[f"coords_head_{i}"] = {
            f"Dense_{j}": dense(tr.decoder.coords_embed[i].layers[j])
            for j in range(3)
        }

    s = p["support_encoder"]
    s["coord_mlp_0"] = dense(sup.coord_mlp[0])
    s["coord_mlp_1"] = dense(sup.coord_mlp[2])
    for i, gcn in enumerate(sup.gcn_layers):
        s[f"gcn_{i}"] = gcn_params(gcn)
    for i, tl in enumerate(sup.transformer_encoder.layers):
        s[f"layer_{i}"] = {
            "MultiHeadAttention_0": mha(tl.self_attn),
            "LayerNorm_0": layer_norm(tl.norm1),
            "Dense_0": dense(tl.linear1),
            "Dense_1": dense(tl.linear2),
            "LayerNorm_1": layer_norm(tl.norm2),
        }
    return {"params": p}


def _seq_inputs(rng, tok, L):
    """Teacher-forcing token inputs: BOS then L-1 random coordinates, as 4
    corner-id streams + bilinear deltas (`mp100_cape.py:625-832`)."""
    coords = rng.uniform(0.02, 0.98, (B, L - 1, 2))
    q = tok.quantize(coords)
    i11, i21, i12, i22, dx, dy = tok.corner_ids(q)

    def seq(first, rest):
        out = np.full((B, L), first, np.int64)
        out[:, 1:] = rest
        return out

    return {
        "seq11": seq(tok.bos, i11), "seq12": seq(tok.bos, i12),
        "seq21": seq(tok.bos, i21), "seq22": seq(tok.bos, i22),
        "delta_x1": seq(0.0, dx).astype(np.float32),
        "delta_y1": seq(0.0, dy).astype(np.float32),
        "delta_x2": seq(1.0, 1.0 - dx).astype(np.float32),
        "delta_y2": seq(1.0, 1.0 - dy).astype(np.float32),
    }


@pytest.fixture(scope="module")
def stack():
    torch.manual_seed(7)
    tr, query_embed, sup, tok = _build_reference()

    cfg = CAPEConfig(
        image_size=IMAGE, hidden_dim=D, dim_feedforward=FFN,
        enc_layers=ENC_LAYERS, dec_layers=DEC_LAYERS, nheads=HEADS,
        seq_len=SEQ_LEN, vocab_size=2000, dropout=0.0, bf16=False,
        backbone="resnet_tiny", min_decode_len=6, aux_loss=True,
        max_support_keypoints=N_KPTS, max_skeleton_edges=16,
        support_encoder_layers=3, num_gcn_layers=2, remat_encoder=False,
    )
    model = CAPE(cfg)
    assert cfg.num_bins == NUM_BINS

    rng = np.random.default_rng(0)
    sc = rng.uniform(0.05, 0.95, (B, N_KPTS, 2)).astype(np.float32)
    sm = np.zeros((B, N_KPTS), bool)
    sm[0, 7:] = True
    edges = [[[i, i + 1] for i in range(N_KPTS - 1)],
             [[0, 1], [0, 2], [2, 3], [3, 4]]]
    sk = _edges_to_padded(edges, 16)

    shapes = [(IMAGE // s, IMAGE // s) for s in (8, 16, 32, 64)]
    srcs_t = [torch.from_numpy(
        rng.normal(0, 1, (B, D, h, w)).astype(np.float32))
        for h, w in shapes]
    masks_t = [torch.zeros(B, h, w, dtype=torch.bool) for h, w in shapes]
    pe_mod = __import__("models.position_encoding", fromlist=["x"])
    from util.misc import NestedTensor

    ref_pe = pe_mod.PositionEmbeddingSine(D // 2, normalize=True)
    pos_t = [ref_pe(NestedTensor(s, m)) for s, m in zip(srcs_t, masks_t)]

    dummy_targets = _seq_inputs(np.random.default_rng(1), tok, SEQ_LEN)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, IMAGE, IMAGE, 3), jnp.float32),
        jnp.asarray(sc[:1]), jnp.asarray(sm[:1]), jnp.asarray(sk[:1]),
        {k: jnp.asarray(v[:1]) for k, v in dummy_targets.items()},
    )
    params = _transplant(variables, tr, query_embed, sup)

    srcs_j = [jnp.asarray(t2n(s).transpose(0, 2, 3, 1)) for s in srcs_t]
    return dict(tr=tr, query_embed=query_embed, sup=sup, tok=tok, cfg=cfg,
                model=model, params=params, sc=sc, sm=sm, edges=edges, sk=sk,
                srcs_t=srcs_t, masks_t=masks_t, pos_t=pos_t, srcs_j=srcs_j)


def test_image_sine_pe_matches_reference(stack):
    """`image_sine_pe_2d` == `PositionEmbeddingSine(normalize=True)` on an
    all-valid mask (`models/position_encoding.py:22-40`)."""
    from cape_tpu.models.position_encoding import image_sine_pe_2d

    for lvl, pos in enumerate(stack["pos_t"]):
        ref = t2n(pos)[0].transpose(1, 2, 0)          # (H, W, D)
        ours = image_sine_pe_2d(ref.shape[0], ref.shape[1], D)
        np.testing.assert_allclose(ours, ref, atol=1e-5,
                                   err_msg=f"level {lvl}")


def test_teacher_forced_full_stack(stack):
    """Per-layer classes + refined coords of the COMPOSED stack match:
    encoder (dense ref points, level embed) -> support encoder -> 6-layer
    decoder with anchors, sine query-PE, iterative refinement, per-layer
    heads (`deformable_transformer_v2.py:177-254, 951-1131`)."""
    tr, tok = stack["tr"], stack["tok"]
    seqs = _seq_inputs(np.random.default_rng(2), tok, SEQ_LEN)

    seq_torch = {
        k: torch.from_numpy(v) for k, v in seqs.items()
    }
    with torch.no_grad():
        sup_feats = stack["sup"](
            torch.from_numpy(stack["sc"]), torch.from_numpy(stack["sm"]),
            stack["edges"])
        hs, _, inter_refs, inter_classes = tr(
            stack["srcs_t"], stack["masks_t"], stack["pos_t"],
            stack["query_embed"].weight, None, None, seq_torch,
            support_features=sup_feats,
            support_mask=torch.from_numpy(stack["sm"]),
        )
    ref_refs = t2n(inter_refs)          # (6, B, L, 2)
    ref_classes = t2n(inter_classes)    # (6, B, L, 3)

    model, params = stack["model"], stack["params"]

    def tf_forward(mdl, srcs, sc, sm, sk, seq_kwargs):
        memory = mdl.encode_features(srcs)
        support = mdl.encode_support(sc, sm, sk)
        return mdl.decoder.forward_train(
            seq_kwargs, memory, mdl.spatial_shapes, support, sm)

    classes, refs = model.apply(
        params, stack["srcs_j"], jnp.asarray(stack["sc"]),
        jnp.asarray(stack["sm"]), jnp.asarray(stack["sk"]),
        {k: jnp.asarray(v) for k, v in seqs.items()}, method=tf_forward)

    np.testing.assert_allclose(np.asarray(refs), ref_refs,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(classes), ref_classes,
                               rtol=1e-4, atol=2e-4)


def _reference_decode(stack, sup_feats):
    """Drive the reference's KV-cached autoregressive protocol
    (`roomformer_v2.py:440-598`): enc_cache built on the first call, then
    per-step single-token transformer calls with host-side token-type
    branching and floor/ceil re-tokenization. min_len=6 per `:456`."""
    import math

    tr, tok = stack["tr"], stack["tok"]
    nb = tok.num_bins
    min_len = 6
    device = torch.device("cpu")
    S = sum(h * w for h, w in [s.shape[-2:] for s in stack["srcs_t"]])
    tr._setup_caches(B, SEQ_LEN, S, D, HEADS, torch.float32, device)

    s11 = [[tok.bos] for _ in range(B)]
    s12 = [[tok.bos] for _ in range(B)]
    s21 = [[tok.bos] for _ in range(B)]
    s22 = [[tok.bos] for _ in range(B)]
    dx1 = [[0.0] for _ in range(B)]
    dy1 = [[0.0] for _ in range(B)]
    dx2 = [[1.0] for _ in range(B)]
    dy2 = [[1.0] for _ in range(B)]
    unfinished = np.ones(B)
    types = [[] for _ in range(B)]
    coords = [[] for _ in range(B)]
    lengths = np.zeros(B, np.int64)

    enc_cache = None
    i = 0
    with torch.no_grad():
        while i < SEQ_LEN and unfinished.any():
            seq_kwargs = {
                "seq11": torch.tensor(np.array(s11)[:, i:i + 1]).long(),
                "seq12": torch.tensor(np.array(s12)[:, i:i + 1]).long(),
                "seq21": torch.tensor(np.array(s21)[:, i:i + 1]).long(),
                "seq22": torch.tensor(np.array(s22)[:, i:i + 1]).long(),
                "delta_x1": torch.tensor(
                    np.array(dx1)[:, i:i + 1], dtype=torch.float32),
                "delta_x2": torch.tensor(
                    np.array(dx2)[:, i:i + 1], dtype=torch.float32),
                "delta_y1": torch.tensor(
                    np.array(dy1)[:, i:i + 1], dtype=torch.float32),
                "delta_y2": torch.tensor(
                    np.array(dy2)[:, i:i + 1], dtype=torch.float32),
            }
            pos_idx = torch.tensor([i], dtype=torch.long)
            _, _, reg, cls_out, enc_cache = tr(
                stack["srcs_t"], stack["masks_t"], stack["pos_t"],
                stack["query_embed"].weight, None, None, seq_kwargs,
                force_simple_returns=True, return_enc_cache=True,
                enc_cache=enc_cache, decode_token_pos=pos_idx,
                support_features=sup_feats,
                support_mask=torch.from_numpy(stack["sm"]))
            cls_type = torch.argmax(cls_out, 2)
            for j in range(B):
                if unfinished[j] != 1:
                    for s in (s11, s12, s21, s22):
                        s[j].append(tok.pad)
                    dx = dy = 0.0
                else:
                    lengths[j] += 1
                    cj = cls_type[j, 0].item()
                    types[j].append(cj)
                    if cj == 0 or (cj == 2 and i < min_len):  # coord
                        x, y = reg[j, 0].numpy()
                        x, y = min(float(x), 1.0), min(float(y), 1.0)
                        coords[j].append((x, y))
                        qx, qy = x * (nb - 1), y * (nb - 1)
                        xf, yf = math.floor(qx), math.floor(qy)
                        xc, yc = math.ceil(qx), math.ceil(qy)
                        s11[j].append(xf * nb + yf)
                        s12[j].append(xf * nb + yc)
                        s21[j].append(xc * nb + yf)
                        s22[j].append(xc * nb + yc)
                        dx, dy = qx - xf, qy - yf
                    elif cj == 1:                             # sep
                        for s in (s11, s12, s21, s22):
                            s[j].append(tok.sep)
                        dx = dy = 0.0
                    else:                                     # eos, i>=min_len
                        unfinished[j] = 0
                        for s in (s11, s12, s21, s22):
                            s[j].append(tok.eos)
                        dx = dy = 0.0
                dx1[j].append(dx)
                dy1[j].append(dy)
                dx2[j].append(1.0 - dx)
                dy2[j].append(1.0 - dy)
            i += 1
    return dict(types=types, coords=coords, lengths=lengths,
                tokens11=s11, unfinished=unfinished)


def test_autoregressive_decode_matches_reference(stack):
    """The fused `lax.while_loop` decode generates the IDENTICAL token-type
    sequence, corner-token ids, coordinates, and lengths as the reference
    `forward_inference` host loop (`roomformer_v2.py:481-598`)."""
    with torch.no_grad():
        sup_feats = stack["sup"](
            torch.from_numpy(stack["sc"]), torch.from_numpy(stack["sm"]),
            stack["edges"])
    ref = _reference_decode(stack, sup_feats)

    model, params = stack["model"], stack["params"]

    def enc(mdl, srcs, sc, sm, sk):
        return mdl.encode_features(srcs), mdl.encode_support(sc, sm, sk)

    memory, support = model.apply(
        params, stack["srcs_j"], jnp.asarray(stack["sc"]),
        jnp.asarray(stack["sm"]), jnp.asarray(stack["sk"]), method=enc)
    # support features must themselves agree or decode parity is vacuous
    np.testing.assert_allclose(
        np.asarray(support)[~stack["sm"]], t2n(sup_feats)[~stack["sm"]],
        rtol=1e-4, atol=1e-4)

    out = autoregressive_decode(
        model, params, None, jnp.asarray(stack["sc"]),
        jnp.asarray(stack["sm"]), jnp.asarray(stack["sk"]),
        encoded=(memory, support))

    lengths = np.asarray(out["lengths"])
    np.testing.assert_array_equal(lengths, ref["lengths"])
    our_types = np.argmax(np.asarray(out["pred_logits"]), axis=-1)
    our_coords = np.asarray(out["pred_coords"])
    our_valid = np.asarray(out["gen_valid"])
    for j in range(B):
        L_j = int(lengths[j])
        assert list(our_types[j, :L_j]) == ref["types"][j], f"sample {j}"
        ref_c = np.asarray(ref["coords"][j], np.float32).reshape(-1, 2)
        ours_c = our_coords[j][our_valid[j]]
        np.testing.assert_allclose(ours_c, ref_c, rtol=1e-4, atol=2e-4,
                                   err_msg=f"sample {j}")
    # the EOS/min_len branch must actually be exercised, and both sides
    # must agree on which samples finished
    assert (ref["unfinished"] == 0).any(), "fixture must reach EOS"
    np.testing.assert_array_equal(np.asarray(out["unfinished"]),
                                  ref["unfinished"] == 1)
    assert any(len(c) > 0 for c in ref["coords"]), "no coord steps generated"
