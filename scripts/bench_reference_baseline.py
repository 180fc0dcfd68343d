#!/usr/bin/env python
"""Measure the reference's torch-CPU eval-episode cost (bench baseline).

Round 1 used a documented ESTIMATE (0.5 episodes/sec) for the PyTorch-CPU
baseline. This script replaces it with a measurement: it imports the
reference implementation read-only (`/root/reference`, torchvision/timm
stubbed — they are not installed and not needed for these modules), builds
the CAPE-default transformer + geometric support encoder, and times the two
components that dominate an eval episode:

  1. support encoding (GeometricSupportEncoder, 17 keypoints);
  2. the autoregressive decode protocol of `RoomFormerV2.forward_inference`
     (`roomformer_v2.py:481-597`): encoder once into enc_cache, then
     18 KV-cached single-token transformer calls (17 coords + EOS, the same
     forced length as bench.py) with the reference's per-step host-side
     tensor building and floor/ceil re-tokenization.

EXCLUDED (favors the reference): the ResNet-50 backbone + input projections
(torchvision is unavailable) and image preprocessing. The reported
episodes/sec is therefore an UPPER bound on the reference's true CPU
throughput — using it as the bench baseline understates our speedup.

Prints one JSON line: {"episodes_per_sec": ..., components...}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from ref_modules import dtv2, geometric_support_encoder, install_reference  # noqa: E402


class _MLP(nn.Module):
    """Generic 3-layer coordinate head (d -> d -> d -> 2), matching the
    reference head shape (`roomformer_v2.py:178-237`)."""

    def __init__(self, d, out):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(d, d), nn.Linear(d, d), nn.Linear(d, out)])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x) if i == len(self.layers) - 1 else torch.relu(l(x))
        return x


def build_reference_stack(d=256, seq_len=200, vocab=44 * 44 + 4):
    install_reference()
    from datasets.discrete_tokenizer import DiscreteTokenizerV2

    tok = DiscreteTokenizerV2(num_bins=44, seq_len=seq_len)
    m = dtv2()
    tr = m.DeformableTransformer(
        d_model=d, nhead=8, num_encoder_layers=6, num_decoder_layers=6,
        dim_feedforward=1024, dropout=0.0, poly_refine=True,
        return_intermediate_dec=False, aux_loss=False, num_feature_levels=4,
        dec_n_points=4, enc_n_points=4, query_pos_type="sine",
        vocab_size=vocab, seq_len=seq_len, dec_layer_type="v1",
        pad_idx=tok.pad,
    )
    # heads the wrapper model injects (`roomformer_v2.py:245-246`)
    tr.decoder.class_embed = nn.ModuleList(
        [nn.Linear(d, 3) for _ in range(6)])
    tr.decoder.coords_embed = nn.ModuleList([_MLP(d, 2) for _ in range(6)])

    g = geometric_support_encoder()
    sup = g.GeometricSupportEncoder(
        hidden_dim=d, num_encoder_layers=3, nhead=8,
        dim_feedforward=1024, dropout=0.0, use_gcn_preenc=True,
        num_gcn_layers=2)
    tr.eval()
    sup.eval()
    return tr, sup, tok


@torch.no_grad()
def run_episode(tr, sup, tok, srcs, masks, pos, query_embed, support_coords,
                support_mask, skeleton, n_coords=17, d=256):
    """One 1-shot eval episode, mirroring `forward_inference`'s protocol."""
    device = torch.device("cpu")
    bs = 1
    num_bins = tok.num_bins

    t0 = time.perf_counter()
    support_features = sup(support_coords, support_mask, skeleton)
    t_support = time.perf_counter() - t0

    tr._setup_caches(bs, tok.seq_len,
                     sum(s.shape[2] * s.shape[3] for s in srcs), d, 8,
                     torch.float32, device)
    # host-side sequence state, as python lists (the reference's structure)
    s11 = [[tok.bos]]
    s12 = [[tok.bos]]
    s21 = [[tok.bos]]
    s22 = [[tok.bos]]
    dx1, dy1, dx2, dy2 = [[0.0]], [[0.0]], [[1.0]], [[1.0]]

    enc_cache = None
    t_first = t_steps = 0.0
    for i in range(n_coords + 1):
        t0 = time.perf_counter()
        seq_kwargs = {
            "seq11": torch.tensor(np.array(s11)[:, i:i + 1]).long(),
            "seq12": torch.tensor(np.array(s12)[:, i:i + 1]).long(),
            "seq21": torch.tensor(np.array(s21)[:, i:i + 1]).long(),
            "seq22": torch.tensor(np.array(s22)[:, i:i + 1]).long(),
            "delta_x1": torch.tensor(np.array(dx1)[:, i:i + 1]).float(),
            "delta_x2": torch.tensor(np.array(dx2)[:, i:i + 1]).float(),
            "delta_y1": torch.tensor(np.array(dy1)[:, i:i + 1]).float(),
            "delta_y2": torch.tensor(np.array(dy2)[:, i:i + 1]).float(),
            "input_polygon_labels": torch.full((1, 1), -1).long(),
        }
        pos_t = torch.tensor([i], dtype=torch.long)
        _, _, reg, cls_out, enc_cache = tr(
            srcs, masks, pos, query_embed, None, None, seq_kwargs,
            force_simple_returns=True, return_enc_cache=True,
            enc_cache=enc_cache, decode_token_pos=pos_t,
            support_features=support_features, support_mask=support_mask)
        _ = torch.argmax(cls_out, 2)  # token-type branch input
        if i < n_coords:  # forced: coord steps, then one EOS step
            x, y = reg[0, 0].detach().cpu().numpy()
            x, y = min(float(x), 1.0), min(float(y), 1.0)
            qx, qy = x * (num_bins - 1), y * (num_bins - 1)
            xf, yf = math.floor(qx), math.floor(qy)
            xc, yc = math.ceil(qx), math.ceil(qy)
            s11[0].append(xf * num_bins + yf)
            s12[0].append(xf * num_bins + yc)
            s21[0].append(xc * num_bins + yf)
            s22[0].append(xc * num_bins + yc)
            ddx, ddy = qx - xf, qy - yf
        else:
            for s in (s11, s12, s21, s22):
                s[0].append(tok.eos)
            ddx = ddy = 0.0
        dx1[0].append(ddx)
        dy1[0].append(ddy)
        dx2[0].append(1.0 - ddx)
        dy2[0].append(1.0 - ddy)
        dt = time.perf_counter() - t0
        if i == 0:
            t_first = dt  # includes the 6-layer deformable encoder
        else:
            t_steps += dt
    return t_support, t_first, t_steps


def main():
    torch.manual_seed(0)
    d, image_size = 256, 512
    tr, sup, tok = build_reference_stack(d=d)

    # post-input-proj feature levels for 512px input (strides 8/16/32/64)
    shapes = [(image_size // s, image_size // s) for s in (8, 16, 32, 64)]
    srcs = [torch.randn(1, d, h, w) for h, w in shapes]
    masks = [torch.zeros(1, h, w, dtype=torch.bool) for h, w in shapes]
    pos = [torch.randn(1, d, h, w) for h, w in shapes]
    query_embed = nn.Embedding(tok.seq_len, 2).weight.detach()

    support_coords = torch.rand(1, 17, 2)
    support_mask = torch.zeros(1, 17, dtype=torch.bool)
    skeleton = [[[i, i + 1] for i in range(1, 17)]]

    # warmup (threading pools, lazy allocs)
    run_episode(tr, sup, tok, srcs, masks, pos, query_embed,
                support_coords, support_mask, skeleton, n_coords=2)

    reps = int(os.environ.get("BASELINE_REPS", "3"))
    totals, supports, firsts, steps = [], [], [], []
    for _ in range(reps):
        ts, tf, tst = run_episode(tr, sup, tok, srcs, masks, pos,
                                  query_embed, support_coords, support_mask,
                                  skeleton, n_coords=17)
        supports.append(ts)
        firsts.append(tf)
        steps.append(tst)
        totals.append(ts + tf + tst)
    t = float(np.median(totals))
    print(json.dumps({
        "episodes_per_sec": round(1.0 / t, 4),
        "episode_sec_p50": round(t, 4),
        "support_encode_sec": round(float(np.median(supports)), 4),
        "encoder_plus_first_step_sec": round(float(np.median(firsts)), 4),
        "decode_17_steps_sec": round(float(np.median(steps)), 4),
        "note": "torch-CPU, backbone/input-proj EXCLUDED (upper bound on "
                "reference throughput); 18-token forced decode protocol "
                "matching bench.py",
    }))


if __name__ == "__main__":
    main()
