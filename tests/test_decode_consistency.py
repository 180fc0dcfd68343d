"""KV-cache decode consistency: feeding the decode loop's own generated
input sequence through the full teacher-forced forward must reproduce the
per-step logits/coords (catches any KV-cache, masking or positional bug —
the reference's `test_forward_inference_*` regression family)."""

import numpy as np
import jax
import jax.numpy as jnp

from cape_tpu.config import tiny_test_config
from cape_tpu.data.tokenizer import DiscreteTokenizer
from cape_tpu.data.token_types import TokenType
from cape_tpu.models import CAPE
from cape_tpu.models.cape import autoregressive_decode

CFG = tiny_test_config()


def reconstruct_inputs(tok, pred_logits, pred_coords, lengths, min_len, L):
    """Re-derive the decode loop's input sequences from its outputs
    (mirrors the on-device re-tokenization, `roomformer_v2.py:530-597`)."""
    B = pred_logits.shape[0]
    nb = tok.num_bins
    seqs = {k: np.full((B, L), tok.pad, np.int64) for k in
            ("seq11", "seq12", "seq21", "seq22")}
    dx1 = np.zeros((B, L), np.float32)
    dy1 = np.zeros((B, L), np.float32)
    for b in range(B):
        for k in seqs:
            seqs[k][b, 0] = tok.bos
        for i in range(L - 1):
            if i >= lengths[b]:
                break  # inputs after finish are pads (already filled)
            cls = pred_logits[b, i].argmax()
            is_eos = cls == TokenType.eos and i >= min_len
            is_coord = cls == TokenType.coord or (
                cls == TokenType.eos and i < min_len)
            if is_coord:
                x, y = np.clip(pred_coords[b, i], 0, 1)
                qx, qy = x * (nb - 1), y * (nb - 1)
                xf, yf = int(np.floor(qx)), int(np.floor(qy))
                xc, yc = int(np.ceil(qx)), int(np.ceil(qy))
                seqs["seq11"][b, i + 1] = xf * nb + yf
                seqs["seq12"][b, i + 1] = xf * nb + yc
                seqs["seq21"][b, i + 1] = xc * nb + yf
                seqs["seq22"][b, i + 1] = xc * nb + yc
                dx1[b, i + 1] = qx - xf
                dy1[b, i + 1] = qy - yf
            elif is_eos:
                for k in seqs:
                    seqs[k][b, i + 1] = tok.eos
            else:
                for k in seqs:
                    seqs[k][b, i + 1] = tok.sep
    return {
        **{k: jnp.asarray(v) for k, v in seqs.items()},
        "delta_x1": jnp.asarray(dx1), "delta_y1": jnp.asarray(dy1),
        "delta_x2": jnp.asarray(1 - dx1), "delta_y2": jnp.asarray(1 - dy1),
    }


def test_stepwise_decode_matches_teacher_forced_forward():
    # NOTE: plain `test_model`, not `tests.test_model` — the reference repo
    # has a regular `tests` package (`/root/reference/tests/__init__.py`)
    # which shadows our namespace package once ref_modules.install_reference
    # has put /root/reference on sys.path (parity tests do this).
    import test_model as tm

    model = CAPE(CFG)
    b = tm.make_batch(seed=11)
    params = model.init(
        jax.random.PRNGKey(1), b["query_images"], b["support_coords"],
        b["support_mask"], b["skeleton_edges"], b["targets"],
    )
    out = autoregressive_decode(
        model, params, b["query_images"], b["support_coords"],
        b["support_mask"], b["skeleton_edges"],
    )
    lengths = np.asarray(out["lengths"])
    pred_logits = np.asarray(out["pred_logits"])
    pred_coords = np.asarray(out["pred_coords"])

    tok = DiscreteTokenizer(CFG.num_bins, CFG.seq_len)
    seq_kwargs = reconstruct_inputs(
        tok, pred_logits, pred_coords, lengths, CFG.min_decode_len, CFG.seq_len
    )
    targets = dict(b["targets"])
    targets.update(seq_kwargs)
    tf_out = model.apply(
        params, b["query_images"], b["support_coords"], b["support_mask"],
        b["skeleton_edges"], targets,
    )
    tf_logits = np.asarray(tf_out["pred_logits"])
    tf_coords = np.asarray(tf_out["pred_coords"])
    for i in range(pred_logits.shape[0]):
        n = int(lengths[i])
        np.testing.assert_allclose(
            pred_logits[i, :n], tf_logits[i, :n], atol=2e-4, rtol=1e-3,
            err_msg=f"sample {i} logits diverge (KV-cache bug?)",
        )
        np.testing.assert_allclose(
            pred_coords[i, :n], tf_coords[i, :n], atol=2e-4, rtol=1e-3,
            err_msg=f"sample {i} coords diverge",
        )


def test_decode_prequad_optout_matches_default(monkeypatch):
    """CAPE_DECODE_PREQUAD=0 (plain per-layer value caches, on-the-fly
    quad packing each step — the low-memory serving mode) must produce
    the same decode as the default prepacked quad-slab path."""
    import test_model as tm

    model = CAPE(CFG)
    b = tm.make_batch(seed=23)
    params = model.init(
        jax.random.PRNGKey(2), b["query_images"], b["support_coords"],
        b["support_mask"], b["skeleton_edges"], b["targets"],
    )

    def run():
        out = autoregressive_decode(
            model, params, b["query_images"], b["support_coords"],
            b["support_mask"], b["skeleton_edges"],
        )
        return (np.asarray(out["pred_logits"]), np.asarray(out["pred_coords"]),
                np.asarray(out["lengths"]))

    monkeypatch.delenv("CAPE_DECODE_PREQUAD", raising=False)
    logits_pq, coords_pq, len_pq = run()
    monkeypatch.setenv("CAPE_DECODE_PREQUAD", "0")
    logits_pl, coords_pl, len_pl = run()

    np.testing.assert_array_equal(len_pq, len_pl)
    for i in range(logits_pq.shape[0]):
        n = int(len_pq[i])
        np.testing.assert_allclose(logits_pq[i, :n], logits_pl[i, :n],
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(coords_pq[i, :n], coords_pl[i, :n],
                                   atol=2e-4, rtol=1e-3)


def test_decode_max_len_cap_is_exact():
    """A max_len cap below seq_len (smaller KV caches, shorter loop) must
    reproduce the full-length decode exactly for episodes that finish
    within the cap, with outputs padded back to (B, seq_len, ...)."""
    import test_model as tm

    model = CAPE(CFG)
    b = tm.make_batch(seed=31)
    params = model.init(
        jax.random.PRNGKey(3), b["query_images"], b["support_coords"],
        b["support_mask"], b["skeleton_edges"], b["targets"],
    )
    full = autoregressive_decode(
        model, params, b["query_images"], b["support_coords"],
        b["support_mask"], b["skeleton_edges"], force_length=10,
    )
    capped = autoregressive_decode(
        model, params, b["query_images"], b["support_coords"],
        b["support_mask"], b["skeleton_edges"], force_length=10, max_len=12,
    )
    for k in ("pred_logits", "pred_coords", "gen_valid"):
        a, c = np.asarray(full[k]), np.asarray(capped[k])
        assert a.shape == c.shape, (k, a.shape, c.shape)
        np.testing.assert_allclose(c, a, atol=2e-4, rtol=1e-3, err_msg=k)
    np.testing.assert_array_equal(np.asarray(full["lengths"]),
                                  np.asarray(capped["lengths"]))
