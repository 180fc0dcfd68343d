"""Loss unit tests: EOS weighting, visibility masking, aux replication —
mirroring the reference's regression suite invariants (EOS-in-loss,
`tests/test_eos_prediction.py`; visibility gating, CRITICAL FIX #1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.losses import cape_criterion, coords_l1_loss, token_ce_loss


def torch_ce_oracle(logits, labels, mask, eos_weight):
    import torch
    import torch.nn.functional as F

    w = torch.ones(logits.shape[-1])
    w[2] = eos_weight
    lg = torch.from_numpy(logits)[torch.from_numpy(mask)]
    lb = torch.from_numpy(labels.astype(np.int64))[torch.from_numpy(mask)]
    return F.cross_entropy(lg, lb, weight=w, reduction="mean").item()


class TestTokenCE:
    def test_matches_torch_weighted_mean(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 12, 3)).astype(np.float32)
        labels = rng.integers(0, 3, size=(2, 12)).astype(np.int32)
        labels[:, -3:] = -1
        mask = (labels != -1) & (rng.uniform(size=(2, 12)) > 0.3)
        ours = float(token_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(mask), eos_weight=20.0))
        ref = torch_ce_oracle(logits, labels, mask, 20.0)
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_eos_weight_increases_eos_penalty(self):
        logits = np.zeros((1, 2, 3), np.float32)
        labels = np.array([[2, 0]], np.int32)  # one EOS, one coord
        mask = np.ones((1, 2), bool)
        l1 = float(token_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(mask), eos_weight=1.0))
        l20 = float(token_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(mask), eos_weight=20.0))
        # uniform logits -> same per-token CE; weighting changes only the
        # normalization, so equal here — but gradient emphasis differs.
        assert l20 == pytest.approx(l1)
        # now make the EOS prediction WRONG and coord RIGHT
        logits = np.array([[[5.0, 0, 0], [5.0, 0, 0]]], np.float32)
        lw = float(token_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(mask), eos_weight=20.0))
        lu = float(token_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(mask), eos_weight=1.0))
        assert lw > lu  # EOS mistake dominates with 20x weight

    def test_label_smoothing_matches_torch_oracle(self):
        """Smoothed path: UNWEIGHTED smoothed NLL, as the reference's
        `label_smoothed_nll_loss` fallback (`cape_losses.py:10-38`) —
        the EOS class weight is dropped when smoothing is on
        (`cape_losses.py:93-103`)."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(7)
        logits = rng.normal(size=(2, 12, 3)).astype(np.float32)
        labels = rng.integers(0, 3, size=(2, 12)).astype(np.int32)
        labels[:, -2:] = -1
        mask = (labels != -1) & (rng.uniform(size=(2, 12)) > 0.3)
        eps = 0.1
        ours = float(token_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(mask), eos_weight=20.0,
                                   label_smoothing=eps))
        lg = torch.from_numpy(logits)[torch.from_numpy(mask)]
        lb = torch.from_numpy(labels.astype(np.int64))[torch.from_numpy(mask)]
        logp = F.log_softmax(lg, dim=-1)
        onehot = torch.zeros_like(logp).scatter_(1, lb.unsqueeze(1), 1.0)
        q = onehot * (1 - eps) + eps / logp.shape[-1]
        ref = (-(q * logp).sum(-1)).mean().item()
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_empty_mask_returns_zero(self):
        out = token_ce_loss(jnp.zeros((1, 4, 3)), jnp.full((1, 4), -1),
                            jnp.zeros((1, 4), bool), 20.0)
        assert float(out) == 0.0


class TestCoordsL1:
    def test_masked_elements_only(self):
        pred = jnp.asarray([[[0.5, 0.5], [9.0, 9.0]]])
        tgt = jnp.asarray([[[0.0, 1.0], [0.0, 0.0]]])
        mask = jnp.asarray([[True, False]])
        assert float(coords_l1_loss(pred, tgt, mask)) == pytest.approx(0.5)

    def test_matches_torch_l1(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        pred = rng.uniform(size=(3, 10, 2)).astype(np.float32)
        tgt = rng.uniform(size=(3, 10, 2)).astype(np.float32)
        mask = rng.uniform(size=(3, 10)) > 0.5
        ours = float(coords_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                    jnp.asarray(mask)))
        m = torch.from_numpy(mask)
        ref = F.l1_loss(torch.from_numpy(pred)[m], torch.from_numpy(tgt)[m]).item()
        assert ours == pytest.approx(ref, rel=1e-6)


class TestCriterion:
    def test_aux_losses_and_total(self):
        cfg = tiny_test_config()
        rng = np.random.default_rng(0)
        B, L = 2, cfg.seq_len
        outputs = {
            "pred_logits": jnp.asarray(rng.normal(size=(B, L, 3)), jnp.float32),
            "pred_coords": jnp.asarray(rng.uniform(size=(B, L, 2)), jnp.float32),
            "aux_classes": jnp.asarray(rng.normal(size=(1, B, L, 3)), jnp.float32),
            "aux_coords": jnp.asarray(rng.uniform(size=(1, B, L, 2)), jnp.float32),
        }
        labels = np.full((B, L), -1, np.int32)
        labels[:, :5] = 0
        labels[:, 5] = 2
        vis = np.zeros((B, L), bool)
        vis[:, :6] = True
        targets = {
            "token_labels": jnp.asarray(labels),
            "visibility_mask": jnp.asarray(vis),
            "target_seq": jnp.asarray(rng.uniform(size=(B, L, 2)), jnp.float32),
        }
        losses = cape_criterion(outputs, targets, cfg)
        assert {"loss_ce", "loss_coords", "loss_ce_0", "loss_coords_0",
                "total"} <= set(losses)
        expect = (cfg.cls_loss_coef * (losses["loss_ce"] + losses["loss_ce_0"])
                  + cfg.coords_loss_coef * (losses["loss_coords"]
                                            + losses["loss_coords_0"]))
        assert float(losses["total"]) == pytest.approx(float(expect), rel=1e-6)

    def test_invisible_keypoints_do_not_contribute(self):
        cfg = tiny_test_config()
        B, L = 1, cfg.seq_len
        logits = np.zeros((B, L, 3), np.float32)
        coords = np.zeros((B, L, 2), np.float32)
        labels = np.full((B, L), -1, np.int32)
        labels[0, :3] = 0
        labels[0, 3] = 2
        tseq = np.zeros((B, L, 2), np.float32)
        tseq[0, 1] = 5.0  # huge target on the INVISIBLE keypoint
        vis = np.zeros((B, L), bool)
        vis[0, [0, 2, 3]] = True  # keypoint 1 invisible
        out = {"pred_logits": jnp.asarray(logits), "pred_coords": jnp.asarray(coords)}
        tg = {"token_labels": jnp.asarray(labels),
              "visibility_mask": jnp.asarray(vis),
              "target_seq": jnp.asarray(tseq)}
        cfg2 = cfg.replace(aux_loss=False)
        l = cape_criterion(out, tg, cfg2)
        assert float(l["loss_coords"]) == pytest.approx(0.0)  # masked out
