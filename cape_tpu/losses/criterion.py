"""CAPE losses: visibility-masked, EOS-weighted token CE + masked coord L1.

Parity with `CAPESetCriterion` (`models/cape_losses.py:39-163`) and the base
`SetCriterion` aux-loss replication (`models/roomformer_v2.py:935-941`):

- token-type cross-entropy over positions where `token_labels != -1` AND
  `visibility_mask`, with class weights [1, 1, eos_weight] and the
  torch `F.cross_entropy(weight=...)` weighted-mean reduction
  (sum(w_i * ce_i) / sum(w_i));
- L1 over coordinate positions gated by the same visibility mask, mean over
  selected *elements* (x and y);
- identical losses per auxiliary decoder layer; total = Σ coef * loss with
  {loss_ce: cls_coef, loss_coords: coords_coef} (`cape_losses.py:164-202`).

Hungarian matching is intentionally absent — token order is fixed
(`roomformer_v2.py:925-926`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import CAPEConfig


def token_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray,
                  eos_weight: float,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """Weighted-mean CE. logits (B, L, C); labels (B, L) with -1 pads;
    mask (B, L) bool selecting supervised positions.

    With `label_smoothing > 0` the reference switches to an UNWEIGHTED
    smoothed NLL (EOS class weight dropped — `cape_losses.py:93-103`,
    `label_smoothed_nll_loss` fallback `cape_losses.py:10-38`); replicated
    here: loss_i = (1-eps)*nll_i + eps/C * sum_c(-logp_ic), plain mean.
    """
    num_classes = logits.shape[-1]
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0:
        eps = float(label_smoothing)
        smooth = -logp.sum(-1) / num_classes
        nll = (1.0 - eps) * nll + eps * smooth
        w = mask.astype(jnp.float32)
    else:
        class_w = jnp.ones((num_classes,), jnp.float32).at[2].set(eos_weight)
        w = class_w[safe_labels] * mask.astype(jnp.float32)
    den = w.sum()
    return jnp.where(den > 0, (nll * w).sum() / jnp.where(den > 0, den, 1.0), 0.0)


def coords_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Masked element-mean L1. pred/target (B, L, 2); mask (B, L)."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    m = mask.astype(jnp.float32)[..., None]
    den = 2.0 * m.sum()
    return jnp.where(den > 0, (diff * m).sum() / jnp.where(den > 0, den, 1.0), 0.0)


def cape_criterion(outputs: Dict, targets: Dict, cfg: CAPEConfig,
                   sample_mask=None) -> Dict[str, jnp.ndarray]:
    """Compute all losses + the weighted total.

    Args:
        outputs: model dict — pred_logits (B, L, 3), pred_coords (B, L, 2),
            optional aux_classes/aux_coords (A, B, L, ...).
        targets: tokenizer contract — token_labels, visibility_mask,
            target_seq.
        sample_mask: optional (B,) bool — False rows contribute nothing
            (static-batch padding episodes in eval, `sample_valid`).
    Returns:
        dict with loss_ce, loss_coords, per-aux-layer loss_{ce,coords}_{i},
        and 'total'.
    """
    labels = targets["token_labels"]
    valid = labels != -1
    vis = targets["visibility_mask"]
    ce_mask = valid & vis
    coord_mask = (labels == 0) & vis
    if sample_mask is not None:
        ce_mask = ce_mask & sample_mask[:, None]
        coord_mask = coord_mask & sample_mask[:, None]
    target_seq = targets["target_seq"]

    losses = {
        "loss_ce": token_ce_loss(outputs["pred_logits"], labels, ce_mask,
                                 cfg.eos_weight, cfg.label_smoothing),
        "loss_coords": coords_l1_loss(outputs["pred_coords"], target_seq,
                                      coord_mask),
    }
    total = cfg.cls_loss_coef * losses["loss_ce"] + \
        cfg.coords_loss_coef * losses["loss_coords"]

    if "aux_classes" in outputs:
        A = outputs["aux_classes"].shape[0]
        for i in range(A):
            lce = token_ce_loss(outputs["aux_classes"][i], labels, ce_mask,
                                cfg.eos_weight, cfg.label_smoothing)
            lco = coords_l1_loss(outputs["aux_coords"][i], target_seq,
                                 coord_mask)
            losses[f"loss_ce_{i}"] = lce
            losses[f"loss_coords_{i}"] = lco
            total = total + cfg.cls_loss_coef * lce + cfg.coords_loss_coef * lco

    losses["total"] = total
    return losses
