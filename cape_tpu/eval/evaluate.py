"""Autoregressive validation/test evaluation with PCK@0.2.

Parity with `evaluate_cape` / `evaluate_unseen_categories`
(`models/engine_cape.py:394-1114`):

- predictions are generated autoregressively (never teacher-forced);
- GT keypoints come from the target sequence via GT token labels, predicted
  keypoints from PREDICTED token labels (argmax of the class head,
  `engine_cape.py:643-662` / `util/sequence_utils.py:8-65`);
- per-sample predictions are trimmed/zero-padded to the category's keypoint
  count (`engine_cape.py:743-798`);
- keypoints scale from [0,1] to image pixels (x image_size) before PCK
  against original-bbox dimensions (`engine_cape.py:815-828`);
- micro + macro PCK with per-category breakdown.

Deviations (documented):
- token positions after a sample's own EOS are excluded from extraction via
  the `active` mask. The reference can include a few post-EOS garbage
  tokens when a sample under-generates (its extraction has no per-sample
  active mask) — masking is strictly more faithful to "what the model
  generated".
- the optional validation loss is computed teacher-forced (standard
  practice); the reference pads the autoregressive outputs to seq_len and
  scores those against the targets (`engine_cape.py:535-582`), which mixes
  generation drift into the loss. Early stopping keys on PCK in both.
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..config import CAPEConfig
from ..data.token_types import TokenType
from ..models.cape import CAPE, autoregressive_decode
from ..utils.debug import debug_enabled
from ..utils.logging import MetricLogger
from .pck import PCKEvaluator


def extract_pred_keypoints(
    pred_logits: np.ndarray,   # (B, L, 3)
    pred_coords: np.ndarray,   # (B, L, 2)
    active: np.ndarray,        # (B, L) True while sample unfinished
    expected_counts: np.ndarray,  # (B,)
):
    """Ragged extraction: coords at positions predicted `coord`, in order,
    trimmed/zero-padded to the category keypoint count."""
    labels = pred_logits.argmax(-1)
    out = []
    for i in range(pred_logits.shape[0]):
        sel = (labels[i] == TokenType.coord) & active[i]
        kpts = pred_coords[i][sel]
        n = int(expected_counts[i])
        if len(kpts) >= n:
            kpts = kpts[:n]
        else:
            kpts = np.concatenate(
                [kpts, np.zeros((n - len(kpts), 2), kpts.dtype)], axis=0
            )
        out.append(kpts)
    return out


def extract_gt_keypoints(targets: Dict[str, np.ndarray],
                         expected_counts: np.ndarray):
    """GT coords via GT token labels (coord positions are the first N)."""
    coords = np.asarray(targets["target_seq"])
    labels = np.asarray(targets["token_labels"])
    out = []
    for i in range(coords.shape[0]):
        sel = labels[i] == TokenType.coord
        out.append(coords[i][sel][: int(expected_counts[i])])
    return out


@partial(jax.jit, static_argnums=(0, 6))
def _decode_jit(model, params, images, sc, sm, se, max_len=None):
    """Jitted decode keyed on the (hashable) model as a static argument:
    the executable caches in jax's global jit cache, so repeated
    `evaluate_cape` calls (one per validation epoch) reuse one compile
    instead of re-tracing a fresh lambda every time. `max_len` (static)
    is the KV-cache/loop cap — see `autoregressive_decode`."""
    return autoregressive_decode(model, params, images, sc, sm, se,
                                 max_len=max_len)


def evaluate_cape(
    model: CAPE,
    params,
    batches: Iterable[Dict[str, np.ndarray]],
    cfg: CAPEConfig,
    pck_threshold: float = 0.2,
    compute_loss: bool = False,
    eval_loss_fn=None,
    print_freq: int = 0,
    pck_norm: str = "original_bbox",
    gt_structure_fallback: bool = False,
    multihost: bool = False,
    decode_max_len: "int | None" = None,
) -> Dict:
    """Run autoregressive eval over episode batches. Returns stats dict with
    pck, pck_mean_categories, per-category PCK, counts (+ losses).

    `pck_norm` selects the reference's two (inconsistent) normalizations
    (SURVEY.md §7.5): 'original_bbox' divides the pixel distance by the
    ORIGINAL bbox diagonal (`engine_cape.py:743-747, 1028-1063`, the
    engine default — ours too); 'resized' pins the post-resize
    image_size x image_size dims (`eval_cape_checkpoint.py:530-537`).

    `gt_structure_fallback=True` extracts predicted keypoints at the GT
    token-label positions instead of the predicted labels — the reference's
    `evaluate_unseen_categories` fallback (`engine_cape.py:1015-1022`),
    useful for isolating coordinate quality from token-type errors.

    Both the PCK accumulation and the optional teacher-forced loss exclude
    `sample_valid=False` padding rows (static-batch wrap-around episodes).

    `decode_max_len` (static) caps the decode's KV-cache length below
    cfg.seq_len — PCK-identical whenever it exceeds the split's largest
    keypoint count + 1 (EOS), since extraction reads at most
    num_keypoints coords and the per-step math is unchanged; the eval
    CLI computes it from the split by default.

    `multihost=True` (sharded pod evaluation): each host contributes a
    DISJOINT slice of episodes to one SPMD decode over the global mesh
    (batches built via `host_episode_slice` + `global_shard_inputs`); the
    decode outputs and host-side metadata are then all-gathered so every
    host scores the full episode set identically — P-fold less decode work
    than lockstep replication, same PCK on every host (so checkpoint /
    early-stop decisions still agree without extra communication)."""
    if pck_norm not in ("original_bbox", "resized"):
        raise ValueError(f"pck_norm={pck_norm!r}: 'original_bbox'|'resized'")
    evaluator = PCKEvaluator(threshold=pck_threshold)
    logger = MetricLogger()
    decode = partial(_decode_jit, model)

    if multihost:
        from ..parallel import allgather_tree

    n_batches = 0
    for batch in batches:
        out = decode(
            {"params": params} if "params" not in params else params,
            batch["query_images"], batch["support_coords"],
            batch["support_mask"], batch["skeleton_edges"],
            decode_max_len,
        )
        if multihost:
            out = allgather_tree(out)
            meta_keys = ("targets", "category_ids", "bbox_dims",
                         "gt_visibility", "num_keypoints", "sample_valid")
            gathered = allgather_tree(
                {k: batch[k] for k in meta_keys if k in batch})
            batch = dict(batch)
            batch.update(gathered)
        pred_logits = np.asarray(out["pred_logits"], np.float32)
        pred_coords = np.asarray(out["pred_coords"], np.float32)
        valid = np.asarray(batch.get(
            "sample_valid", np.ones(pred_logits.shape[0], bool)))
        # incomplete-generation warning (`roomformer_v2.py:608-621`,
        # WARN_INCOMPLETE_GENERATION env toggle)
        n_unfinished = int((np.asarray(out["unfinished"]) & valid).sum())
        if n_unfinished and os.environ.get("WARN_INCOMPLETE_GENERATION", "1") == "1":
            warnings.warn(
                f"{n_unfinished} sequence(s) hit "
                f"max_len={decode_max_len or cfg.seq_len} "
                f"without predicting EOS — the model may not have learned "
                f"stopping behavior (check EOS weighting/training length).",
                RuntimeWarning,
            )
        # active mask: positions before each sample's EOS
        lengths = np.asarray(out["lengths"])
        active = np.arange(pred_logits.shape[1])[None, :] < lengths[:, None]

        if debug_enabled("DEBUG_KEYPOINT_BUG"):
            # per-step token-type trace of the first real sample, mirroring
            # the reference's generation-loop diagnostic
            # (`roomformer_v2.py:474-528`, first 10 steps)
            i0 = int(np.argmax(valid))
            names = {0: "COORD", 1: "SEP", 2: "EOS"}
            print(f"[DEBUG_KEYPOINT_BUG] sample {i0}: generated "
                  f"{int(lengths[i0])} tokens (max {cfg.seq_len})",
                  flush=True)
            for step in range(min(10, int(lengths[i0]))):
                t = int(pred_logits[i0, step].argmax())
                print(f"  step {step}: {names.get(t, t)} "
                      f"coords={pred_coords[i0, step].round(4).tolist()}",
                      flush=True)

        expected = np.asarray(batch["num_keypoints"])
        if gt_structure_fallback:
            # predicted coords at GT coord positions (the first N steps —
            # GT labels are [coord]*N + eos): token-type mistakes don't
            # shift the extraction (`engine_cape.py:1015-1022`)
            preds = [pred_coords[i, : int(expected[i])]
                     for i in range(pred_coords.shape[0])]
        else:
            preds = extract_pred_keypoints(pred_logits, pred_coords, active,
                                           expected)
        gts = extract_gt_keypoints(batch["targets"], expected)

        bbox = np.asarray(batch["bbox_dims"])
        vis = np.asarray(batch["gt_visibility"])
        cids = np.asarray(batch["category_ids"])
        for i in range(len(preds)):
            if not valid[i]:  # static-batch padding episode
                continue
            n = int(expected[i])
            # reference env-toggle diagnostics (engine_cape.py:40 family)
            if debug_enabled("DEBUG_KEYPOINT_COUNT"):
                print(f"[DEBUG_KEYPOINT_COUNT] cat {int(cids[i])}: "
                      f"generated {int(lengths[i])} tokens vs expected "
                      f"{n} coords + EOS", flush=True)
            if debug_enabled("DEBUG_EXTRACT"):
                n_coord = int(((pred_logits[i].argmax(-1) == TokenType.coord)
                               & active[i]).sum())
                print(f"[DEBUG_EXTRACT] sample {i}: {n_coord} coord tokens "
                      f"-> {'trim' if n_coord > n else 'pad'} to {n}",
                      flush=True)
            gt = gts[i]
            if len(gt) < n:  # safety: pad GT like predictions
                gt = np.concatenate([gt, np.zeros((n - len(gt), 2))], axis=0)
            if pck_norm == "resized":
                bw = bh = float(cfg.image_size)
            else:
                bw, bh = float(bbox[i, 0]), float(bbox[i, 1])
            evaluator.add_sample(
                preds[i] * cfg.image_size,
                gt * cfg.image_size,
                bbox_width=bw,
                bbox_height=bh,
                category_id=int(cids[i]),
                visibility=vis[i, :n],
            )

        if compute_loss and eval_loss_fn is not None:
            losses = eval_loss_fn(params, batch)
            logger.update(**{k: float(v) for k, v in losses.items()})
        n_batches += 1
        if debug_enabled("DEBUG_EVAL") or debug_enabled("DEBUG_PCK"):
            r = evaluator.get_results()
            print(f"[DEBUG_EVAL] batch {n_batches}: "
                  f"{int(valid.sum())} samples, running PCK "
                  f"{r['pck_overall']:.2%} "
                  f"({r['total_correct']}/{r['total_visible']})", flush=True)
        if print_freq and n_batches % print_freq == 0:
            r = evaluator.get_results()
            print(f"[eval] batch {n_batches}: PCK so far "
                  f"{r['pck_overall']:.2%}", flush=True)

    results = evaluator.get_results()
    stats = {k: m.global_avg for k, m in logger.meters.items()}
    stats.update({
        "pck": results["pck_overall"],
        "pck_mean_categories": results["mean_pck_categories"],
        "pck_per_category": results["pck_per_category"],
        "pck_num_correct": results["total_correct"],
        "pck_num_visible": results["total_visible"],
        "num_images": results["num_images"],
    })
    stats.setdefault("loss", 0.0)
    return stats
