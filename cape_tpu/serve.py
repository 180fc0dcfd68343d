"""Serving API: checkpoint -> keypoint predictions on raw images.

The reference has no inference surface beyond its eval script — running a
trained model on new images means hand-assembling tensors against
`RoomFormerV2.forward_inference` (`roomformer_v2.py:385-677`). This module
packages the full path: load a self-describing checkpoint once, then
`predict()` raw RGB images + a support-keypoint prototype and get pixel
keypoints back in the original image frame.

Design for TPU serving:
- one jitted decode per (model, batch) shape, cached in jax's jit cache
  (`cape_tpu.eval.evaluate._decode_jit`);
- requests pad to a fixed `batch_size` so every call hits the compiled
  executable (padding rows are dropped from the results);
- preprocessing (optional bbox crop, resize, normalization) and
  postprocessing (trim to the category keypoint count, map back through
  resize + crop into original pixel coordinates) on the host.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .config import CAPEConfig
from .data.augment import resize_with_keypoints
from .data.token_types import TokenType


class CAPEPredictor:
    """Category-agnostic pose estimation on raw images.

    Usage:
        predictor = CAPEPredictor.from_checkpoint("output/.../best_...")
        results = predictor.predict(
            images=[img_hwc_uint8, ...],          # raw RGB
            support_coords=proto,                  # (N, 2) in [0, 1]
            skeleton=[[0, 1], [1, 2], ...],        # 0-indexed edges
            bboxes=[(x, y, w, h), ...],            # optional crops
        )
        results[i]["keypoints"]  # (N, 2) pixels in the original frame
    """

    def __init__(self, cfg: CAPEConfig, params, batch_size: int = 8):
        from .models import CAPE

        self.cfg = cfg.replace(dropout=0.0)
        self.model = CAPE(self.cfg)
        self.params = params
        self.batch_size = max(1, batch_size)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, checkpoint: str,
                        batch_size: int = 8) -> "CAPEPredictor":
        """Load a self-describing checkpoint directory (epoch_N / best_*)."""
        import jax

        from .models import CAPE
        from .train.state import create_train_state
        from .utils.checkpoint import CheckpointManager

        with open(os.path.join(checkpoint, "meta.json")) as f:
            meta = json.load(f)
        cfg = CAPEConfig.from_json(json.dumps(meta["config"]))

        model = CAPE(cfg)
        S = cfg.image_size
        probe_img = np.zeros((1, S, S, 3), np.uint8)
        probe_sc = np.zeros((1, cfg.max_support_keypoints, 2), np.float32)
        probe_sm = np.zeros((1, cfg.max_support_keypoints), bool)
        probe_se = np.full((1, cfg.max_skeleton_edges, 2), -1, np.int32)
        from .data.tokenizer import DiscreteTokenizer, tokenize_keypoints

        tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
        t = tokenize_keypoints(tok, np.full((2, 2), S / 2.0), S, S)
        probe_t = {k: v[None] for k, v in t.items()}
        variables = model.init(jax.random.PRNGKey(0), probe_img, probe_sc,
                               probe_sm, probe_se, probe_t)
        state = create_train_state(cfg, variables, steps_per_epoch=1)
        mgr = CheckpointManager(os.path.dirname(os.path.abspath(checkpoint)))
        state, _ = mgr.restore(checkpoint, state)
        return cls(cfg, state.params, batch_size=batch_size)

    # ------------------------------------------------------------------
    def _prepare(self, image: np.ndarray, bbox) -> Dict:
        """Crop/resize one image; return model input + the inverse map."""
        img = np.asarray(image)
        if img.dtype != np.uint8:
            raise ValueError(f"expected uint8 RGB image, got {img.dtype}")
        H, W = img.shape[:2]
        if bbox is not None:
            from .data.mp100 import clamp_bbox

            bx, by, bw, bh = clamp_bbox(bbox, W, H)
            img = img[by: by + bh, bx: bx + bw]
        else:
            bx, by, bw, bh = 0, 0, W, H
        S = self.cfg.image_size
        resized, _ = resize_with_keypoints(img, np.zeros((0, 2)), S)
        # ship uint8; the model normalizes on device (incl. cfg.image_norm,
        # which the old host-side /255 silently skipped)
        # inverse map: model [0,1] coords -> original pixels
        return {
            "input": resized,
            "origin": (float(bx), float(by)),
            "scale": (bw / float(S), bh / float(S)),
        }

    def predict(
        self,
        images: Sequence[np.ndarray],
        support_coords: np.ndarray,
        skeleton: Optional[Sequence[Sequence[int]]] = None,
        support_visibility: Optional[np.ndarray] = None,
        bboxes: Optional[Sequence] = None,
    ) -> List[Dict]:
        """Predict keypoints for a batch of query images of ONE category.

        Args:
            images: raw (H, W, 3) uint8 RGB images (any sizes).
            support_coords: category prototype in [0, 1] — (N, 2) for
                1-shot, or (K_shots, N, 2) for the reference's K-shot
                protocol (5-shot mean-pool of coords + `any` of masks,
                `episodic_sampler.py:434-442`).
            skeleton: 0-indexed edge list (optional).
            support_visibility: COCO flags, (N,) or (K_shots, N) matching
                `support_coords`; default all-visible.
            bboxes: per-image (x, y, w, h) instance boxes (optional).
        Returns:
            per image: dict(keypoints (N, 2) float64 pixels in the ORIGINAL
            frame, generated (N,) bool — False rows are zero-padded because
            the model stopped early, length int).
        """
        from .eval.evaluate import _decode_jit, extract_pred_keypoints

        cfg = self.cfg
        sc = np.asarray(support_coords, np.float32)
        if sc.ndim == 2:
            sc = sc[None]                                   # 1-shot
        if sc.ndim != 3 or sc.shape[-1] != 2:
            raise ValueError(
                f"support_coords must be (N, 2) or (K, N, 2), got {sc.shape}")
        shots, N = sc.shape[0], sc.shape[1]
        K = cfg.max_support_keypoints
        if N > K:
            raise ValueError(f"{N} support keypoints > static max {K}")
        if bboxes is not None and len(bboxes) != len(images):
            raise ValueError("bboxes length must match images")

        vis = (np.full((shots, N), 2) if support_visibility is None
               else np.asarray(support_visibility))
        if vis.ndim == 1:
            vis = np.broadcast_to(vis, (shots, N))
        if vis.shape != (shots, N):
            raise ValueError(
                f"support_visibility {vis.shape} must match "
                f"support_coords shots/keypoints ({shots}, {N})")

        # K-shot aggregation, exactly as the training/eval collate
        # (`cape_tpu.data.episodic`, reference `episodic_sampler.py:434-442`):
        # mean over shot coords, `any` over True=ignore masks
        per_shot_coords = np.zeros((shots, K, 2), np.float32)
        per_shot_coords[:, :N] = np.clip(sc, 0.0, 1.0)
        per_shot_mask = np.ones((shots, K), bool)
        per_shot_mask[:, :N] = vis == 0
        coords = per_shot_coords.mean(axis=0)
        mask = per_shot_mask.any(axis=0)

        edges = np.full((cfg.max_skeleton_edges, 2), -1, np.int32)
        if skeleton:
            se = np.asarray(list(skeleton), np.int32)[: cfg.max_skeleton_edges]
            edges[: len(se)] = se

        prepped = [
            self._prepare(img, bboxes[i] if bboxes is not None else None)
            for i, img in enumerate(images)
        ]

        results: List[Dict] = []
        B = self.batch_size
        # support prototype is shared by every chunk — broadcast once
        coords_b = np.broadcast_to(coords, (B,) + coords.shape)
        mask_b = np.broadcast_to(mask, (B,) + mask.shape)
        edges_b = np.broadcast_to(edges, (B,) + edges.shape)
        for start in range(0, len(prepped), B):
            chunk = prepped[start: start + B]
            n_real = len(chunk)
            while len(chunk) < B:  # pad to the compiled batch size
                chunk.append(chunk[-1])
            batch_imgs = np.stack([c["input"] for c in chunk])
            out = _decode_jit(
                self.model, {"params": self.params}, batch_imgs,
                coords_b, mask_b, edges_b,
            )
            logits = np.asarray(out["pred_logits"], np.float32)
            pcoords = np.asarray(out["pred_coords"], np.float32)
            lengths = np.asarray(out["lengths"])
            active = (np.arange(logits.shape[1])[None, :]
                      < lengths[:, None])
            kpts = extract_pred_keypoints(
                logits, pcoords, active, np.full((B,), N))
            gen = [
                (np.arange(N) < int(
                    ((logits[i].argmax(-1) == TokenType.coord)
                     & active[i]).sum()))
                for i in range(B)
            ]
            for i in range(n_real):
                ox, oy = chunk[i]["origin"]
                sx, sy = chunk[i]["scale"]
                pix = kpts[i].astype(np.float64) * cfg.image_size
                pix[:, 0] = pix[:, 0] * sx + ox
                pix[:, 1] = pix[:, 1] * sy + oy
                results.append({
                    "keypoints": pix,
                    "generated": gen[i],
                    "length": int(lengths[i]),
                })
        return results
