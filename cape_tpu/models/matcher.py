"""Hungarian matcher — class+coordinate LSAP matching.

Parity with `models/matcher.py:8-76`. NOT used on the CAPE path (token order
is fixed, `roomformer_v2.py:925-926`); provided for API completeness so
users of the reference find the same component surface.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def hungarian_match(
    pred_logits: np.ndarray,   # (B, Q, C) class logits
    pred_coords: np.ndarray,   # (B, Q, 2)
    target_labels: List[np.ndarray],  # per-sample (Ni,)
    target_coords: List[np.ndarray],  # per-sample (Ni, 2)
    cost_class: float = 1.0,
    cost_coords: float = 5.0,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Per-sample optimal assignment between predictions and targets.

    Returns a list of (pred_indices, target_indices) pairs.
    """
    from scipy.optimize import linear_sum_assignment

    out = []
    B = pred_logits.shape[0]
    for b in range(B):
        probs = _softmax(pred_logits[b])            # (Q, C)
        tl = np.asarray(target_labels[b], np.int64)
        tc = np.asarray(target_coords[b], np.float64)
        if len(tl) == 0:
            out.append((np.array([], np.int64), np.array([], np.int64)))
            continue
        c_class = -probs[:, tl]                     # (Q, N)
        c_coords = np.abs(
            pred_coords[b][:, None, :] - tc[None, :, :]
        ).sum(-1)                                   # (Q, N) L1
        cost = cost_class * c_class + cost_coords * c_coords
        rows, cols = linear_sum_assignment(cost)
        out.append((rows.astype(np.int64), cols.astype(np.int64)))
    return out


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)
