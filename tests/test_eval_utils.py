"""PCK metric + keypoint-extraction tests (ports the reference's
`test_pck_pipeline.py` invariants: PCK math, bbox normalization options,
leak detection, trim/pad extraction)."""

import numpy as np
import pytest

from cape_tpu.eval import PCKEvaluator, compute_pck_bbox
from cape_tpu.eval.evaluate import extract_gt_keypoints, extract_pred_keypoints
from cape_tpu.utils.sequence import (
    compare_pred_gt_keypoints,
    extract_keypoints_from_predictions,
)


class TestPCK:
    def test_perfect_predictions_warn_leak(self):
        gt = np.array([[10.0, 10.0], [50.0, 50.0]])
        with pytest.warns(RuntimeWarning, match="identical"):
            pck, c, v = compute_pck_bbox(gt, gt, 100, 100)
        assert pck == 1.0 and c == 2 and v == 2

    def test_threshold_diagonal(self):
        gt = np.array([[0.0, 0.0]])
        # diagonal = sqrt(100^2+100^2) ~ 141.4; threshold 0.2 -> 28.28 px
        near = np.array([[20.0, 20.0]])   # dist 28.28 -> NOT < threshold
        pck, _, _ = compute_pck_bbox(near, gt, 100, 100)
        assert pck == 0.0
        near2 = np.array([[19.0, 19.0]])  # dist 26.87 -> correct
        pck2, _, _ = compute_pck_bbox(near2, gt, 100, 100)
        assert pck2 == 1.0

    def test_visibility_excluded(self):
        gt = np.array([[0.0, 0.0], [50.0, 50.0]])
        pred = np.array([[0.0, 1.0], [500.0, 500.0]])  # 2nd way off
        pck, c, v = compute_pck_bbox(pred, gt, 100, 100,
                                     visibility=np.array([2, 0]))
        assert v == 1 and c == 1 and pck == 1.0

    def test_normalize_modes(self):
        gt = np.array([[0.0, 0.0]])
        pred = np.array([[15.0, 0.0]])
        # bbox 100x50: diag=111.8 (thr 22.4->correct), max=100 (20->correct),
        # mean=75 (15 -> NOT <)
        assert compute_pck_bbox(pred, gt, 100, 50, normalize_by="diagonal")[0] == 1
        assert compute_pck_bbox(pred, gt, 100, 50, normalize_by="max")[0] == 1
        assert compute_pck_bbox(pred, gt, 100, 50, normalize_by="mean")[0] == 0

    def test_evaluator_micro_macro(self):
        ev = PCKEvaluator()
        gt = np.zeros((4, 2))
        good = gt + 1.0
        bad = gt + 1000.0
        ev.add_sample(good, gt, 100, 100, category_id=1)   # 4/4
        ev.add_sample(bad, gt, 100, 100, category_id=2)    # 0/4
        r = ev.get_results()
        assert r["pck_overall"] == pytest.approx(0.5)
        assert r["mean_pck_categories"] == pytest.approx(0.5)
        assert r["pck_per_category"] == {1: 1.0, 2: 0.0}
        assert r["num_images"] == 2


class TestExtraction:
    def test_pred_extraction_trims_and_pads(self):
        B, L = 2, 10
        logits = np.zeros((B, L, 3), np.float32)
        logits[..., 1] = 1.0  # default sep
        # sample 0: coords at 0,1,2 then eos; expected 2 -> trim
        logits[0, :3, 0] = 5.0
        logits[0, 3, 2] = 9.0
        # sample 1: coord at 0 then eos; expected 3 -> pad with zeros
        logits[1, 0, 0] = 5.0
        logits[1, 1, 2] = 9.0
        coords = np.tile(np.arange(L)[None, :, None], (B, 1, 2)).astype(np.float32)
        active = np.ones((B, L), bool)
        active[0, 4:] = False
        active[1, 2:] = False
        out = extract_pred_keypoints(logits, coords, active, np.array([2, 3]))
        np.testing.assert_allclose(out[0], [[0, 0], [1, 1]])
        np.testing.assert_allclose(out[1], [[0, 0], [0, 0], [0, 0]])

    def test_post_eos_positions_ignored(self):
        B, L = 1, 6
        logits = np.zeros((B, L, 3), np.float32)
        logits[0, 0, 0] = 5.0  # coord
        logits[0, 1, 2] = 5.0  # eos
        # garbage after EOS argmaxes to coord (zeros -> class 0)
        coords = np.ones((B, L, 2), np.float32) * 7
        coords[0, 0] = [0.5, 0.5]
        active = np.array([[True, True, False, False, False, False]])
        out = extract_pred_keypoints(logits, coords, active, np.array([1]))
        np.testing.assert_allclose(out[0], [[0.5, 0.5]])

    def test_gt_extraction_uses_gt_labels(self):
        L = 8
        targets = {
            "target_seq": np.zeros((1, L, 2), np.float32),
            "token_labels": np.full((1, L), -1, np.int32),
        }
        targets["token_labels"][0, :3] = 0
        targets["token_labels"][0, 3] = 2
        targets["target_seq"][0, :3] = [[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]]
        out = extract_gt_keypoints(targets, np.array([3]))
        np.testing.assert_allclose(out[0], [[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]])

    def test_sequence_utils_pred_extraction(self):
        logits = np.zeros((1, 4, 3), np.float32)
        logits[0, [0, 2], 0] = 3.0
        logits[0, 1, 1] = 3.0
        logits[0, 3, 2] = 3.0
        coords = np.arange(8, dtype=np.float32).reshape(1, 4, 2)
        out = extract_keypoints_from_predictions(coords, logits)
        np.testing.assert_allclose(out[0], [[0, 1], [4, 5]])

    def test_leak_detector(self):
        a = np.random.default_rng(0).uniform(size=(5, 2))
        with pytest.warns(RuntimeWarning):
            assert compare_pred_gt_keypoints(a, a.copy())
        assert not compare_pred_gt_keypoints(a, a + 0.1)


def test_debug_env_toggles(monkeypatch, capsys):
    """The reference's DEBUG_* env family (SURVEY §5.5): toggles are off by
    default and emit tagged lines when set to 1."""
    from cape_tpu.utils.debug import dbg, debug_enabled

    monkeypatch.delenv("DEBUG_PCK", raising=False)
    assert not debug_enabled("DEBUG_PCK")
    dbg("DEBUG_PCK", "hidden")
    assert capsys.readouterr().out == ""

    monkeypatch.setenv("DEBUG_PCK", "1")
    assert debug_enabled("DEBUG_PCK")
    dbg("DEBUG_PCK", "visible")
    assert "[DEBUG_PCK] visible" in capsys.readouterr().out
