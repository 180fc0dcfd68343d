"""Tokenizer unit tests: vocab layout, 4-corner bilinear tokenization,
visibility masking, EOS-in-loss, round-trip. Golden values hand-computed
from the reference semantics (`datasets/discrete_tokenizer.py`,
`datasets/mp100_cape.py:625-832`)."""

import numpy as np
import pytest

from cape_tpu.data import DiscreteTokenizer, TokenType, tokenize_keypoints


def make_tok(num_bins=10, seq_len=16):
    return DiscreteTokenizer(num_bins=num_bins, seq_len=seq_len)


class TestVocabLayout:
    def test_specials(self):
        tok = make_tok(num_bins=44, seq_len=200)
        assert tok.bos == 1936
        assert tok.eos == 1937
        assert tok.sep == 1938
        assert tok.pad == 1939
        assert tok.vocab_size == 1940  # log `--resume:49-50`
        assert len(tok) == 1940

    def test_default_config_vocab(self):
        from cape_tpu.config import CAPEConfig

        cfg = CAPEConfig()
        assert cfg.num_bins == 44
        assert cfg.token_vocab_size == 1940


class TestCornerIds:
    def test_exact_grid_point(self):
        tok = make_tok()
        q = tok.quantize(np.array([[1.0 / 9, 2.0 / 9]]))  # grid point (1, 2)
        i11, i21, i12, i22, dx, dy = tok.corner_ids(q)
        # floor == ceil at exact grid points
        assert i11[0] == 1 * 10 + 2
        assert i21[0] == i11[0] and i12[0] == i11[0] and i22[0] == i11[0]
        assert dx[0] == pytest.approx(0.0, abs=1e-9)
        assert dy[0] == pytest.approx(0.0, abs=1e-9)

    def test_fractional_point(self):
        tok = make_tok()
        # q = (2.5, 7.25)
        q = np.array([[2.5, 7.25]])
        i11, i21, i12, i22, dx, dy = tok.corner_ids(q)
        assert i11[0] == 2 * 10 + 7
        assert i21[0] == 3 * 10 + 7
        assert i12[0] == 2 * 10 + 8
        assert i22[0] == 3 * 10 + 8
        assert dx[0] == pytest.approx(0.5)
        assert dy[0] == pytest.approx(0.25)

    def test_clamping_out_of_range(self):
        tok = make_tok()
        # coords beyond [0,1] (augmentation overflow) must clamp, never
        # reach special-token ids (`mp100_cape.py` CRITICAL FIX #3).
        q = tok.quantize(np.array([[1.3, -0.2]]))
        i11, i21, i12, i22, dx, dy = tok.corner_ids(q)
        for i in (i11, i21, i12, i22):
            assert 0 <= i[0] < tok.num_bins**2

    def test_round_trip(self):
        tok = make_tok(num_bins=44, seq_len=200)
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 1, size=(100, 2))
        q = tok.quantize(pts)
        i11, _, _, _, dx, dy = tok.corner_ids(q)
        rec = tok.detokenize(i11, dx, dy)
        np.testing.assert_allclose(rec, pts, atol=1e-6)


class TestTokenizeKeypoints:
    def setup_method(self):
        self.tok = make_tok(num_bins=10, seq_len=12)

    def test_sequence_layout(self):
        kpts = np.array([[10.0, 20.0], [30.0, 40.0], [50.0, 60.0]])
        out = tokenize_keypoints(self.tok, kpts, height=100, width=100)
        L = 12
        for k in ("seq11", "seq21", "seq12", "seq22"):
            assert out[k].shape == (L,)
            assert out[k][0] == self.tok.bos
            assert np.all(out[k][4:] == self.tok.pad)
            assert np.all(out[k][1:4] < self.tok.num_bins**2)
        # labels: coord,coord,coord,eos,-1...
        np.testing.assert_array_equal(
            out["token_labels"][:5],
            [TokenType.coord, TokenType.coord, TokenType.coord, TokenType.eos, -1],
        )
        assert out["mask"].sum() == 4
        assert out["target_seq"].shape == (L, 2)
        np.testing.assert_allclose(out["target_seq"][0], [0.1, 0.2], atol=1e-6)
        np.testing.assert_allclose(out["target_seq"][3], [0.0, 0.0])

    def test_visibility_mask_gates_invisible_but_keeps_eos(self):
        kpts = np.array([[10.0, 20.0], [30.0, 40.0], [50.0, 60.0]])
        vis = np.array([2, 0, 1])
        out = tokenize_keypoints(self.tok, kpts, 100, 100, visibility=vis)
        # invisible keypoint (index 1) masked out of the loss
        np.testing.assert_array_equal(
            out["visibility_mask"][:5], [True, False, True, True, False]
        )

    def test_deltas_offset_by_bos(self):
        # q = coord/100*9; choose coords giving known fractions
        kpts = np.array([[50.0, 25.0]])  # q = (4.5, 2.25)
        out = tokenize_keypoints(self.tok, kpts, 100, 100)
        assert out["delta_x1"][0] == 0.0  # BOS slot
        assert out["delta_x1"][1] == pytest.approx(0.5)
        assert out["delta_y1"][1] == pytest.approx(0.25)
        assert out["delta_x2"][1] == pytest.approx(0.5)
        assert out["delta_y2"][1] == pytest.approx(0.75)
        # pads: dx1=0 -> dx2=1 (reference `mp100_cape.py:805-807`)
        assert out["delta_x2"][5] == 1.0

    def test_seq_ids_match_corner_math(self):
        kpts = np.array([[50.0, 25.0]])  # q = (4.5, 2.25)
        out = tokenize_keypoints(self.tok, kpts, 100, 100)
        assert out["seq11"][1] == 4 * 10 + 2
        assert out["seq21"][1] == 5 * 10 + 2
        assert out["seq12"][1] == 4 * 10 + 3
        assert out["seq22"][1] == 5 * 10 + 3

    def test_category_labels(self):
        kpts = np.array([[10.0, 20.0], [30.0, 40.0]])
        out = tokenize_keypoints(self.tok, kpts, 100, 100, category_id=7)
        np.testing.assert_array_equal(out["target_polygon_labels"][:3], [7, 7, -1])

    def test_too_many_keypoints_raises(self):
        kpts = np.zeros((11, 2))
        with pytest.raises(ValueError):
            tokenize_keypoints(self.tok, kpts, 100, 100)

    def test_visibility_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            tokenize_keypoints(
                self.tok, np.zeros((2, 2)), 100, 100, visibility=np.array([1])
            )
