"""Property test: geometric augmentation moves image content and keypoints
together. Uses the learnable synthetic fixture (keypoints are drawn as
colored discs) — after `train_augment`, each in-bounds keypoint must still
sit on/near its marker. This is the invariant the reference guards with
albumentations' keypoint_params (`mp100_cape.py:898-941`,
`tests/test_appearance_augmentation.py`)."""

import numpy as np

from cape_tpu.data.augment import train_augment


def make_marker_image(h, w, kpts, radius=4):
    img = np.full((h, w, 3), 30, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for x, y in kpts:
        img[(xx - x) ** 2 + (yy - y) ** 2 <= radius**2] = [255, 255, 255]
    return img


def test_markers_follow_keypoints_through_augmentation():
    rng_data = np.random.default_rng(0)
    h, w, S = 96, 128, 128
    kpts = np.stack([
        rng_data.uniform(12, w - 12, 6), rng_data.uniform(12, h - 12, 6)
    ], axis=1)
    img = make_marker_image(h, w, kpts)

    hits = total = 0
    for seed in range(12):
        aug, k2 = train_augment(img, kpts, S, np.random.default_rng(seed))
        for x, y in k2:
            if 4 <= x < S - 4 and 4 <= y < S - 4:
                total += 1
                # sample a 7x7 patch around the transformed keypoint: the
                # white marker must be there (bilinear warp blurs edges)
                patch = aug[int(y) - 3 : int(y) + 4, int(x) - 3 : int(x) + 4]
                if patch.max() > 150:
                    hits += 1
    assert total > 20, "too few in-bounds keypoints to be meaningful"
    assert hits / total > 0.95, f"markers lost keypoints: {hits}/{total}"


def test_augmentation_is_seed_deterministic():
    rng_data = np.random.default_rng(1)
    img = rng_data.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    kpts = rng_data.uniform(5, 60, (4, 2))
    a1, k1 = train_augment(img, kpts, 64, np.random.default_rng(42))
    a2, k2 = train_augment(img, kpts, 64, np.random.default_rng(42))
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(k1, k2)


def test_hue_shift_invariants():
    """Hue jitter (reference `A.ColorJitter(hue=0.1)`, mp100_cape.py:920-927):
    zero shift is identity; gray pixels are hue-invariant; a shift changes
    colored pixels but preserves shape/dtype."""
    from cape_tpu.data.augment import _hue_shift

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    out0 = _hue_shift(img, 0.0)
    np.testing.assert_array_equal(out0, img)

    gray = np.full((8, 8, 3), 120, np.uint8)
    np.testing.assert_allclose(_hue_shift(gray, 0.1), gray, atol=2)

    colored = np.zeros((8, 8, 3), np.uint8)
    colored[..., 0] = 200  # pure red
    shifted = _hue_shift(colored, 0.25)
    assert shifted.shape == colored.shape and shifted.dtype == np.uint8
    assert np.abs(shifted.astype(int) - colored.astype(int)).max() > 30


def test_color_jitter_never_touches_keypoints():
    """Appearance-only augmentation must leave keypoints bit-identical
    (reference invariant, `tests/test_appearance_augmentation.py`)."""
    from cape_tpu.data.augment import _color_jitter

    rng_data = np.random.default_rng(5)
    img = rng_data.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = _color_jitter(img, np.random.default_rng(7))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # it does something


def test_affine_border_keypoints_tracked_not_dropped():
    """Border behavior (reference edge case, `mp100_cape.py:589-596`):
    albumentations DROPS keypoints pushed out of frame and the reference
    aborts the sample; our pipeline instead keeps every keypoint (index
    correspondence with the skeleton is preserved) with coordinates landing
    outside the frame, clamped later at tokenization. This test pins that
    contract: a hard translate keeps N keypoints, moves them by exactly the
    affine map, and out-of-frame ones stay finite."""
    from cape_tpu.data.augment import _affine_matrix, _apply_affine

    h, w = 64, 96
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    kpts = np.array([[2.0, 2.0], [w - 3.0, h - 3.0], [w / 2, h / 2]])
    # translate far right+down: kpt[1] exits the frame
    m = _affine_matrix(h, w, angle_deg=0.0, scale=1.0,
                       tx_frac=0.4, ty_frac=0.4)
    out, k2 = _apply_affine(img, kpts, m)
    assert k2.shape == kpts.shape  # nothing dropped
    expected = kpts + np.array([0.4 * w, 0.4 * h])
    np.testing.assert_allclose(k2, expected, atol=1e-9)
    assert np.isfinite(k2).all()
    assert (k2[1] >= [w, h]).any()  # genuinely out of frame

    # full pipeline: after resize, clamping at tokenization bounds coords
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints

    tok = DiscreteTokenizer(num_bins=10, seq_len=16)
    t = tokenize_keypoints(tok, k2, 128, 128,
                           visibility=np.array([2, 2, 2]))
    n = len(k2)
    for key in ("seq11", "seq12", "seq21", "seq22"):
        coords_part = t[key][1:1 + n]  # input seqs are BOS-prefixed
        assert (coords_part < 100).all() and (coords_part >= 0).all()
    # normalized targets are clamped into [0,1]
    assert (t["target_seq"][:n] <= 1.0).all() and (t["target_seq"][:n] >= 0.0).all()
