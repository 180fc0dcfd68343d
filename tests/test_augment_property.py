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
