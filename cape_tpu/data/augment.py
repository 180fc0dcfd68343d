"""Host-side appearance + geometric augmentations (numpy/cv2).

Replaces the reference's albumentations pipeline (`mp100_cape.py:898-946`)
with deterministic numpy implementations driven by an explicit
`np.random.Generator`:

- Affine: ±10% translate, 0.85-1.15 scale, ±30° rotate, p=0.7
- Horizontal flip, p=0.5
- Color jitter (brightness/contrast/saturation ±0.3, hue ±0.1), p=0.6
- One of {gaussian noise, gaussian blur, motion blur}, p=0.3
- Deterministic resize to (size, size) with proportional keypoint scaling

Keypoints are transformed with the image and NEVER dropped
(`remove_invisible=False`, `mp100_cape.py:940`) so index correspondence with
skeleton edges is preserved; out-of-frame keypoints simply land outside
[0, size] and are clamped at tokenization time.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from cape_tpu import native as _native

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (h, w)."""
    h, w = size
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    # numpy fallback: nearest sampling (tests only)
    ys = (np.arange(h) * img.shape[0] / h).astype(np.int64)
    xs = (np.arange(w) * img.shape[1] / w).astype(np.int64)
    return img[ys][:, xs]


def resize_with_keypoints(img, keypoints, size: int):
    """Deterministic resize (val/test path, `mp100_cape.py:943-946`)."""
    h, w = img.shape[:2]
    out = _resize(img, (size, size))
    kpts = np.asarray(keypoints, dtype=np.float64).reshape(-1, 2).copy()
    kpts[:, 0] *= size / w
    kpts[:, 1] *= size / h
    return out, kpts


def _affine_matrix(h, w, angle_deg, scale, tx_frac, ty_frac):
    """2x3 affine: rotate+scale about image center, then translate."""
    cx, cy = w / 2.0, h / 2.0
    a = math.radians(angle_deg)
    cos, sin = math.cos(a) * scale, math.sin(a) * scale
    # rotation about center + fractional translation
    m = np.array(
        [
            [cos, -sin, cx - cos * cx + sin * cy + tx_frac * w],
            [sin, cos, cy - sin * cx - cos * cy + ty_frac * h],
        ],
        dtype=np.float64,
    )
    return m


def _apply_affine(img, kpts, m):
    h, w = img.shape[:2]
    if _HAS_CV2:
        out = cv2.warpAffine(
            img, m, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT
        )
    else:  # pragma: no cover - identity fallback
        out = img
    ones = np.ones((kpts.shape[0], 1))
    pts = np.concatenate([kpts, ones], axis=1)  # (N, 3)
    return out, pts @ m.T


def _hue_shift(img: np.ndarray, factor: float) -> np.ndarray:
    """Shift hue by `factor` of the full color circle (uint8 RGB).

    Matches `A.ColorJitter(hue=...)` semantics: factor in [-0.5, 0.5],
    hue channel rotated modulo the circle, S/V untouched.
    """
    if _HAS_CV2:
        shift = int(round(factor * 180.0))
        if shift == 0:  # identity — skip the lossy uint8 HSV round-trip
            return img
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        # one native LUT pass: hue channel rotated mod 180 (OpenCV hue
        # range), S/V identity — replaces an int32 astype+mod round-trip
        lut = np.empty((1, 256, 3), dtype=np.uint8)
        lut[0, :, 0] = (np.arange(256) + shift) % 180
        lut[0, :, 1] = lut[0, :, 2] = np.arange(256)
        return cv2.cvtColor(cv2.LUT(hsv, lut), cv2.COLOR_HSV2RGB)
    # numpy fallback: rotate RGB channels continuously via the YIQ-style
    # chroma rotation (approximate, tests only)
    x = img.astype(np.float32) / 255.0
    angle = 2.0 * math.pi * factor
    cos, sin = math.cos(angle), math.sin(angle)
    # rotation about the gray axis (1,1,1)/sqrt(3)
    one3 = 1.0 / 3.0
    sq3 = math.sqrt(1.0 / 3.0)
    m = np.full((3, 3), one3 * (1.0 - cos), np.float32)
    m += np.eye(3, dtype=np.float32) * cos
    m += sq3 * sin * np.array(
        [[0, -1, 1], [1, 0, -1], [-1, 1, 0]], np.float32)
    out = x @ m.T
    return (np.clip(out, 0.0, 1.0) * 255.0).astype(np.uint8)


def _color_jitter(img, rng, strength=0.3, hue_strength=0.1):
    """Brightness/contrast/saturation/hue jitter on uint8 RGB.

    Strengths match the reference `A.ColorJitter(brightness=0.3,
    contrast=0.3, saturation=0.3, hue=0.1)` (`mp100_cape.py:920-927`).

    Brightness b, contrast c, saturation s compose linearly, so the three
    passes fuse into ONE per-pixel transform (the host loader's hottest
    full-resolution op): with m = b*mean(x) and gray = channel-mean,
        out = (s*c*b)*x + ((1-s)*c*b)*gray(x) + m*(1-c).
    The rng draw order/distributions are unchanged (exact-resume parity).
    """
    b = rng.uniform(1 - strength, 1 + strength)   # brightness
    c = rng.uniform(1 - strength, 1 + strength)   # contrast
    s = rng.uniform(1 - strength, 1 + strength)   # saturation
    # native single-pass C++ kernel (cape_tpu/native): ~30x the numpy path
    # at MP-100 crop sizes and GIL-free under the loader thread pool; the
    # numpy fallback below is numerically identical (same fused transform,
    # float32, clip-then-truncate) up to summation order of the global mean
    x = _native.fused_bcs(img, float(b), float(c), float(s))
    if x is None:
        xf = img.astype(np.float32)
        m = b * xf.mean()
        gray = xf.mean(axis=-1, keepdims=True)
        xf = (s * c * b) * xf + ((1.0 - s) * c * b) * gray + m * (1.0 - c)
        x = np.clip(xf, 0, 255).astype(np.uint8)
    # hue
    factor = rng.uniform(-hue_strength, hue_strength)
    return _hue_shift(x, factor)


def _gauss_noise(img, rng):
    sigma = rng.uniform(5.0, 15.0)
    noise = rng.standard_normal(img.shape, dtype=np.float32) * sigma
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def _gaussian_blur(img, rng):
    if not _HAS_CV2:  # pragma: no cover
        return img
    k = int(rng.choice([3, 5]))
    return cv2.GaussianBlur(img, (k, k), 0)


def _motion_blur(img, rng):
    if not _HAS_CV2:  # pragma: no cover
        return img
    k = int(rng.choice([3, 5]))
    kernel = np.zeros((k, k), dtype=np.float32)
    if rng.uniform() < 0.5:
        kernel[k // 2, :] = 1.0 / k
    else:
        kernel[:, k // 2] = 1.0 / k
    return cv2.filter2D(img, -1, kernel)


def train_augment(img: np.ndarray, keypoints: np.ndarray, size: int, rng: np.random.Generator):
    """Full training augmentation, keypoint-aware.

    Mirrors the reference list (`mp100_cape.py:898-941`): affine -> hflip ->
    color jitter -> one-of noise/blur -> resize(size, size).

    Args:
        img: (H, W, 3) uint8 RGB crop.
        keypoints: (N, 2) pixel coords in crop frame.
        rng: explicit generator (reproducible under a seeded host PRNG).
    Returns:
        (aug_img (size,size,3) uint8, keypoints (N,2) float64 in [0,size] frame)
    """
    kpts = np.asarray(keypoints, dtype=np.float64).reshape(-1, 2).copy()
    h, w = img.shape[:2]

    if rng.uniform() < 0.7:
        m = _affine_matrix(
            h,
            w,
            angle_deg=rng.uniform(-30, 30),
            scale=rng.uniform(0.85, 1.15),
            tx_frac=rng.uniform(-0.1, 0.1),
            ty_frac=rng.uniform(-0.1, 0.1),
        )
        img, kpts = _apply_affine(img, kpts, m)

    if rng.uniform() < 0.5:
        img = img[:, ::-1].copy()
        kpts[:, 0] = (w - 1) - kpts[:, 0]

    if rng.uniform() < 0.6:
        img = _color_jitter(img, rng)

    if rng.uniform() < 0.3:
        img = [_gauss_noise, _gaussian_blur, _motion_blur][int(rng.integers(3))](img, rng)

    return resize_with_keypoints(img, kpts, size)
