"""Native host-op kernels (cape_tpu/native) vs their numpy references.

The C++ fused BCS jitter must be numerically interchangeable with the
numpy implementation in `data/augment.py::_color_jitter` — same fused
linear transform, float32 math, clip-then-truncate — so the loader can
switch paths freely without perturbing training. Tolerance is 1 uint8
step: the only permitted divergence is the summation order of the global
image mean (double accumulator vs numpy pairwise-f32), which can move a
value across a truncation boundary.
"""

import numpy as np
import pytest

from cape_tpu import native


def _numpy_bcs(img, b, c, s):
    x = img.astype(np.float32)
    m = b * x.mean()
    gray = x.mean(axis=-1, keepdims=True)
    x = (s * c * b) * x + ((1.0 - s) * c * b) * gray + m * (1.0 - c)
    return np.clip(x, 0, 255).astype(np.uint8)


needs_native = pytest.mark.skipif(
    not native.available(), reason="native hostops unavailable (no g++?)"
)


@needs_native
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_bcs_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(3, 200)), int(rng.integers(3, 200))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    b, c, s = (float(rng.uniform(0.5, 1.5)) for _ in range(3))
    got = native.fused_bcs(img, b, c, s)
    want = _numpy_bcs(img, b, c, s)
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1, f"max diff {diff.max()} (>1 uint8 step)"
    # and nearly all pixels identical (boundary crossings are rare)
    assert (diff > 0).mean() < 0.01


@needs_native
def test_fused_bcs_identity_params():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    out = native.fused_bcs(img, 1.0, 1.0, 1.0)
    np.testing.assert_array_equal(out, img)


@needs_native
def test_fused_bcs_saturates_not_wraps():
    img = np.full((16, 16, 3), 250, dtype=np.uint8)
    out = native.fused_bcs(img, 1.5, 1.0, 1.0)  # pushes past 255
    assert out.max() == 255 and out.min() == 255
    out = native.fused_bcs(img, 0.0, 2.0, 1.0)  # pushes below 0
    assert (out <= 255).all()


@needs_native
def test_fused_bcs_noncontiguous_input():
    rng = np.random.default_rng(1)
    big = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
    view = big[::2, ::2]  # non-contiguous
    got = native.fused_bcs(view, 1.2, 0.9, 1.1)
    want = _numpy_bcs(np.ascontiguousarray(view), 1.2, 0.9, 1.1)
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1


def test_color_jitter_native_and_numpy_paths_agree(monkeypatch):
    """The full _color_jitter (incl. hue) gives the same output whichever
    backend runs — same rng draw order, near-identical pixels."""
    from cape_tpu.data import augment

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (96, 70, 3), dtype=np.uint8)

    out_native = augment._color_jitter(img, np.random.default_rng(5))
    monkeypatch.setattr(augment._native, "fused_bcs", lambda *a: None)
    out_numpy = augment._color_jitter(img, np.random.default_rng(5))

    diff = np.abs(out_native.astype(np.int16) - out_numpy.astype(np.int16))
    # hue shift quantizes both paths identically; only the BCS boundary
    # truncation can differ, and the HSV round-trip can locally amplify a
    # 1-step input difference
    assert diff.max() <= 4
    assert (diff > 1).mean() < 0.01


def test_disabled_via_env(monkeypatch):
    monkeypatch.setenv("CAPE_NATIVE", "0")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    assert native.fused_bcs(np.zeros((4, 4, 3), np.uint8), 1, 1, 1) is None
    monkeypatch.setattr(native, "_tried", False)  # restore lazy state
