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


def _torch_resnet50_features(sd, x_nchw):
    """Functional torchvision-resnet50 forward (eval-mode BN) driven purely
    by state_dict arrays — the numerical oracle for the converted backbone
    (`/root/reference/models/backbone.py:41-84` uses torchvision resnet50
    with FrozenBatchNorm2d; V1.5 bottleneck: stride on conv2)."""
    import torch
    import torch.nn.functional as F

    def conv(x, key, stride=1, padding=0):
        return F.conv2d(x, torch.from_numpy(sd[key]), None, stride, padding)

    def bn(x, p):
        return F.batch_norm(
            x, torch.from_numpy(sd[f"{p}.running_mean"]),
            torch.from_numpy(sd[f"{p}.running_var"]),
            torch.from_numpy(sd[f"{p}.weight"]),
            torch.from_numpy(sd[f"{p}.bias"]), training=False, eps=1e-5)

    x = F.relu(bn(conv(x_nchw, "conv1.weight", 2, 3), "bn1"))
    x = F.max_pool2d(x, 3, 2, 1)
    feats = []
    for li, count in enumerate((3, 4, 6, 3), start=1):
        for b in range(count):
            t = f"layer{li}.{b}"
            stride = 2 if (li > 1 and b == 0) else 1
            out = F.relu(bn(conv(x, f"{t}.conv1.weight"), f"{t}.bn1"))
            out = F.relu(bn(conv(out, f"{t}.conv2.weight", stride, 1),
                            f"{t}.bn2"))
            out = bn(conv(out, f"{t}.conv3.weight"), f"{t}.bn3")
            if f"{t}.downsample.0.weight" in sd:
                identity = bn(conv(x, f"{t}.downsample.0.weight", stride),
                              f"{t}.downsample.1")
            else:
                identity = x
            x = F.relu(out + identity)
        if li >= 2:
            feats.append(x)
    return feats


def test_converted_backbone_matches_torch_forward(tmp_path):
    """End-to-end oracle for the export->load path (round-3 VERDICT item 4):
    a torchvision-schema state_dict (incl. fc/num_batches_tracked keys the
    real export writes) -> .npz -> load_torch_resnet50_npz -> our NHWC
    forward must reproduce the torch functional forward's three feature
    levels. Covers OIHW->HWIO, BN folding w/ eps, stride placement (V1.5),
    maxpool padding, and downsample wiring in one numerical assertion."""
    import torch

    rng = np.random.default_rng(7)
    sd = fake_torch_resnet50_sd(rng)
    # complete the real torchvision schema: export saves EVERY state_dict
    # entry (scripts/export_resnet_weights.py:38), so the npz also contains
    # the classifier head and BN counters the loader must ignore
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1000,)).astype(np.float32)
    for k in [k for k in sd if k.endswith(".running_mean")]:
        sd[k[: -len(".running_mean")] + ".num_batches_tracked"] = np.asarray(
            100, np.int64)
    npz = str(tmp_path / "resnet50_full.npz")
    np.savez(npz, **sd)

    model = ResNet50(input_channels=3)
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    loaded = load_torch_resnet50_npz(params, npz)
    ours = model.apply({"params": loaded}, jnp.asarray(x))

    ref = _torch_resnet50_features(sd, torch.from_numpy(
        x.transpose(0, 3, 1, 2)))
    assert len(ours) == len(ref) == 3
    for lvl, (o, r) in enumerate(zip(ours, ref)):
        r_nhwc = r.detach().numpy().transpose(0, 2, 3, 1)
        assert o.shape == r_nhwc.shape, f"level {lvl}"
        np.testing.assert_allclose(
            np.asarray(o), r_nhwc, rtol=1e-3, atol=1e-3,
            err_msg=f"feature level {lvl} (stride {8 * 2 ** lvl})")
