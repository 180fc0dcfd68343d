"""ResNet-50 backbone with frozen batch-norm, NHWC, XLA convolutions.

Re-design of `models/backbone.py:41-104`: torchvision's ResNet with
`FrozenBatchNorm2d` becomes a flax ResNet whose normalization layers are
plain per-channel affine transforms (`FrozenAffine`) — exactly what a
frozen BN evaluates to (`backbone.py:32-40`: y = x * scale + bias with
scale/bias folded from weight/bias/running stats). The affine parameters
live in the regular param tree but under a `frozen_affine` name so the
optimizer can exclude them (parity: the reference never trains BN stats).

Returns feature levels from layer2/3/4 (strides 8/16/32, channels
512/1024/2048, `backbone.py:47-54`).

ImageNet initialization: `load_torch_resnet50_npz` converts a saved torch
state_dict (exported to .npz) into this param tree, folding BN stats into
the affine. Without a weights file the net trains from scratch (He init +
zero-init on each bottleneck's last affine scale for stable deep training).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class FrozenAffine(nn.Module):
    """Per-channel y = x * scale + bias; the inference form of frozen BN."""

    features: int
    zero_init_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init_scale = nn.initializers.zeros if self.zero_init_scale else nn.initializers.ones
        scale = self.param("frozen_affine_scale", init_scale, (self.features,))
        bias = self.param("frozen_affine_bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
          dilation=1):
    pad = dilation * (kernel // 2)
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad)] * 2, kernel_dilation=(dilation, dilation),
        use_bias=False,
        kernel_init=nn.initializers.he_normal(), dtype=dtype, name=name,
    )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with frozen-affine norms."""

    features: int            # bottleneck width; output = 4x
    stride: int = 1
    downsample: bool = False
    dilation: int = 1        # 3x3 conv dilation (DC5 mode, `backbone.py:77`)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 1, 1, "conv1", self.dtype)(x)
        out = FrozenAffine(self.features, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.stride, "conv2", self.dtype,
                    dilation=self.dilation)(out)
        out = FrozenAffine(self.features, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, 1, "conv3", self.dtype)(out)
        # zero-init the last affine scale so a fresh residual block is an
        # identity map (standard from-scratch ResNet trick; a converted
        # torchvision checkpoint overwrites it anyway)
        out = FrozenAffine(self.features * 4, zero_init_scale=True,
                           dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.stride,
                             "downsample_conv", self.dtype)(x)
            identity = FrozenAffine(self.features * 4, dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Returns (layer2, layer3, layer4) feature maps, NHWC."""

    input_channels: int = 3
    dtype: jnp.dtype = jnp.float32
    block_counts: Sequence[int] = (3, 4, 6, 3)
    # DC5: layer4 keeps stride 16 with dilated 3x3 convs
    # (`backbone.py:72-84`, replace_stride_with_dilation=[F, F, dilation])
    dilation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype, name="conv1")(x)
        x = FrozenAffine(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        widths = (64, 128, 256, 512)
        for li, (count, width) in enumerate(zip(self.block_counts, widths)):
            dilate_layer = self.dilation and li == 3
            stride = 1 if (li == 0 or dilate_layer) else 2
            for bi in range(count):
                # torchvision replace_stride_with_dilation semantics: the
                # layer's FIRST block keeps the previous dilation (1) with
                # stride replaced by 1; subsequent blocks dilate by 2.
                dil = 2 if (dilate_layer and bi > 0) else 1
                x = Bottleneck(
                    width,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    dilation=dil,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_block{bi}",
                )(x)
            if li >= 1:  # layer2, layer3, layer4
                feats.append(x)
        return tuple(feats)


def load_torch_resnet50_npz(params: dict, npz_path: str) -> dict:
    """Fold a torchvision resnet50 state_dict (saved as .npz) into params.

    See `load_torch_resnet50_state` for the key contract.
    """
    return load_torch_resnet50_state(params, dict(np.load(npz_path)))


def load_torch_resnet50_state(params: dict, sd: dict) -> dict:
    """Fold a torchvision resnet50 state_dict ({key: np.ndarray}) into params.

    Expects keys like 'conv1.weight', 'layer1.0.conv1.weight',
    'layer1.0.bn1.{weight,bias,running_mean,running_var}'. Conv kernels are
    transposed OIHW -> HWIO; BN folds to scale = w/sqrt(var+eps),
    bias = b - mean*scale (`backbone.py:32-40`).
    """
    import copy

    out = copy.deepcopy(params)
    eps = 1e-5

    def fold_bn(prefix):
        w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
        rm, rv = sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"]
        scale = w / np.sqrt(rv + eps)
        return scale.astype(np.float32), (b - rm * scale).astype(np.float32)

    def set_conv(tree, torch_key):
        tree["kernel"] = np.transpose(sd[torch_key], (2, 3, 1, 0)).astype(np.float32)

    def set_bn(tree, prefix):
        s, b = fold_bn(prefix)
        tree["frozen_affine_scale"] = s
        tree["frozen_affine_bias"] = b

    if sd["conv1.weight"].shape[1] == out["conv1"]["kernel"].shape[2]:
        set_conv(out["conv1"], "conv1.weight")
    set_bn(out["bn1"], "bn1")
    counts = (3, 4, 6, 3)
    for li, count in enumerate(counts):
        for bi in range(count):
            t = f"layer{li + 1}.{bi}"
            f = out[f"layer{li + 1}_block{bi}"]
            for c in ("conv1", "conv2", "conv3"):
                set_conv(f[c], f"{t}.{c}.weight")
            for bn in ("bn1", "bn2", "bn3"):
                set_bn(f[bn], f"{t}.{bn}")
            if f"{t}.downsample.0.weight" in sd:
                set_conv(f["downsample_conv"], f"{t}.downsample.0.weight")
                set_bn(f["downsample_bn"], f"{t}.downsample.1")
    return out
