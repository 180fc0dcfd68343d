#!/usr/bin/env python
"""Export torchvision ImageNet ResNet-50 weights to the .npz format
`cape_tpu.models.backbone.load_torch_resnet50_npz` consumes.

Run this on a machine with torchvision installed (it is not needed — and
not present — in the TPU training container):

    python scripts/export_resnet_weights.py resnet50_imagenet.npz

then train with `--resnet_weights resnet50_imagenet.npz`. The loader folds
the BatchNorm statistics into frozen affine scale/bias pairs (the
reference's FrozenBatchNorm2d, `models/backbone.py:13-40`).

npz schema (= the raw torchvision resnet50 state_dict, one array per key):
    conv1.weight                      (64, 3, 7, 7)   OIHW float32
    bn{1}.{weight,bias,running_mean,running_var}      (C,) float32
    layer{1-4}.{i}.conv{1,2,3}.weight                 OIHW float32
    layer{1-4}.{i}.bn{1,2,3}.*                        (C,) float32
    layer{1-4}.{i}.downsample.0.weight / .1.*         (first block only)
    fc.{weight,bias}, *.num_batches_tracked           present, ignored
The loader transposes conv kernels OIHW->HWIO and folds each BN to
scale = weight/sqrt(running_var + 1e-5), bias = bias - running_mean*scale.
`tests/test_backbone_weights.py::test_converted_backbone_matches_torch_forward`
pins this schema end-to-end against a functional torch forward.
"""

from __future__ import annotations

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", help="output .npz path")
    p.add_argument("--weights", default="IMAGENET1K_V1",
                   help="torchvision weights enum name")
    args = p.parse_args()

    try:
        import torchvision
    except ImportError:
        sys.exit("torchvision is required for the export (run this on a "
                 "dev machine, not the TPU container): pip install "
                 "torchvision, then retry")
    import numpy as np

    weights = getattr(torchvision.models.ResNet50_Weights, args.weights)
    model = torchvision.models.resnet50(weights=weights)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez(args.out, **sd)
    print(f"Wrote {len(sd)} arrays to {args.out}")
    print("Use with: python -m cape_tpu.cli.train --resnet_weights "
          f"{args.out} ...")


if __name__ == "__main__":
    main()
