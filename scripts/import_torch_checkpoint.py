#!/usr/bin/env python
"""Convert a reference (PyTorch) CAPE checkpoint into a cape_tpu one.

The reference saves `{'model': CAPEModel.state_dict(), 'args': Namespace,
'epoch', 'best_pck'}` (`scripts/eval_cape_checkpoint.py:175-223`). This
tool maps every live tensor onto the cape_tpu `CAPE` param tree
(`cape_tpu/utils/torch_import.py` — the mapping proven by the
weight-transplant parity suites) and writes a standard cape_tpu orbax
checkpoint directory, immediately usable by:

    python -m cape_tpu.cli.evaluate --checkpoint <out>/epoch_N ...
    python -m cape_tpu.cli.train    --resume     <out>/epoch_N ...

Usage:
    python scripts/import_torch_checkpoint.py \
        --torch_checkpoint checkpoint_best.pth --output_dir imported/
    # override any architecture field the pickled args got wrong:
    #   --set image_size=512 --set seq_len=200

Requires torch (CPU is fine) for the unpickling only; the conversion and
the resulting checkpoint are torch-free.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_set(values):
    out = {}
    for item in values or []:
        k, _, v = item.partition("=")
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        if v == "true":
            v = True
        elif v == "false":
            v = False
        out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--torch_checkpoint", required=True,
                    help=".pth file saved by the reference trainer")
    ap.add_argument("--output_dir", required=True,
                    help="cape_tpu checkpoint directory to create")
    ap.add_argument("--set", action="append", metavar="FIELD=VALUE",
                    help="override a CAPEConfig field (repeatable)")
    args = ap.parse_args()

    import torch

    import jax
    from cape_tpu.config import CAPEConfig  # noqa: F401  (docs reference)
    from cape_tpu.models import CAPE
    from cape_tpu.train import create_train_state
    from cape_tpu.utils.checkpoint import CheckpointManager
    from cape_tpu.utils.torch_import import (
        config_from_reference_args,
        import_reference_state_dict,
    )

    print(f"Loading {args.torch_checkpoint} ...")
    ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    sd = {k: v.detach().cpu().numpy() for k, v in ckpt["model"].items()}
    ref_args = vars(ckpt.get("args")) if ckpt.get("args") is not None else {}
    epoch = int(ckpt.get("epoch", 0) or 0)
    best_pck = float(ckpt.get("best_pck", 0.0) or 0.0)
    print(f"  {len(sd)} tensors, epoch={epoch}, best_pck={best_pck}")

    cfg = config_from_reference_args(ref_args, **parse_set(args.set))
    print(f"  config: hidden_dim={cfg.hidden_dim} enc={cfg.enc_layers} "
          f"dec={cfg.dec_layers} seq_len={cfg.seq_len} "
          f"image_size={cfg.image_size}")

    # initialize the target tree, then overwrite every leaf
    model = CAPE(cfg)
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints

    rng = np.random.default_rng(0)
    S, K, E = cfg.image_size, cfg.max_support_keypoints, cfg.max_skeleton_edges
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    t = tokenize_keypoints(tok, rng.uniform(5, S - 5, (8, 2)), S, S)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, S, S, 3), np.float32),
        np.zeros((1, K, 2), np.float32),
        np.zeros((1, K), bool),
        np.full((1, E, 2), -1, np.int32),
        {k: np.stack([v]) for k, v in t.items()},
    )
    print("Converting ...")
    variables = import_reference_state_dict(sd, variables, cfg)

    state = create_train_state(cfg, variables, steps_per_epoch=1)
    mgr = CheckpointManager(args.output_dir)
    mgr.save_epoch(state, epoch, cfg, best_pck=best_pck, patience=0,
                   extra={"imported_from": os.path.abspath(
                       args.torch_checkpoint)})
    mgr.wait()
    out = os.path.join(args.output_dir, f"epoch_{epoch}")
    print(f"Wrote {out}")
    print("Evaluate with:\n  python -m cape_tpu.cli.evaluate "
          f"--checkpoint {out} --dataset_root <MP100> --split test")


if __name__ == "__main__":
    main()
