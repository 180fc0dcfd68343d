"""End-to-end CLI coverage: train -> evaluate -> visualize -> leak audit,
all through the argv entry points on the synthetic fixture (the in-suite
analogue of the reference's `TEST_CAPE.sh` smoke, SURVEY.md §4, plus the
eval/vis/debug scripts of §2.7)."""

import glob
import json
import os
import subprocess
import sys


import numpy as np
import pytest

from cape_tpu.data.synthetic import make_synthetic_mp100

import pytest  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    paths = make_synthetic_mp100(str(root), num_categories=6,
                                 images_per_category=6)
    out_dir = str(root / "out")
    from cape_tpu.cli.train import main as train_main

    tiny = [
        "--dataset_root", str(root),
        "--category_split_file", paths["split_file"],
        "--output_dir", out_dir,
        "--image_size", "64", "--hidden_dim", "64",
        "--dim_feedforward", "128", "--enc_layers", "2",
        "--dec_layers", "2", "--nheads", "4", "--seq_len", "24",
        "--vocab_size", "100", "--backbone", "resnet_tiny",
        "--support_encoder_layers", "1", "--num_gcn_layers", "1",
        "--epochs", "1", "--episodes_per_epoch", "2",
        "--val_episodes_per_epoch", "2", "--batch_size", "1",
        "--accumulation_steps", "1", "--num_queries_per_episode", "1",
        "--warmup_epochs", "0", "--early_stopping_patience", "0",
        "--dropout", "0.0", "--no_bf16", "--print_freq", "0",
    ]
    result = train_main(tiny)
    assert "best_pck" in result
    return root, paths, out_dir


def test_train_cli_writes_checkpoints(trained):
    root, paths, out_dir = trained
    names = os.listdir(out_dir)
    assert any(n.startswith("epoch_") for n in names)


def _latest_checkpoint(out_dir):
    from cape_tpu.utils.checkpoint import CheckpointManager

    return CheckpointManager(out_dir).latest()


def test_evaluate_cli(trained):
    root, paths, out_dir = trained
    from cape_tpu.cli.evaluate import main as eval_main

    stats = eval_main([
        "--checkpoint", _latest_checkpoint(out_dir),
        "--dataset_root", str(root),
        "--category_split_file", paths["split_file"],
        "--split", "test", "--num_episodes", "3",
        "--eval_batch_size", "2",
        "--pck_norm", "resized",
    ])
    assert 0.0 <= stats["pck"] <= 1.0
    metrics = os.path.join(out_dir, "..")  # written next to checkpoint
    files = glob.glob(os.path.join(_latest_checkpoint(out_dir),
                                   "metrics_test.json"))
    assert files, "metrics_test.json not written"
    with open(files[0]) as f:
        j = json.load(f)
    assert "pck" in j and "pck_per_category" in j


def test_visualize_cli(trained):
    root, paths, out_dir = trained
    from cape_tpu.cli.visualize import main as vis_main

    vis_dir = str(root / "vis")
    vis_main([
        "--checkpoint", _latest_checkpoint(out_dir),
        "--dataset_root", str(root),
        "--category_split_file", paths["split_file"],
        "--split", "test", "--num_episodes", "2",
        "--output_dir", vis_dir,
    ])
    pngs = glob.glob(os.path.join(vis_dir, "*.png"))
    assert pngs, "no visualization panels written"


def test_leak_audit_script(trained):
    """The debug CLI runs as a subprocess (it is a script, not a module)."""
    root, paths, out_dir = trained
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "debug_validation_pck.py"),
         "--checkpoint", _latest_checkpoint(out_dir),
         "--dataset_root", str(root),
         "--category_split_file", paths["split_file"],
         "--split", "val", "--num_episodes", "2"],
        capture_output=True, text=True, env=env, timeout=900)
    # rc 0 = no GT-identity leak (a 1-epoch model legitimately trips the
    # collapse / never-EOS quality flags — those don't fail the audit)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "PCK leak audit" in r.stdout
    assert "pred == GT (leak!):        0" in r.stdout
