"""End-to-end smoke: full training loop on the synthetic fixture -> epoch +
best checkpoints -> autoregressive eval -> resume. The TPU analogue of the
reference's `TEST_CAPE.sh` 1-epoch CPU smoke (SURVEY.md §4)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cape_tpu.config import tiny_test_config
from cape_tpu.data.mp100 import MP100Dataset
from cape_tpu.data.synthetic import make_synthetic_mp100
from cape_tpu.data.tokenizer import DiscreteTokenizer
from cape_tpu.models import CAPE


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100_e2e")
    paths = make_synthetic_mp100(str(root), num_categories=6,
                                 images_per_category=6)
    cfg = tiny_test_config(
        episodes_per_epoch=2, val_episodes_per_epoch=2, batch_size=1,
        epochs=1, early_stopping_patience=0, num_queries_per_episode=1,
        output_dir=str(root / "out"), dataset_root=str(root),
        category_split_file=paths["split_file"],
    )
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    train_ds = MP100Dataset(paths["img_dir"], paths["train_ann"], tok,
                            image_size=cfg.image_size, split="train")
    val_ds = MP100Dataset(paths["img_dir"], paths["val_ann"], tok,
                          image_size=cfg.image_size, split="val")
    return cfg, train_ds, val_ds, paths


def test_train_eval_checkpoint_resume(env):
    from cape_tpu.train.loop import train_loop
    from cape_tpu.utils.checkpoint import CheckpointManager

    cfg, train_ds, val_ds, paths = env
    model = CAPE(cfg)
    result = train_loop(model, cfg, train_ds, val_ds, paths["split_file"],
                        print_freq=0)
    assert "best_pck" in result and 0.0 <= result["best_pck"] <= 1.0
    assert len(result["history"]) == 1
    assert np.isfinite(result["history"][0]["train_loss"])

    mgr = CheckpointManager(cfg.output_dir)
    names = mgr.list_checkpoints()
    assert any(n.startswith("epoch_") for n in names)
    # resume from latest for one more epoch
    cfg2 = cfg.replace(epochs=2)
    result2 = train_loop(CAPE(cfg2), cfg2, train_ds, val_ds,
                         paths["split_file"], resume=mgr.latest(),
                         print_freq=0)
    assert result2["history"][0]["epoch"] == 1  # continued, not restarted


def test_resume_is_exact(env):
    """Interrupted-then-resumed training reproduces the uninterrupted loss
    sequence exactly: params/opt state, host numpy RNG (data order), AND the
    jax dropout PRNGKey are all checkpointed (reference saves all RNG
    streams, `train_cape_episodic.py:883-890`)."""
    from cape_tpu.train.loop import train_loop
    from cape_tpu.utils.checkpoint import CheckpointManager

    cfg0, train_ds, val_ds, paths = env
    # dropout > 0 so the jax PRNGKey stream actually matters
    base = cfg0.replace(epochs=2, dropout=0.1, early_stopping_patience=0)

    cfg_a = base.replace(output_dir=cfg0.output_dir + "_exact_a")
    full = train_loop(CAPE(cfg_a), cfg_a, train_ds, val_ds,
                      paths["split_file"], print_freq=0)

    cfg_b = base.replace(output_dir=cfg0.output_dir + "_exact_b", epochs=1)
    train_loop(CAPE(cfg_b), cfg_b, train_ds, val_ds, paths["split_file"],
               print_freq=0)
    cfg_b2 = cfg_b.replace(epochs=2)
    resumed = train_loop(
        CAPE(cfg_b2), cfg_b2, train_ds, val_ds, paths["split_file"],
        resume=CheckpointManager(cfg_b.output_dir).latest(), print_freq=0,
    )

    assert full["history"][1]["epoch"] == resumed["history"][0]["epoch"] == 1
    a = full["history"][1]["train_loss"]
    b = resumed["history"][0]["train_loss"]
    assert a == b, f"resume not exact: epoch-1 loss {a!r} vs {b!r}"
    assert full["history"][1]["pck"] == resumed["history"][0]["pck"]


def test_restore_on_different_mesh_size(env):
    """A checkpoint written on a 1-device mesh must restore and continue on
    the full 8-device mesh (VERDICT round-1 weak item 3): state is saved as
    plain arrays, so mesh placement is decided at restore time."""
    from cape_tpu.train.loop import train_loop
    from cape_tpu.utils.checkpoint import CheckpointManager

    cfg0, train_ds, val_ds, paths = env
    cfg_a = cfg0.replace(output_dir=cfg0.output_dir + "_mesh1", epochs=1,
                         mesh_shape=(1,))
    train_loop(CAPE(cfg_a), cfg_a, train_ds, val_ds, paths["split_file"],
               print_freq=0)

    # resume on the full virtual 8-device mesh with a shardable batch size
    cfg_b = cfg_a.replace(epochs=2, mesh_shape=(-1,), batch_size=8,
                          episodes_per_epoch=8)
    result = train_loop(CAPE(cfg_b), cfg_b, train_ds, val_ds,
                        paths["split_file"],
                        resume=CheckpointManager(cfg_a.output_dir).latest(),
                        print_freq=0)
    assert result["history"][0]["epoch"] == 1
    assert np.isfinite(result["history"][0]["train_loss"])
