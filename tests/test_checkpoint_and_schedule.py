"""Checkpoint system + LR schedule tests (ports the reference's
`test_checkpoint_system*.py` invariants: save/restore round-trip, best
non-overwrite, retention of last 3, RNG state round-trip)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.train.state import TrainState, create_train_state, make_lr_schedule
from cape_tpu.utils.checkpoint import (
    CheckpointManager, numpy_rng_state, restore_numpy_rng,
)


def tiny_state(seed=0):
    cfg = tiny_test_config()
    params = {
        "dense": {"kernel": jnp.asarray(
            np.random.default_rng(seed).normal(size=(4, 4)), jnp.float32)},
        "backbone": {"bn": {"frozen_affine_scale": jnp.ones((4,))}},
    }
    return cfg, create_train_state(cfg, {"params": params}, steps_per_epoch=10)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg, state = tiny_state()
        mgr = CheckpointManager(str(tmp_path))
        rng = np.random.default_rng(7)
        rng.uniform(size=5)
        mgr.save_epoch(state, epoch=3, cfg=cfg, best_pck=0.42, patience=2,
                       rng_state=numpy_rng_state(rng))
        _, fresh = tiny_state(seed=99)
        restored, meta = mgr.restore(mgr.latest(), fresh)
        np.testing.assert_array_equal(
            np.asarray(restored.params["dense"]["kernel"]),
            np.asarray(state.params["dense"]["kernel"]),
        )
        assert meta["epoch"] == 3
        assert meta["best_pck"] == pytest.approx(0.42)
        assert meta["patience"] == 2
        assert meta["config"]["seq_len"] == cfg.seq_len
        # RNG continues identically
        r2 = restore_numpy_rng(meta["rng_state"])
        np.testing.assert_array_equal(rng.uniform(size=3), r2.uniform(size=3))

    def test_retention_last_3(self, tmp_path):
        cfg, state = tiny_state()
        mgr = CheckpointManager(str(tmp_path), keep=3)
        for e in range(6):
            mgr.save_epoch(state, e, cfg, 0.0, 0)
        names = mgr.list_checkpoints()
        assert names == ["epoch_3", "epoch_4", "epoch_5"]

    def test_best_checkpoints_kept_separately(self, tmp_path):
        cfg, state = tiny_state()
        mgr = CheckpointManager(str(tmp_path), keep=3)
        mgr.save_best(state, 1, 0.30, cfg, 0.30, 0)
        mgr.save_best(state, 5, 0.50, cfg, 0.50, 0)
        mgr.save_epoch(state, 6, cfg, 0.5, 1)
        assert "best_epoch_1_pck_0.3000" in mgr.list_checkpoints()
        assert mgr.best().endswith("best_epoch_5_pck_0.5000")
        assert mgr.latest().endswith("epoch_6")


class TestSchedule:
    def test_warmup_then_cosine_restarts(self):
        cfg = tiny_test_config(warmup_epochs=2, t0=4, t_mult=1,
                               scheduler="cosine_warmrestarts", epochs=20)
        spe = 10
        sched = make_lr_schedule(cfg, base_lr=1e-3, steps_per_epoch=spe)
        # warmup ramps up
        assert float(sched(0)) < float(sched(spe))
        assert float(sched(2 * spe - 1)) <= 1e-3 + 1e-9
        # restart: lr at epoch 4 (t_cur=0) back to ~base
        lr_restart = float(sched(4 * spe))
        lr_trough = float(sched(4 * spe - 1))
        assert lr_restart > lr_trough
        assert lr_restart == pytest.approx(1e-3, rel=1e-2)
        # trough approaches eta_min
        assert lr_trough < 1e-4

    def test_tmult_2_periods_grow(self):
        cfg = tiny_test_config(warmup_epochs=0, t0=2, t_mult=2,
                               scheduler="cosine_warmrestarts")
        sched = make_lr_schedule(cfg, 1e-3, steps_per_epoch=1)
        # restarts at epochs 2, 6 (2 + 4), 14 (+8)
        for e in (2, 6):
            assert float(sched(e)) == pytest.approx(1e-3, rel=1e-2), e
        # epoch 5 is near the end of the length-4 cycle -> trough
        assert float(sched(5)) < 2e-4
        # epoch 4 is mid-cycle -> half of base
        assert float(sched(4)) == pytest.approx(5e-4, rel=5e-2)

    def test_multistep(self):
        cfg = tiny_test_config(warmup_epochs=0, scheduler="multistep",
                               lr_drop_epochs=(3, 5))
        sched = make_lr_schedule(cfg, 1e-3, steps_per_epoch=1)
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(3)) == pytest.approx(1e-4)
        assert float(sched(5)) == pytest.approx(1e-5)
