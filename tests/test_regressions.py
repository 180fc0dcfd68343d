"""Ports of the reference's CRITICAL-FIX regression invariants
(SURVEY.md §4: every reference bug has a matched test).

- CRITICAL FIX #1 (`tests/test_critical_fix_1_index_correspondence.py`):
  ALL keypoints — including invisible ones — survive the data pipeline so
  skeleton edge indices stay valid; visibility is a MASK, never a filter.
- CRITICAL FIX #2 (`tests/test_critical_fix_2_sequence_logic.py`): the
  dataset emits all 4 bilinear corner sequences + 4 deltas and the model
  consumes the same structure in training and inference.
- `test_no_single_token_collapse.py`: the autoregressive rollout must not
  repeat one coordinate forever.
- batch-structure validation (`cape_model.py:99-117`): misaligned
  support/query batches are rejected with a clear error.
"""

import jax
import numpy as np
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.data.episodic import (EpisodicSampler, episode_batches,
                                    validate_episode_batch)
from cape_tpu.data.mp100 import MP100Dataset
from cape_tpu.data.synthetic import make_synthetic_mp100
from cape_tpu.data.token_types import TokenType
from cape_tpu.data.tokenizer import DiscreteTokenizer
from cape_tpu.models import CAPE
from cape_tpu.models.cape import autoregressive_decode


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100_reg")
    # non-learnable fixture: visibility is random incl. 0 (unlabeled)
    paths = make_synthetic_mp100(str(root), num_categories=6,
                                 images_per_category=6, seed=4)
    cfg = tiny_test_config(dataset_root=str(root),
                           category_split_file=paths["split_file"])
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    ds = MP100Dataset(paths["img_dir"], paths["train_ann"], tok,
                      image_size=cfg.image_size, split="train")
    return cfg, ds, paths


def test_invisible_keypoints_preserved_end_to_end(env):
    """CRITICAL FIX #1: a record with invisible keypoints still carries the
    full keypoint array (indices aligned with the skeleton) and the
    tokenizer emits coord tokens for them — only the LOSS mask excludes
    them (plus the always-supervised EOS)."""
    cfg, ds, paths = env
    rng = np.random.default_rng(0)
    found_invisible = False
    for idx in range(len(ds.ids)):
        rec = ds.get_record(idx, rng)
        n = rec["num_keypoints"]
        vis = np.asarray(rec["visibility"][:n])
        assert len(rec["keypoints"]) >= n  # nothing filtered out
        t = rec["seq_data"]
        labels = t["token_labels"]
        # all N keypoints tokenized as coord + one EOS, regardless of vis
        assert (labels[:n] == TokenType.coord).all()
        assert labels[n] == TokenType.eos
        # visibility gates ONLY the loss mask
        np.testing.assert_array_equal(t["visibility_mask"][:n], vis > 0)
        assert t["visibility_mask"][n]  # EOS supervised
        # coord token ids valid grid cells even for invisible keypoints
        assert (t["seq11"][1:1 + n] < cfg.num_bins**2).all()
        if (vis == 0).any():
            found_invisible = True
    assert found_invisible, "fixture produced no invisible keypoints"


def test_skeleton_indices_stay_valid(env):
    """Edges reference keypoint indices; since invisible keypoints are
    kept, every edge index must be within [0, N)."""
    cfg, ds, paths = env
    rng = np.random.default_rng(1)
    for idx in range(len(ds.ids)):
        rec = ds.get_record(idx, rng)
        n = rec["num_keypoints"]
        for a, b in rec["skeleton"]:
            assert 0 <= a < n and 0 <= b < n, (a, b, n)


def test_no_single_token_collapse(env):
    """The rollout must produce varied coordinates, not one repeated token
    (`tests/test_no_single_token_collapse.py`)."""
    cfg, ds, paths = env
    sampler = EpisodicSampler(ds, paths["split_file"], "train",
                              num_queries=1, num_support=1)
    batch = next(episode_batches(ds, sampler, 2, 1, cfg.image_size,
                                 cfg.max_support_keypoints,
                                 cfg.max_skeleton_edges,
                                 np.random.default_rng(2)))
    model = CAPE(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["query_images"],
                        batch["support_coords"], batch["support_mask"],
                        batch["skeleton_edges"], batch["targets"])
    out = autoregressive_decode(
        model, params, batch["query_images"], batch["support_coords"],
        batch["support_mask"], batch["skeleton_edges"],
        force_length=8)
    coords = np.asarray(out["pred_coords"])[:, :8]
    # across 8 generated steps the coordinates must not all be identical
    for b in range(coords.shape[0]):
        assert coords[b].std() > 1e-6, f"sample {b} collapsed: {coords[b]}"


def test_batch_structure_validation(env):
    """Misaligned support/query batches raise with a clear message
    (`cape_model.py:99-117`)."""
    cfg, ds, paths = env
    sampler = EpisodicSampler(ds, paths["split_file"], "train",
                              num_queries=2, num_support=1)
    batch = next(episode_batches(ds, sampler, 1, 1, cfg.image_size,
                                 cfg.max_support_keypoints,
                                 cfg.max_skeleton_edges,
                                 np.random.default_rng(3)))
    validate_episode_batch(batch)  # well-formed passes

    bad = dict(batch)
    bad["support_coords"] = batch["support_coords"][:1]
    with pytest.raises(ValueError, match="Support-Query batch mismatch"):
        validate_episode_batch(bad)

    bad = dict(batch)
    bad["support_mask"] = batch["support_mask"].astype(np.int32)
    with pytest.raises(ValueError, match="must be bool"):
        validate_episode_batch(bad)

    bad = dict(batch)
    bad["targets"] = dict(batch["targets"])
    bad["targets"]["seq11"] = batch["targets"]["seq11"][:1]
    with pytest.raises(ValueError, match="seq11"):
        validate_episode_batch(bad)


def test_all_bilinear_sequences_present(env):
    """CRITICAL FIX #2: all 4 corner sequences + 4 deltas exist, deltas are
    complementary, and training and decode consume the same 8 keys."""
    cfg, ds, paths = env
    rec = ds.get_record(0, np.random.default_rng(5))
    t = rec["seq_data"]
    for k in ("seq11", "seq12", "seq21", "seq22",
              "delta_x1", "delta_x2", "delta_y1", "delta_y2"):
        assert k in t, k
    np.testing.assert_allclose(t["delta_x1"] + t["delta_x2"], 1.0, atol=1e-6)
    np.testing.assert_allclose(t["delta_y1"] + t["delta_y2"], 1.0, atol=1e-6)
    # the decoder's training entry reads exactly these keys (cape.py)
    import inspect

    from cape_tpu.models import cape as cape_mod

    src = inspect.getsource(cape_mod.CAPE.__call__)
    for k in ("seq11", "seq12", "seq21", "seq22",
              "delta_x1", "delta_x2", "delta_y1", "delta_y2"):
        assert k in src
