"""6-part PCK leakage audit (reference `tests/test_validation_pck_debug.py`,
`models/debug_validation_pck.py`) as a reusable function.

A real random-weight decode must pass clean; synthetic leak/copy/collapse
decodes must trip the matching detectors."""

import jax
import numpy as np
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.data.episodic import EpisodicSampler, episode_batches
from cape_tpu.data.mp100 import MP100Dataset
from cape_tpu.data.synthetic import make_synthetic_mp100
from cape_tpu.data.token_types import TokenType
from cape_tpu.data.tokenizer import DiscreteTokenizer
from cape_tpu.eval.audit import audit_episodes, format_audit_report
from cape_tpu.models import CAPE
from cape_tpu.models.cape import autoregressive_decode


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100_audit")
    paths = make_synthetic_mp100(str(root), num_categories=6,
                                 images_per_category=6)
    cfg = tiny_test_config(dataset_root=str(root),
                           category_split_file=paths["split_file"])
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    ds = MP100Dataset(paths["img_dir"], paths["val_ann"], tok,
                      image_size=cfg.image_size, split="val")
    sampler = EpisodicSampler(ds, paths["split_file"], "val",
                              num_queries=1, num_support=1)
    return cfg, ds, sampler


def _batches(cfg, ds, sampler, n=4, batch=2):
    fixed = sampler.fixed_episodes(n, seed=5)
    return list(episode_batches(
        ds, sampler, batch, -(-n // batch), cfg.image_size,
        cfg.max_support_keypoints, cfg.max_skeleton_edges,
        np.random.default_rng(5), fixed=fixed))


def test_audit_clean_on_real_decode(env):
    """A random-init model cannot leak: audit reports no GT-identical
    predictions and produces the full 6-part result."""
    cfg, ds, sampler = env
    batches = _batches(cfg, ds, sampler)
    model = CAPE(cfg)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0), b0["query_images"],
                        b0["support_coords"], b0["support_mask"],
                        b0["skeleton_edges"], b0["targets"])
    decode = jax.jit(lambda p, i, c, m, e:
                     autoregressive_decode(model, p, i, c, m, e))
    audit = audit_episodes(
        lambda b: decode(params, b["query_images"], b["support_coords"],
                         b["support_mask"], b["skeleton_edges"]),
        batches, cfg)
    assert audit["num_samples"] == 4
    assert audit["identical_gt"] == 0
    assert not audit["leak_detected"]
    assert set(audit["per_category"])  # per-category breakdown present
    report = format_audit_report(audit)
    for part in ("1.", "2.", "3.", "4.", "5.", "6."):
        assert part in report


def _fake_decode(batch, coords_source, spread=None):
    """Stub decode that 'generates' exactly the GT/support coordinates."""
    B = batch["query_images"].shape[0]
    L = batch["targets"]["token_labels"].shape[1]
    logits = np.zeros((B, L, 3), np.float32)
    coords = np.zeros((B, L, 2), np.float32)
    lengths = np.zeros((B,), np.int32)
    for i in range(B):
        n = int(batch["num_keypoints"][i])
        logits[i, :n, TokenType.coord] = 10.0
        logits[i, n, TokenType.eos] = 10.0
        if spread is not None:
            coords[i, :n] = spread
        else:
            coords[i, :n] = coords_source(batch, i, n)
        lengths[i] = n + 1
    return {"pred_logits": logits, "pred_coords": coords,
            "lengths": lengths, "unfinished": np.zeros((B,), bool)}


def test_audit_detects_gt_leak(env):
    cfg, ds, sampler = env
    batches = _batches(cfg, ds, sampler)

    def leaky(b):
        return _fake_decode(
            b, lambda b, i, n: b["targets"]["target_seq"][i, :n])

    audit = audit_episodes(leaky, batches, cfg)
    assert audit["identical_gt"] == audit["num_samples"]
    assert audit["leak_detected"]
    assert any("LEAK" in f for f in audit["flags"])
    # leaked predictions also produce perfect PCK -> flagged suspicious
    assert audit["pck_perfect_count"] == audit["num_samples"]
    # and exact generation lengths (part 3 cross-check)
    assert audit["length_exact_matches"] == audit["num_samples"]


def test_audit_detects_support_copy(env):
    cfg, ds, sampler = env
    batches = _batches(cfg, ds, sampler)

    def copying(b):
        return _fake_decode(
            b, lambda b, i, n: b["support_coords"][i, :n])

    audit = audit_episodes(copying, batches, cfg)
    assert audit["identical_support"] == audit["num_samples"]
    assert any("COPY" in f for f in audit["flags"])
    assert not audit["leak_detected"]  # support-copy is a separate flag


def test_audit_detects_collapse(env):
    cfg, ds, sampler = env
    batches = _batches(cfg, ds, sampler)

    def collapsed(b):
        return _fake_decode(b, None, spread=np.array([0.5, 0.5]))

    audit = audit_episodes(collapsed, batches, cfg)
    assert audit["collapse_suspected"]
    assert any("COLLAPSE" in f for f in audit["flags"])
