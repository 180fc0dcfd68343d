"""Batched-eval + decode boundary tests (VERDICT round-2 item 8).

- batched validation decode must score the same episodes to the same PCK as
  the reference's batch-1 protocol (`eval_cape_checkpoint.py:296-303`);
- 5-shot episodes run end to end (K-shot mean/any aggregation,
  `episodic_sampler.py:434-442`);
- 68-keypoint categories (MP-100's max) decode against the seq_len
  boundary;
- min_decode_len pins the reference's EOS-suppression semantics
  (`roomformer_v2.py:456,533`): a category with fewer keypoints than
  min_decode_len can never terminate at the right step.
"""

import jax
import numpy as np
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.data.episodic import EpisodicSampler, episode_batches
from cape_tpu.data.mp100 import MP100Dataset
from cape_tpu.data.synthetic import make_synthetic_mp100
from cape_tpu.data.tokenizer import DiscreteTokenizer
from cape_tpu.eval.evaluate import evaluate_cape
from cape_tpu.models import CAPE
from cape_tpu.models.cape import autoregressive_decode


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100_evalb")
    paths = make_synthetic_mp100(str(root), num_categories=6,
                                 images_per_category=7)
    cfg = tiny_test_config(dataset_root=str(root),
                           category_split_file=paths["split_file"])
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    val_ds = MP100Dataset(paths["img_dir"], paths["val_ann"], tok,
                          image_size=cfg.image_size, split="val")
    model = CAPE(cfg)
    sampler = EpisodicSampler(val_ds, paths["split_file"], "val",
                              num_queries=1, num_support=1)
    probe = next(episode_batches(val_ds, sampler, 1, 1, cfg.image_size,
                                 cfg.max_support_keypoints,
                                 cfg.max_skeleton_edges,
                                 np.random.default_rng(0)))
    params = model.init(jax.random.PRNGKey(0), probe["query_images"],
                        probe["support_coords"], probe["support_mask"],
                        probe["skeleton_edges"], probe["targets"])
    return cfg, val_ds, paths, model, params, sampler


def _run_eval(env, batch_episodes, num_episodes=5, num_support=1):
    cfg, val_ds, paths, model, params, sampler = env
    if num_support != 1:
        sampler = EpisodicSampler(val_ds, paths["split_file"], "val",
                                  num_queries=1, num_support=num_support)
    fixed = sampler.fixed_episodes(num_episodes, seed=9)
    n_batches = -(-num_episodes // batch_episodes)
    batches = episode_batches(
        val_ds, sampler, batch_episodes, n_batches, cfg.image_size,
        cfg.max_support_keypoints, cfg.max_skeleton_edges,
        np.random.default_rng(9), fixed=fixed,
    )
    return evaluate_cape(model, params["params"], batches, cfg)


def test_batched_eval_matches_batch1(env):
    """Same fixed episodes, batch 4 (with padding tail) vs batch 1: the
    PCK bookkeeping must be identical — padding episodes are excluded via
    sample_valid and each fixed episode scores exactly once."""
    s1 = _run_eval(env, batch_episodes=1)
    s4 = _run_eval(env, batch_episodes=4)  # 5 episodes -> 2 batches, 3 pad
    assert s4["num_images"] == s1["num_images"] == 5
    assert s4["pck_num_visible"] == s1["pck_num_visible"]
    assert s4["pck_num_correct"] == s1["pck_num_correct"]
    assert s4["pck"] == pytest.approx(s1["pck"], abs=1e-12)
    assert set(s4["pck_per_category"]) == set(s1["pck_per_category"])
    for cid, pck in s1["pck_per_category"].items():
        assert s4["pck_per_category"][cid] == pytest.approx(pck, abs=1e-12)


def test_5shot_eval_end_to_end(env):
    """5-shot episodes (K-shot mean/any support aggregation) decode and
    score without error; counts match the 1-shot episode bookkeeping."""
    stats = _run_eval(env, batch_episodes=2, num_episodes=4, num_support=5)
    assert stats["num_images"] == 4
    assert stats["pck_num_visible"] > 0
    assert 0.0 <= stats["pck"] <= 1.0


def _decode_68(seq_len, force_length):
    """Decode a 68-keypoint support set against a given seq_len."""
    cfg = tiny_test_config(max_support_keypoints=68, max_skeleton_edges=68,
                           seq_len=seq_len)
    model = CAPE(cfg)
    rng = np.random.default_rng(0)
    B, S, K = 1, cfg.image_size, 68
    images = np.asarray(rng.uniform(size=(B, S, S, 3)), np.float32)
    sc = np.asarray(rng.uniform(size=(B, K, 2)), np.float32)
    sm = np.zeros((B, K), bool)  # all 68 keypoints valid
    edges = np.stack([np.arange(1, 68), np.arange(2, 69)], -1)[None]
    edges = np.concatenate(
        [edges, np.full((B, 1, 2), -1, np.int32)], axis=1).astype(np.int32)
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    from cape_tpu.data.tokenizer import tokenize_keypoints
    # tokenizer needs n+2 slots (BOS + n coords + EOS); at seq_len below the
    # 68-kpt boundary, init with a smaller target (targets are only used to
    # trace static shapes here)
    n_tok = K if K + 2 <= seq_len else 4
    t = tokenize_keypoints(tok, rng.uniform(2, S - 2, (n_tok, 2)), S, S)
    targets = {k: v[None] for k, v in t.items()}
    params = model.init(jax.random.PRNGKey(0), images, sc, sm, edges, targets)
    # bias the class head toward `coord` so the rollout behaves like a
    # trained model emitting one coordinate per step (random weights emit
    # arbitrary token types); force_length supplies the EOS position
    params = jax.tree_util.tree_map(np.asarray, params)
    dec = params["params"]["decoder"]
    for name in dec:
        if name.startswith("class_head_"):
            dec[name]["bias"] = np.array([50.0, 0.0, 0.0], np.float32)
    out = autoregressive_decode(model, params, images, sc, sm, edges,
                                force_length=force_length)
    return cfg, out


def test_68_keypoint_decode_fills_seq_exactly():
    """seq_len=70 is the static boundary for a 68-keypoint category
    (BOS + 68 coords + EOS, tokenizer contract): the decode generates
    68 coords + EOS (69 tokens), finishes, and extraction yields exactly
    68 keypoints with no padding."""
    from cape_tpu.eval.evaluate import extract_pred_keypoints

    cfg, out = _decode_68(seq_len=70, force_length=69)
    assert not bool(np.asarray(out["unfinished"]).any())
    lengths = np.asarray(out["lengths"])
    assert lengths[0] == 69  # 68 coords + EOS
    # all 68 coordinate positions were generated as coords
    assert np.asarray(out["gen_valid"])[0, :68].all()
    active = np.arange(cfg.seq_len)[None, :] < lengths[:, None]
    preds = extract_pred_keypoints(
        np.asarray(out["pred_logits"]), np.asarray(out["pred_coords"]),
        active, np.asarray([68]))
    assert preds[0].shape == (68, 2)
    # extraction trims at exactly the category count: the first 68 coords
    # survive, nothing is zero-padded
    np.testing.assert_array_equal(
        preds[0], np.asarray(out["pred_coords"])[0, :68])


def test_68_keypoint_decode_overflows_short_seq():
    """seq_len one short of 68 coords + EOS: the sample must be flagged
    unfinished (hit max_len without EOS), matching the reference's
    incomplete-generation warning (`roomformer_v2.py:608-621`)."""
    cfg, out = _decode_68(seq_len=68, force_length=69)
    assert bool(np.asarray(out["unfinished"]).all())
    assert np.asarray(out["lengths"])[0] == 68  # every slot generated


def test_min_decode_len_suppresses_early_eos():
    """An EOS prediction before min_decode_len is coerced into a coordinate
    (`roomformer_v2.py:456,533`): with the class head biased to always
    predict EOS, generation still runs exactly min_decode_len coords + EOS.
    Consequence (pinned): a category with fewer keypoints than
    min_decode_len can never emit EOS at its true count."""
    cfg = tiny_test_config(min_decode_len=6)
    model = CAPE(cfg)
    rng = np.random.default_rng(0)
    B, S, K = 2, cfg.image_size, cfg.max_support_keypoints
    images = np.asarray(rng.uniform(size=(B, S, S, 3)), np.float32)
    sc = np.asarray(rng.uniform(size=(B, K, 2)), np.float32)
    sm = np.zeros((B, K), bool)
    sm[:, 4:] = True  # 4-keypoint category (< min_decode_len)
    edges = np.full((B, cfg.max_skeleton_edges, 2), -1, np.int32)
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    from cape_tpu.data.tokenizer import tokenize_keypoints
    t = tokenize_keypoints(tok, rng.uniform(2, S - 2, (4, 2)), S, S)
    targets = {k: np.stack([v] * B) for k, v in t.items()}
    params = model.init(jax.random.PRNGKey(0), images, sc, sm, edges, targets)

    # bias every class head hard toward EOS (TokenType.eos == 2)
    params = jax.tree_util.tree_map(np.asarray, params)
    dec = params["params"]["decoder"]
    for name in dec:
        if name.startswith("class_head_"):
            dec[name]["bias"] = np.array([0.0, 0.0, 50.0], np.float32)

    out = autoregressive_decode(model, params, images, sc, sm, edges)
    lengths = np.asarray(out["lengths"])
    # EOS is suppressed for steps 0..min_decode_len-1 (those emit coords),
    # accepted at step min_decode_len -> total length min_decode_len + 1
    np.testing.assert_array_equal(lengths, cfg.min_decode_len + 1)
    assert int(np.asarray(out["gen_valid"]).sum()) == B * cfg.min_decode_len
    assert not bool(np.asarray(out["unfinished"]).any())


def test_pck_norm_and_gt_structure_flags(env):
    """The alternate eval paths (`engine_cape.py:1015-1063` /
    `eval_cape_checkpoint.py:530-537`): 'resized' normalization changes the
    PCK denominator, GT-structure extraction counts the same visible
    keypoints but reads coords at GT token positions."""
    cfg, val_ds, paths, model, params, sampler = env
    fixed = sampler.fixed_episodes(4, seed=11)

    def stats(**kw):
        batches = episode_batches(
            val_ds, sampler, 2, 2, cfg.image_size,
            cfg.max_support_keypoints, cfg.max_skeleton_edges,
            np.random.default_rng(11), fixed=fixed)
        return evaluate_cape(model, params["params"], batches, cfg, **kw)

    base = stats()
    resized = stats(pck_norm="resized")
    gts = stats(gt_structure_fallback=True)
    # same episodes, same visible-keypoint totals in every mode
    assert base["pck_num_visible"] == resized["pck_num_visible"]
    assert base["pck_num_visible"] == gts["pck_num_visible"]
    for s in (base, resized, gts):
        assert 0.0 <= s["pck"] <= 1.0
    # invalid norm rejected
    with pytest.raises(ValueError):
        stats(pck_norm="bogus")


def test_random_val_path_scores_exactly_n_episodes(env):
    """Non-fixed validation (fixed_val_episodes=False) must also score
    exactly the configured episode count: the tail batch's extra random
    episodes are flagged invalid via total_episodes."""
    from cape_tpu.data.episodic import eval_batch_plan

    cfg, val_ds, paths, model, params, sampler = env
    n = 5
    eval_b, n_batches = eval_batch_plan(n, 4)
    assert (eval_b, n_batches) == (4, 2)
    batches = episode_batches(
        val_ds, sampler, eval_b, n_batches, cfg.image_size,
        cfg.max_support_keypoints, cfg.max_skeleton_edges,
        np.random.default_rng(3), fixed=None, total_episodes=n)
    stats = evaluate_cape(model, params["params"], batches, cfg)
    assert stats["num_images"] == n
