"""Multi-step-per-dispatch training (`steps_per_dispatch` > 1).

`make_scan_train_step` fuses N real optimizer steps into one XLA dispatch
via `lax.scan` over a stacked batch. The scanned chain must be numerically
equivalent to N sequential `make_train_step` dispatches with the same RNG
split pattern — otherwise multi-step mode would silently train a different
model. Also covers the host-side `stack_batches` grouping contract and the
full `train_loop` running in multi-step mode on the synthetic fixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.data.prefetch import stack_batches
from cape_tpu.models import CAPE
from cape_tpu.train.state import create_train_state
from cape_tpu.train.train_step import make_scan_train_step, make_train_step


def _batch_dict(cfg, batch=2, n_kpts=4, seed=0):
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints

    rng = np.random.default_rng(seed)
    S, K, E = cfg.image_size, cfg.max_support_keypoints, cfg.max_skeleton_edges
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    tgts = [
        tokenize_keypoints(tok, rng.uniform(5, S - 5, (n_kpts, 2)), S, S)
        for _ in range(batch)
    ]
    sm = np.zeros((batch, K), bool)
    sm[:, n_kpts:] = True
    return {
        "query_images": rng.uniform(size=(batch, S, S, 3)).astype(np.float32),
        "support_coords": rng.uniform(size=(batch, K, 2)).astype(np.float32),
        "support_mask": sm,
        "skeleton_edges": np.full((batch, E, 2), -1, np.int32),
        "targets": {k: np.stack([t[k] for t in tgts]) for k in tgts[0]},
    }


@pytest.mark.slow
def test_scan_step_matches_sequential_steps():
    cfg = tiny_test_config(accumulation_steps=1, steps_per_dispatch=2)
    model = CAPE(cfg)
    batches = [_batch_dict(cfg, seed=s) for s in (0, 1)]
    params = model.init(
        jax.random.PRNGKey(0), batches[0]["query_images"],
        batches[0]["support_coords"], batches[0]["support_mask"],
        batches[0]["skeleton_edges"], batches[0]["targets"])

    rng0 = jax.random.PRNGKey(7)

    # oracle: two one-dispatch-per-step updates, same split pattern as scan
    single = make_train_step(model, cfg, steps_per_epoch=4, donate=False)
    state_seq = create_train_state(cfg, params, steps_per_epoch=4)
    r = rng0
    seq_metrics = []
    for b in batches:
        r, sub = jax.random.split(r)
        state_seq, m = single(state_seq, b, sub)
        seq_metrics.append(m)

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    scan = make_scan_train_step(model, cfg, steps_per_epoch=4)
    state_scan = create_train_state(cfg, params, steps_per_epoch=4)
    state_scan, metrics = scan(state_scan, stacked, rng0)

    assert int(state_scan.step) == int(state_seq.step) == 2
    # per-step metrics come back stacked on a leading (N,) axis
    np.testing.assert_allclose(
        np.asarray(metrics["total"]),
        np.asarray([m["total"] for m in seq_metrics]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_scan.params),
                    jax.tree_util.tree_leaves(state_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_stack_batches_groups_and_drops_remainder():
    items = [{"x": np.full((2, 3), i), "y": {"z": np.full((4,), i)}}
             for i in range(5)]
    groups = list(stack_batches(iter(items), 2))
    assert len(groups) == 2  # 5 items -> 2 full groups, remainder dropped
    assert groups[0]["x"].shape == (2, 2, 3)
    assert groups[1]["y"]["z"].shape == (2, 4)
    np.testing.assert_array_equal(groups[1]["x"][0], np.full((2, 3), 2))
    np.testing.assert_array_equal(groups[1]["x"][1], np.full((2, 3), 3))


@pytest.mark.slow
def test_train_loop_multi_step_dispatch(tmp_path):
    from cape_tpu.data.mp100 import MP100Dataset
    from cape_tpu.data.synthetic import make_synthetic_mp100
    from cape_tpu.data.tokenizer import DiscreteTokenizer
    from cape_tpu.train.loop import train_loop

    paths = make_synthetic_mp100(str(tmp_path), num_categories=6,
                                 images_per_category=6)
    cfg = tiny_test_config(
        episodes_per_epoch=4, val_episodes_per_epoch=2, batch_size=1,
        epochs=1, early_stopping_patience=0, num_queries_per_episode=1,
        steps_per_dispatch=2, accumulation_steps=1,
        output_dir=str(tmp_path / "out"), dataset_root=str(tmp_path),
        category_split_file=paths["split_file"],
    )
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    train_ds = MP100Dataset(paths["img_dir"], paths["train_ann"], tok,
                            image_size=cfg.image_size, split="train")
    val_ds = MP100Dataset(paths["img_dir"], paths["val_ann"], tok,
                          image_size=cfg.image_size, split="val")
    stats = train_loop(CAPE(cfg), cfg, train_ds, val_ds,
                       paths["split_file"])
    assert len(stats["history"]) == 1
    assert np.isfinite(stats["history"][0]["train_loss"])
