"""Serving API: checkpoint -> predictions on raw images of any size, with
bbox crops mapped back to original pixel coordinates."""

import numpy as np
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.serve import CAPEPredictor


@pytest.fixture(scope="module")
def predictor():
    import jax

    from cape_tpu.models import CAPE
    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints

    cfg = tiny_test_config()
    model = CAPE(cfg)
    S, K = cfg.image_size, cfg.max_support_keypoints
    rng = np.random.default_rng(0)
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    t = tokenize_keypoints(tok, rng.uniform(2, S - 2, (4, 2)), S, S)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, S, S, 3), np.float32),
        np.zeros((1, K, 2), np.float32),
        np.zeros((1, K), bool),
        np.full((1, cfg.max_skeleton_edges, 2), -1, np.int32),
        {k: v[None] for k, v in t.items()},
    )
    return CAPEPredictor(cfg, variables["params"], batch_size=2)


def test_predict_raw_images(predictor):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
            for _ in range(3)]  # arbitrary size, odd count vs batch_size=2
    proto = rng.uniform(0.1, 0.9, (5, 2))
    skel = [[0, 1], [1, 2], [2, 3], [3, 4]]
    out = predictor.predict(imgs, proto, skeleton=skel)
    assert len(out) == 3
    for r in out:
        assert r["keypoints"].shape == (5, 2)
        assert r["generated"].shape == (5,)
        assert np.isfinite(r["keypoints"]).all()
        # generated coords land inside the (uncropped) image frame
        k = r["keypoints"][r["generated"]]
        if len(k):
            assert (k[:, 0] >= 0).all() and (k[:, 0] <= 100).all()
            assert (k[:, 1] >= 0).all() and (k[:, 1] <= 80).all()


def test_bbox_crop_maps_back_to_original_frame(predictor):
    """With a bbox, outputs land inside the bbox in ORIGINAL coordinates;
    the same pixels cropped manually give identical model-frame results."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    proto = rng.uniform(0.1, 0.9, (4, 2))
    bbox = (40, 20, 80, 60)

    out_bbox = predictor.predict([img], proto, bboxes=[bbox])[0]
    k = out_bbox["keypoints"][out_bbox["generated"]]
    if len(k):
        assert (k[:, 0] >= 40 - 1e-6).all() and (k[:, 0] <= 120 + 1e-6).all()
        assert (k[:, 1] >= 20 - 1e-6).all() and (k[:, 1] <= 80 + 1e-6).all()

    # manual crop must produce the same model-frame keypoints, shifted
    crop = img[20:80, 40:120]
    out_crop = predictor.predict([crop], proto)[0]
    np.testing.assert_allclose(
        out_bbox["keypoints"],
        out_crop["keypoints"] + np.array([40.0, 20.0]),
        atol=1e-6,
    )


def test_batch_padding_invariance(predictor):
    """Predicting images one at a time equals predicting them together
    (the pad-to-batch rows must not leak into results)."""
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            for _ in range(3)]
    proto = rng.uniform(0.1, 0.9, (4, 2))
    together = predictor.predict(imgs, proto)
    single = [predictor.predict([im], proto)[0] for im in imgs]
    for a, b in zip(together, single):
        np.testing.assert_allclose(a["keypoints"], b["keypoints"], atol=1e-5)
        np.testing.assert_array_equal(a["generated"], b["generated"])


def test_input_validation(predictor):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="support_coords"):
        predictor.predict([img], np.zeros((3,)))
    with pytest.raises(ValueError, match="uint8"):
        predictor.predict([img.astype(np.float32)], np.zeros((3, 2)))
    with pytest.raises(ValueError, match="empty bbox"):
        predictor.predict([img], np.zeros((3, 2)), bboxes=[(40, 40, 5, 5)])
    too_many = np.zeros((predictor.cfg.max_support_keypoints + 1, 2))
    with pytest.raises(ValueError, match="static max"):
        predictor.predict([img], too_many)


def test_from_checkpoint_roundtrip(tmp_path, predictor):
    """from_checkpoint rebuilds the model from a self-describing
    checkpoint directory and predicts."""
    import jax

    from cape_tpu.train.state import TrainState, make_optimizer
    from cape_tpu.utils.checkpoint import CheckpointManager

    cfg = predictor.cfg
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state = TrainState(step=np.int32(0), params=predictor.params,
                       opt_state=tx.init(predictor.params))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_epoch(state, epoch=0, cfg=cfg, best_pck=0.0, patience=0)
    mgr.wait()

    p2 = CAPEPredictor.from_checkpoint(mgr.latest(), batch_size=2)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    proto = rng.uniform(0.1, 0.9, (4, 2))
    a = predictor.predict([img], proto)[0]
    b = p2.predict([img], proto)[0]
    np.testing.assert_allclose(a["keypoints"], b["keypoints"], atol=1e-5)


def test_kshot_aggregation_matches_collate(predictor):
    """(K, N, 2) supports aggregate exactly like the training/eval collate:
    mean over shot coords, `any` over True=ignore visibility masks
    (reference `episodic_sampler.py:434-442`). 5 identical shots ==
    1 shot; mixed shots == predicting with the precomputed mean."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    proto = rng.uniform(0.1, 0.9, (4, 2))

    one = predictor.predict([img], proto)[0]
    five_same = predictor.predict([img], np.stack([proto] * 5))[0]
    np.testing.assert_allclose(one["keypoints"], five_same["keypoints"],
                               atol=1e-5)

    shots = rng.uniform(0.1, 0.9, (5, 4, 2)).astype(np.float32)
    mixed = predictor.predict([img], shots)[0]
    mean = predictor.predict([img], shots.mean(axis=0))[0]
    np.testing.assert_allclose(mixed["keypoints"], mean["keypoints"],
                               atol=1e-5)


def test_kshot_visibility_any_mask(predictor):
    """A keypoint invisible in ANY shot is masked out of the support
    (collate `any` semantics); per-shot visibility shape is validated."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    shots = rng.uniform(0.1, 0.9, (3, 4, 2)).astype(np.float32)

    vis = np.full((3, 4), 2)
    vis[1, 2] = 0      # keypoint 2 invisible in shot 1 -> masked overall
    out_masked = predictor.predict([img], shots, support_visibility=vis)[0]

    # equivalent: 1-shot mean coords with keypoint 2 masked
    vis1 = np.array([2, 2, 0, 2])
    out_equiv = predictor.predict([img], shots.mean(axis=0),
                                  support_visibility=vis1)[0]
    np.testing.assert_allclose(out_masked["keypoints"],
                               out_equiv["keypoints"], atol=1e-5)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="support_visibility"):
        predictor.predict([img], shots, support_visibility=np.full((2, 4), 2))
