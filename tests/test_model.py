"""Model tests: forward contract, causal masking, support conditioning,
autoregressive decode invariants, train-step learning signal.

Ports the reference's key regression invariants (SURVEY.md §4): causal
masking (`test_training_inference_structure.py`), no single-token collapse,
EOS behavior, gradient flow (`test_geometric_support_encoder.py`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
from cape_tpu.models import CAPE
from cape_tpu.models.cape import autoregressive_decode

CFG = tiny_test_config()


def make_batch(B=2, n_kpts=5, seed=0):
    rng = np.random.default_rng(seed)
    S, K, E = CFG.image_size, CFG.max_support_keypoints, CFG.max_skeleton_edges
    tok = DiscreteTokenizer(CFG.num_bins, CFG.seq_len)
    tgts = []
    for _ in range(B):
        kpts = rng.uniform(5, S - 5, (n_kpts, 2))
        tgts.append(tokenize_keypoints(tok, kpts, S, S))
    targets = {k: jnp.asarray(np.stack([t[k] for t in tgts])) for k in tgts[0]}
    edges = np.full((B, E, 2), -1, np.int32)
    edges[:, : n_kpts - 1] = np.stack(
        [np.arange(1, n_kpts), np.arange(2, n_kpts + 1)], -1
    )
    return {
        "query_images": jnp.asarray(rng.uniform(size=(B, S, S, 3)), jnp.float32),
        "support_coords": jnp.asarray(rng.uniform(size=(B, K, 2)), jnp.float32),
        "support_mask": jnp.zeros((B, K), bool).at[:, n_kpts:].set(True),
        "skeleton_edges": jnp.asarray(edges),
        "targets": targets,
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = CAPE(CFG)
    b = make_batch()
    params = model.init(
        jax.random.PRNGKey(0), b["query_images"], b["support_coords"],
        b["support_mask"], b["skeleton_edges"], b["targets"],
    )
    return model, params


def run_forward(model, params, b):
    return model.apply(
        params, b["query_images"], b["support_coords"], b["support_mask"],
        b["skeleton_edges"], b["targets"],
    )


class TestForward:
    def test_output_contract(self, model_and_params):
        model, params = model_and_params
        b = make_batch()
        out = run_forward(model, params, b)
        B, L = 2, CFG.seq_len
        assert out["pred_logits"].shape == (B, L, 3)
        assert out["pred_coords"].shape == (B, L, 2)
        assert out["aux_classes"].shape == (CFG.dec_layers - 1, B, L, 3)
        # refined coords are sigmoid outputs in (0, 1)
        assert float(out["pred_coords"].min()) >= 0.0
        assert float(out["pred_coords"].max()) <= 1.0
        assert np.isfinite(np.asarray(out["pred_logits"])).all()

    def test_causal_masking(self, model_and_params):
        """Changing future input tokens must not change past outputs."""
        model, params = model_and_params
        b = make_batch()
        out1 = run_forward(model, params, b)
        b2 = dict(b)
        t2 = dict(b["targets"])
        pos = 4  # mutate tokens from position 4 on
        for k in ("seq11", "seq12", "seq21", "seq22"):
            t2[k] = t2[k].at[:, pos:].set(7)
        b2["targets"] = t2
        out2 = run_forward(model, params, b2)
        np.testing.assert_allclose(
            np.asarray(out1["pred_logits"][:, :pos]),
            np.asarray(out2["pred_logits"][:, :pos]), atol=1e-5,
        )
        # ...and the mutated region DOES change
        assert not np.allclose(
            np.asarray(out1["pred_logits"][:, pos:]),
            np.asarray(out2["pred_logits"][:, pos:]), atol=1e-5,
        )

    def test_support_conditioning_matters(self, model_and_params):
        model, params = model_and_params
        b = make_batch()
        out1 = run_forward(model, params, b)
        b2 = dict(b)
        b2["support_coords"] = b["support_coords"] * 0.3 + 0.1
        out2 = run_forward(model, params, b2)
        assert not np.allclose(
            np.asarray(out1["pred_logits"]), np.asarray(out2["pred_logits"]),
            atol=1e-5,
        )


class TestDecode:
    def test_decode_contract(self, model_and_params):
        model, params = model_and_params
        b = make_batch()
        out = autoregressive_decode(
            model, params, b["query_images"], b["support_coords"],
            b["support_mask"], b["skeleton_edges"],
        )
        B, L = 2, CFG.seq_len
        assert out["pred_logits"].shape == (B, L, 3)
        assert out["pred_coords"].shape == (B, L, 2)
        assert out["gen_valid"].shape == (B, L)
        assert (np.asarray(out["lengths"]) >= 1).all()
        c = np.asarray(out["pred_coords"])
        assert (c >= 0).all() and (c <= 1).all()

    def test_min_len_suppresses_early_eos(self, model_and_params):
        """Sequences are at least min_decode_len (+1 for EOS) long unless
        max_len is hit (`roomformer_v2.py:460,533`)."""
        model, params = model_and_params
        b = make_batch(seed=3)
        out = autoregressive_decode(
            model, params, b["query_images"], b["support_coords"],
            b["support_mask"], b["skeleton_edges"],
        )
        lengths = np.asarray(out["lengths"])
        assert (lengths >= CFG.min_decode_len).all()


def _copy(tree):
    """Deep-copy params — the train step donates its input state, which
    would otherwise invalidate the shared module fixture."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_on_fixed_batch(self, model_and_params):
        """Overfit smoke test — the reference's own acceptance criterion
        (`README.md:212-214`, single-image overfit)."""
        from cape_tpu.train import create_train_state, make_train_step

        model, params = model_and_params
        cfg = CFG
        b = make_batch()
        state = create_train_state(cfg, _copy(params), steps_per_epoch=1)
        step = make_train_step(model, cfg, steps_per_epoch=1)
        rng = jax.random.PRNGKey(0)
        losses = []
        s = state
        for i in range(8):
            s, m = step(s, b, jax.random.fold_in(rng, i))
            losses.append(float(m["total"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    @pytest.mark.slow
    def test_frozen_affine_not_updated(self, model_and_params):
        from cape_tpu.train import create_train_state, make_train_step
        import flax

        model, params = model_and_params
        b = make_batch()
        # explicit freeze (the default auto-policy freezes only when
        # pretrained weights are loaded)
        cfg_frozen = CFG.replace(freeze_backbone_affine=True)
        state = create_train_state(cfg_frozen, _copy(params), steps_per_epoch=1)
        step = make_train_step(model, cfg_frozen, steps_per_epoch=1)
        # snapshot before stepping — the train step donates its input state
        flat0 = {
            k: np.asarray(v) for k, v in
            flax.traverse_util.flatten_dict(state.params).items()
        }
        s2, _ = step(state, b, jax.random.PRNGKey(0))
        flat1 = flax.traverse_util.flatten_dict(s2.params)
        changed_frozen = [
            "/".join(map(str, k)) for k in flat0
            if "frozen_affine" in "/".join(map(str, k))
            and not np.allclose(np.asarray(flat0[k]), np.asarray(flat1[k]))
        ]
        assert changed_frozen == []
        # but regular params did move
        moved = any(
            not np.allclose(np.asarray(flat0[k]), np.asarray(flat1[k]))
            for k in flat0 if "frozen_affine" not in "/".join(map(str, k))
        )
        assert moved
