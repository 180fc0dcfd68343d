"""Fused optimizer must match the explicit per-group AdamW formulation.

The reference builds three torch AdamW param groups
(`models/train_cape_episodic.py:527-608`); round 1 mirrored that with
`optax.multi_transform` over three `optax.adamw` instances. Round 2 fuses
them into one chain (`train/state.py:make_optimizer`). This test pins the
fused chain to the unfused multi_transform oracle bit-for-bit over several
steps, including warmup and the frozen-affine group.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.train.state import _param_labels, make_lr_schedule, make_optimizer


def _fake_params(key):
    k = jax.random.split(key, 6)
    return {
        "backbone": {
            "conv": {"kernel": jax.random.normal(k[0], (3, 3, 4, 8)) * 0.1},
            "frozen_affine": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
        },
        "encoder": {
            "sampling_offsets": {
                "kernel": jax.random.normal(k[1], (16, 32)) * 0.1,
                "bias": jnp.zeros((32,)),
            },
            "ffn": {"kernel": jax.random.normal(k[2], (16, 16)) * 0.1},
        },
        "head": {"kernel": jax.random.normal(k[3], (16, 10)) * 0.1,
                 "bias": jnp.zeros((10,))},
    }


def _oracle_optimizer(cfg, steps_per_epoch):
    """Round-1 formulation: multi_transform of per-group optax.adamw."""
    def adamw(lr):
        return optax.adamw(
            make_lr_schedule(cfg, lr, steps_per_epoch),
            weight_decay=cfg.weight_decay,
        )

    groups = optax.multi_transform(
        {
            "base": adamw(cfg.lr),
            "backbone": adamw(cfg.lr_backbone),
            "offsets": adamw(cfg.lr * cfg.lr_linear_proj_mult),
            "frozen": optax.set_to_zero(),
        },
        lambda params: _param_labels(params, freeze_affine=True),
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm), groups
    )


@pytest.mark.parametrize("scheduler", ["cosine_warmrestarts", "multistep"])
def test_fused_matches_per_group_adamw(scheduler):
    cfg = tiny_test_config(
        scheduler=scheduler,
        warmup_epochs=1,
        accumulation_steps=1,
        freeze_backbone_affine=True,
    )
    spe = 3
    params = _fake_params(jax.random.PRNGKey(0))
    p_fused = jax.tree_util.tree_map(jnp.copy, params)
    p_oracle = jax.tree_util.tree_map(jnp.copy, params)

    fused = make_optimizer(cfg, steps_per_epoch=spe)
    oracle = _oracle_optimizer(cfg, steps_per_epoch=spe)
    s_fused = fused.init(p_fused)
    s_oracle = oracle.init(p_oracle)

    key = jax.random.PRNGKey(1)
    for step in range(7):
        key, sub = jax.random.split(key)
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(sub, p.shape), params
        )
        u_f, s_fused = fused.update(grads, s_fused, p_fused)
        p_fused = optax.apply_updates(p_fused, u_f)
        u_o, s_oracle = oracle.update(grads, s_oracle, p_oracle)
        p_oracle = optax.apply_updates(p_oracle, u_o)

    flat_f = jax.tree_util.tree_leaves(p_fused)
    flat_o = jax.tree_util.tree_leaves(p_oracle)
    for a, b in zip(flat_f, flat_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # frozen affines must not have moved at all
    np.testing.assert_array_equal(
        np.asarray(p_fused["backbone"]["frozen_affine"]["scale"]),
        np.ones((8,), np.float32),
    )


def test_fused_with_accumulation_steps():
    """MultiSteps wrapper: params change only every k micro-steps."""
    cfg = tiny_test_config(accumulation_steps=3, freeze_backbone_affine=True)
    params = _fake_params(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, steps_per_epoch=2)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    p = params
    for micro in range(3):
        u, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, u)
        moved = any(
            bool(jnp.any(a != b))
            for a, b in zip(jax.tree_util.tree_leaves(p),
                            jax.tree_util.tree_leaves(params))
        )
        assert moved == (micro == 2), f"micro-step {micro}: moved={moved}"
