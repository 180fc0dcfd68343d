"""Data-parallel math must equal single-device math (VERDICT weak item 3).

One train step on a batch-8 episode batch sharded over the 8-device CPU
mesh vs the same step with everything on one device: loss and updated
params must agree. This is the invariant the reference's DDP would need
(`util/misc.py:341-377`) and the one the multichip dryrun exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cape_tpu.config import tiny_test_config
from cape_tpu.models import CAPE
from cape_tpu.parallel import make_mesh, replicate, shard_batch
from cape_tpu.train import create_train_state, make_train_step

from test_config_knobs import _batch


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    n = len(jax.devices())
    assert n >= 8, f"conftest should force 8 CPU devices, got {n}"
    cfg = tiny_test_config(batch_size=8, accumulation_steps=1)
    model = CAPE(cfg)
    imgs, sc, sm, se, targets = _batch(cfg, batch=8, seed=3)
    batch = dict(query_images=imgs, support_coords=sc, support_mask=sm,
                 skeleton_edges=se, targets=targets)

    variables = model.init(jax.random.PRNGKey(0), imgs, sc, sm, se, targets)
    # keep master weights on host: the donated train step deletes its input
    # device buffers, and both runs must start from identical params
    variables = jax.tree_util.tree_map(np.asarray, variables)
    step = make_train_step(model, cfg, steps_per_epoch=1)
    rng = jax.random.PRNGKey(7)

    def run(mesh_devices):
        mesh = make_mesh((len(mesh_devices),), ("data",),
                         devices=mesh_devices)
        state = create_train_state(cfg, variables, steps_per_epoch=1)
        state = replicate(state, mesh)
        b = shard_batch(batch, mesh)
        new_state, metrics = step(state, b, rng)
        return (float(metrics["total"]),
                jax.tree_util.tree_map(np.asarray, new_state.params))

    loss_1, params_1 = run(jax.devices()[:1])
    loss_8, params_8 = run(jax.devices()[:8])

    # identical data, identical math; only the grad-reduction order differs
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5, atol=1e-6)
    leaves_1 = jax.tree_util.tree_leaves(params_1)
    leaves_8 = jax.tree_util.tree_leaves(params_8)
    assert len(leaves_1) == len(leaves_8)
    for a, b in zip(leaves_1, leaves_8):
        # atol 1e-5: the 8-way psum reduces grads in a different order than
        # the single-device sum; post-Adam the worst observed leaf deviation
        # is ~6e-6 on O(0.1) weights
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
