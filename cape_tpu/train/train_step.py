"""Jitted train / eval-loss steps (data-parallel over the mesh).

Replaces `train_one_epoch_episodic`'s inner loop (`engine_cape.py:48-301`):
forward (teacher forced) -> weighted loss -> grad -> clip -> AdamW, all one
XLA program. Batches arrive sharded on the episode axis; params are
replicated, so XLA inserts the gradient all-reduce over ICI automatically
(the TPU-native `reduce_dict`). NaN guarding (`engine_cape.py:206-209`) is
host-side in the training loop via the returned loss scalars.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import CAPEConfig
from ..losses import cape_criterion
from ..models.cape import CAPE
from .state import TrainState, make_optimizer


def _forward_losses(model: CAPE, cfg: CAPEConfig, params, batch,
                    dropout_rng=None, sample_mask=None
                    ) -> Dict[str, jnp.ndarray]:
    deterministic = dropout_rng is None
    rngs = None if deterministic else {"dropout": dropout_rng}
    outputs = model.apply(
        {"params": params},
        batch["query_images"],
        batch["support_coords"],
        batch["support_mask"],
        batch["skeleton_edges"],
        batch["targets"],
        deterministic=deterministic,
        rngs=rngs,
    )
    return cape_criterion(outputs, batch["targets"], cfg,
                          sample_mask=sample_mask)


def make_train_step(model: CAPE, cfg: CAPEConfig, steps_per_epoch: int,
                    donate: bool = True, jit: bool = True
                    ) -> Callable[[TrainState, Dict, jax.Array],
                                  Tuple[TrainState, Dict]]:
    """Returns jitted (state, batch, rng) -> (state, metrics).

    ``donate=False`` / ``jit=False`` give an un-donated / traceable step
    body for embedding inside an outer jit (e.g. the multi-step
    `lax.fori_loop` in `scripts/bench_device_step.py`, where the carried
    state must stay live across iterations)."""
    tx = make_optimizer(cfg, steps_per_epoch)

    def loss_fn(params, batch, rng):
        losses = _forward_losses(model, cfg, params, batch, dropout_rng=rng)
        return losses["total"], losses

    # donate the state so params/opt-state update in place (no HBM copies)
    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_scan_train_step(model: CAPE, cfg: CAPEConfig, steps_per_epoch: int
                         ) -> Callable[[TrainState, Dict, jax.Array],
                                       Tuple[TrainState, Dict]]:
    """N real optimizer steps fused into ONE dispatch via `lax.scan`.

    Takes a STACKED batch pytree — every leaf has a leading
    `steps_per_dispatch` axis (one slice per optimizer step) — and scans
    the single-step body over it, splitting the dropout key per step. The
    device runs N sequential steps without returning to the host, so
    per-dispatch launch latency (seconds through a relay-attached TPU,
    ~100 us direct) is paid once per N steps instead of per step. Metrics
    come back with a leading (N,) axis so the host loop can log each
    sub-step and keep the NaN hard-exit per-step exact.
    """
    inner = make_train_step(model, cfg, steps_per_epoch, jit=False)

    @partial(jax.jit, donate_argnums=0)
    def scan_step(state: TrainState, stacked_batch: Dict, rng: jax.Array):
        def body(carry, batch):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = inner(st, batch, sub)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), stacked_batch)
        return state, metrics

    return scan_step


def make_eval_loss_fn(model: CAPE, cfg: CAPEConfig):
    """Jitted teacher-forced loss on a validation batch (no dropout).

    `sample_valid` padding rows (static-batch wrap-around duplicates) are
    excluded from the loss averages, so the reported eval loss reflects
    only real episodes (round-2 VERDICT weak item 4)."""

    @jax.jit
    def eval_loss(params, batch):
        return _forward_losses(model, cfg, params, batch,
                               sample_mask=batch.get("sample_valid"))

    return eval_loss
