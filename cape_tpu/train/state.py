"""Train state, optimizer with parameter groups, LR schedules.

Parity targets from the reference optimizer setup
(`models/train_cape_episodic.py:527-608`):
- AdamW, weight decay 1e-4;
- parameter groups: backbone at `lr_backbone` (1e-5), deformable
  `sampling_offsets` projections at `lr * lr_linear_proj_mult` (0.1x),
  everything else at `lr` (1e-4);
- frozen batch-norm affines are never optimized (they are buffers in the
  reference; here the 'frozen' label group receives lr=0);
- schedules: multistep(0.1 @ lr_drop) | cosine warm restarts
  (T_0, T_mult, eta_min) | onecycle, each with linear warmup epochs;
- global-norm clip 0.1, gradient accumulation via `optax.MultiSteps`
  (replaces the hand-rolled loop in `engine_cape.py:211-258`).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax
import jax.numpy as jnp
import optax

from ..config import CAPEConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_lr_schedule(cfg: CAPEConfig, base_lr: float, steps_per_epoch: int):
    """Per-step schedule: linear warmup then the configured scheduler."""
    warmup_steps = cfg.warmup_epochs * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = step / steps_per_epoch

        if cfg.scheduler == "multistep":
            factor = jnp.asarray(1.0, jnp.float32)
            for e in cfg.lr_drop_epochs:
                factor = factor * jnp.where(epoch >= e, 0.1, 1.0)
            lr = base_lr * factor
        elif cfg.scheduler == "onecycle":
            total = max(cfg.epochs * steps_per_epoch, 1)
            pct = jnp.clip(step / total, 0.0, 1.0)
            lr = cfg.eta_min + (base_lr - cfg.eta_min) * 0.5 * (
                1 + jnp.cos(math.pi * pct)
            )
        else:  # cosine_warmrestarts (default)
            # torch CosineAnnealingWarmRestarts: periods T_0, T_0*T_mult, ...
            t0, tm = float(cfg.t0), float(cfg.t_mult)
            e = epoch
            if tm == 1.0:
                t_cur = jnp.mod(e, t0)
                t_i = t0
            else:
                # closed form: find restart cycle n with
                # sum_{k<n} t0*tm^k <= e
                # epsilon guards exact restart boundaries against fp error
                # (log(4)/log(2) can evaluate to 1.9999...)
                n = jnp.floor(
                    jnp.log(jnp.maximum(e / t0 * (tm - 1) + 1, 1.0))
                    / jnp.log(tm) + 1e-6
                )
                start = t0 * (tm**n - 1) / (tm - 1)
                t_i = t0 * tm**n
                t_cur = e - start
            lr = cfg.eta_min + (base_lr - cfg.eta_min) * 0.5 * (
                1 + jnp.cos(math.pi * t_cur / t_i)
            )

        if warmup_steps > 0:
            warm = jnp.clip((step + 1) / warmup_steps, 0.0, 1.0)
            lr = lr * warm
        return lr

    return schedule


def _param_labels(params, freeze_affine: bool = True) -> Dict:
    """Label each leaf: frozen | backbone | offsets | base."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        joined = "/".join(str(p) for p in path)
        if "frozen_affine" in joined:
            labels[path] = "frozen" if freeze_affine else "backbone"
        elif "backbone" in joined:
            labels[path] = "backbone"
        elif "sampling_offsets" in joined:
            labels[path] = "offsets"
        else:
            labels[path] = "base"
    return flax.traverse_util.unflatten_dict(labels)


def _scale_by_group_lr(cfg: CAPEConfig, steps_per_epoch: int,
                       freeze_affine: bool) -> optax.GradientTransformation:
    """Final chain link: per-leaf `-lr_group(step) * update`.

    Replaces round-1's `optax.multi_transform` over three full AdamW
    instances: one shared `scale_by_adam` pass now feeds this single
    stateless-per-leaf scale, so XLA fuses the whole 46.6M-param update
    into one sweep instead of three masked ones. Math is identical to the
    reference's param groups (`train_cape_episodic.py:527-608`): each
    group gets its own schedule (same eta_min floor, per-group base lr);
    frozen affines get lr=0.
    """
    scheds = {
        "base": make_lr_schedule(cfg, cfg.lr, steps_per_epoch),
        "backbone": make_lr_schedule(cfg, cfg.lr_backbone, steps_per_epoch),
        "offsets": make_lr_schedule(
            cfg, cfg.lr * cfg.lr_linear_proj_mult, steps_per_epoch
        ),
    }

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        del params
        lrs = {k: s(state.count) for k, s in scheds.items()}
        lrs["frozen"] = jnp.zeros((), jnp.float32)
        flat_u = flax.traverse_util.flatten_dict(updates)
        flat_l = flax.traverse_util.flatten_dict(
            _param_labels(updates, freeze_affine)
        )
        scaled = {
            p: (-lrs[flat_l[p]]).astype(u.dtype) * u
            for p, u in flat_u.items()
        }
        new_updates = flax.traverse_util.unflatten_dict(scaled)
        return new_updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: CAPEConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    freeze_affine = (
        cfg.freeze_backbone_affine
        if cfg.freeze_backbone_affine is not None
        else bool(cfg.resnet_weights)
    )
    # Fused AdamW: clip -> one adam moment pass -> decoupled weight decay
    # -> per-leaf group lr. Equivalent to per-group optax.adamw (which is
    # scale_by_adam -> add_decayed_weights -> scale_by_learning_rate) but
    # a single tree sweep. Frozen affines carry (tiny, unused) moments and
    # receive lr=0, matching round-1's set_to_zero group.
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.scale_by_adam(),
        optax.add_decayed_weights(cfg.weight_decay),
        _scale_by_group_lr(cfg, steps_per_epoch, freeze_affine),
    )
    if cfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx


def create_train_state(cfg: CAPEConfig, variables, steps_per_epoch: int) -> TrainState:
    """Build state from `model.init(...)` output. `state.params` is the raw
    param dict (apply with `{'params': state.params}`)."""
    params = variables["params"] if "params" in variables else variables
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )
