"""Full episodic training loop: epochs, validation PCK, early stopping,
best-checkpoint tracking, resume.

Parity with the reference epoch loop (`train_cape_episodic.py:722-978`):
- per-epoch episodic training with fresh sampled episodes;
- per-epoch autoregressive validation on fixed episodes (stable curves);
- best-PCK checkpoints + last-N retention + patience early stopping;
- NaN-loss hard exit (`engine_cape.py:206-209`);
- host PRNG state saved for exact resume (§5.4).
"""

from __future__ import annotations

import math
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config import CAPEConfig
from ..data.episodic import (EpisodicSampler, episode_batches,
                             eval_batch_plan, validate_episode_batch)
from ..data.prefetch import prefetch, stack_batches
from ..data.mp100 import MP100Dataset
from ..eval.evaluate import evaluate_cape
from ..parallel import (global_shard_batch, global_shard_inputs,
                        global_shard_stacked_batch,
                        host_episode_slice, host_rng,
                        is_main, local_episode_count, make_mesh,
                        maybe_initialize, process_count, replicate,
                        shard_batch, shard_stacked_batch)
from ..utils.debug import debug_enabled
from ..utils.checkpoint import (CheckpointManager, jax_rng_state,
                                numpy_rng_state, restore_jax_rng)
from ..utils.logging import MetricLogger
from .state import create_train_state
from .train_step import (make_eval_loss_fn, make_scan_train_step,
                         make_train_step)


def train_loop(
    model,
    cfg: CAPEConfig,
    train_ds: MP100Dataset,
    val_ds: MP100Dataset,
    category_split_file: str,
    resume: Optional[str] = None,
    print_freq: int = 10,
) -> Dict:
    """Run the full training. Returns final stats dict."""
    # multi-host: initialize the distributed runtime if launched
    # multi-process (TPU pod / CAPE_COORDINATOR env — SURVEY.md §5.8)
    maybe_initialize()
    multi = process_count() > 1
    if not is_main():
        print_freq = 0  # log gating (reference setup_for_distributed)
    overfit = cfg.debug_overfit_category >= 0
    sampler = EpisodicSampler(
        train_ds, category_split_file, "train",
        num_queries=cfg.num_queries_per_episode,
        num_support=cfg.num_support_per_episode,
        overfit_category=cfg.debug_overfit_category,
        single_image=cfg.debug_single_image,
    )
    if overfit:
        # validate on the same overfit category/images (debug mode —
        # `train_cape_episodic.py:120-126`)
        val_sampler = EpisodicSampler(
            train_ds, category_split_file, "train", num_queries=1,
            num_support=cfg.num_support_per_episode,
            overfit_category=cfg.debug_overfit_category,
            single_image=cfg.debug_single_image,
        )
        val_ds = train_ds
    else:
        val_sampler = EpisodicSampler(
            val_ds, category_split_file, "val",
            num_queries=1, num_support=cfg.num_support_per_episode,
        )
    fixed_val = (
        val_sampler.fixed_episodes(cfg.val_episodes_per_epoch, cfg.val_seed)
        if cfg.fixed_val_episodes else None
    )
    # decode-length cap from the val split's max keypoint count (see
    # eval.evaluate.evaluate_cape: PCK-identical, faster per step)
    val_maxk = max((val_ds.coco.category_num_keypoints(c) or 0)
                   for c in val_sampler.categories)
    val_cap = min(cfg.seq_len, -(-(val_maxk + 2) // 8) * 8)

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    episodes = cfg.debug_overfit_episodes if overfit else cfg.episodes_per_epoch
    steps_per_epoch = max(episodes // cfg.batch_size, 1)
    # multi-step dispatch: round the epoch to whole scan groups (a ragged
    # final group would be a second XLA program for one partial dispatch)
    spd = max(1, cfg.steps_per_dispatch)
    if spd > 1:
        steps_per_epoch = max(steps_per_epoch // spd, 1) * spd
    # per-host input sharding: each host loads its slice of the global
    # episode batch from a process-disjoint sampling stream (the TPU-native
    # DistributedSampler; reference DDP analogue `util/misc.py:341-377`)
    local_batch = local_episode_count(cfg.batch_size) if multi else cfg.batch_size
    rng = host_rng(cfg.seed) if multi else np.random.default_rng(cfg.seed)
    jrng = jax.random.PRNGKey(cfg.seed)  # identical across hosts (dropout
    # keys must agree: the train step runs one global SPMD program)

    # init params on a probe batch
    probe = next(episode_batches(
        train_ds, sampler, local_batch, 1, cfg.image_size,
        cfg.max_support_keypoints, cfg.max_skeleton_edges, rng,
    ))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed), probe["query_images"],
        probe["support_coords"], probe["support_mask"],
        probe["skeleton_edges"], probe["targets"],
    )
    if cfg.resnet_weights:
        from ..models.backbone import load_torch_resnet50_npz

        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"]["backbone"] = load_torch_resnet50_npz(
            variables["params"]["backbone"], cfg.resnet_weights
        )
        if is_main():
            print(f"Loaded ImageNet backbone weights from "
                  f"{cfg.resnet_weights}", flush=True)
    state = create_train_state(cfg, variables, steps_per_epoch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    if is_main():
        print(f"Model parameters: {n_params:,}", flush=True)

    ckpt = CheckpointManager(cfg.output_dir)
    start_epoch, best_pck, patience = 0, 0.0, 0
    if resume:
        state, meta = ckpt.restore(resume, state)
        start_epoch = meta["epoch"] + 1
        best_pck = meta.get("best_pck", 0.0)
        patience = meta.get("patience", 0)
        if meta.get("rng_state") and not multi:
            # single-host: exact data-order resume. Multi-host re-derives
            # process-disjoint streams instead (the saved state is host 0's).
            rng.bit_generator.state = meta["rng_state"]
        elif multi:
            rng = host_rng(cfg.seed, epoch=start_epoch)
        if meta.get("jrng_state"):
            jrng = restore_jax_rng(meta["jrng_state"])  # exact dropout resume
        if is_main():
            print(f"Resumed from {resume} at epoch {start_epoch} "
                  f"(best PCK {best_pck:.2%})", flush=True)

    state = replicate(state, mesh)
    train_step = (make_scan_train_step(model, cfg, steps_per_epoch)
                  if spd > 1 else
                  make_train_step(model, cfg, steps_per_epoch))
    eval_loss_fn = make_eval_loss_fn(model, cfg)

    history = []
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        logger = MetricLogger()
        # shard/device-put on the prefetch thread: transfers overlap the
        # previous step's device compute (per-call transfer latency over
        # the device link otherwise dominates the 6 ms train step)
        def validated(gen):
            # episodic-structure validation on the producer thread
            # (reference model-entry checks, cape_model.py:99-117)
            for b in gen:
                validate_episode_batch(b)
                yield b

        def to_device(b):
            if spd > 1:
                return (global_shard_stacked_batch(b, mesh) if multi
                        else shard_stacked_batch(b, mesh))
            return (global_shard_batch(b, mesh) if multi
                    else shard_batch(b, mesh))
        stream = validated(episode_batches(
            train_ds, sampler, local_batch, steps_per_epoch,
            cfg.image_size, cfg.max_support_keypoints,
            cfg.max_skeleton_edges, rng,
            num_threads=cfg.num_data_threads,
        ))
        if spd > 1:
            # fuse spd host batches into one (spd, B, ...) dispatch group
            stream = stack_batches(stream, spd)
        batches = prefetch(stream, transform=to_device)
        for it, batch in enumerate(logger.log_every(
                batches, print_freq, header=f"Epoch [{epoch}]")):
            # xprof tracing of steps 2-4 of the first epoch (jax.profiler;
            # TPU equivalent of the reference's MetricLogger timings +
            # cudnn_benchmark knob, SURVEY.md §5.1)
            if cfg.profile_dir and epoch == start_epoch and it == 2:
                jax.profiler.start_trace(cfg.profile_dir)
            jrng, step_rng = jax.random.split(jrng)
            state, metrics = train_step(state, batch, step_rng)
            if cfg.profile_dir and epoch == start_epoch and it == 4:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
            # spd>1: each metric carries a leading (spd,) axis — log every
            # real optimizer step so averages/NaN checks stay per-step
            host_m = {k: np.atleast_1d(np.asarray(v))
                      for k, v in metrics.items()}
            for j, total in enumerate(host_m["total"]):
                total = float(total)
                if math.isnan(total):
                    raise RuntimeError(
                        f"NaN loss at epoch {epoch} step {it * spd + j} — "
                        f"aborting (parity with engine_cape.py:206-209)"
                    )
                logger.update(
                    loss=total, loss_ce=float(host_m["loss_ce"][j]),
                    loss_coords=float(host_m["loss_coords"][j]),
                    grad_norm=float(host_m["grad_norm"][j]),
                )
                if debug_enabled("DEBUG_CAPE"):
                    parts = " ".join(f"{k}={float(v[j]):.4f}"
                                     for k, v in sorted(host_m.items()))
                    print(f"[DEBUG_CAPE] epoch {epoch} it {it * spd + j}: "
                          f"{parts}", flush=True)

        # ---- validation ----
        # batched decode: B episodes per step (one per chip on an N-chip
        # mesh) instead of the reference's batch-1 protocol — same episodes,
        # ~eval_batch_size x less redundant work (VERDICT weak item 7)
        if multi:
            # sharded pod evaluation: each host decodes a DISJOINT slice of
            # the fixed episodes inside one SPMD program; the decode outputs
            # + metadata all-gather so every host scores the full set and
            # checkpoint/early-stop decisions stay identical (P-fold less
            # decode work than lockstep replication)
            P = process_count()
            if fixed_val is not None:
                fixed_local, local_valid = host_episode_slice(
                    fixed_val, cfg.val_episodes_per_epoch)
            else:
                fixed_local = None
                local_valid = -(-cfg.val_episodes_per_epoch // P)
            per_host = -(-cfg.val_episodes_per_epoch // P)
            eval_b, n_val_batches = eval_batch_plan(
                per_host, max(1, cfg.eval_batch_size // P))
            # the global eval batch (P * eval_b) must divide the mesh:
            # round the per-host batch up to a multiple of local devices
            # (extra rows are invalid-flagged padding)
            ld = len(jax.local_devices())
            eval_b = -(-eval_b // ld) * ld
            n_val_batches = -(-per_host // eval_b)
            val_rng = np.random.default_rng(
                [cfg.val_seed, jax.process_index()])
            val_batches = episode_batches(
                val_ds, val_sampler, eval_b, n_val_batches,
                cfg.image_size, cfg.max_support_keypoints,
                cfg.max_skeleton_edges, val_rng,
                fixed=fixed_local, total_episodes=local_valid,
                num_threads=cfg.num_data_threads,
            )
            val_stats = evaluate_cape(
                model, state.params,
                prefetch(val_batches,
                         transform=lambda b: global_shard_inputs(b, mesh)),
                cfg, multihost=True, decode_max_len=val_cap,
            )
        else:
            eval_b, n_val_batches = eval_batch_plan(
                cfg.val_episodes_per_epoch, cfg.eval_batch_size)
            val_batches = episode_batches(
                val_ds, val_sampler, eval_b, n_val_batches,
                cfg.image_size, cfg.max_support_keypoints,
                cfg.max_skeleton_edges, np.random.default_rng(cfg.val_seed),
                fixed=fixed_val, total_episodes=cfg.val_episodes_per_epoch,
                num_threads=cfg.num_data_threads,
            )
            val_stats = evaluate_cape(
                model, state.params,
                prefetch(val_batches,
                         transform=lambda b: shard_batch(b, mesh)),
                cfg, compute_loss=True, eval_loss_fn=eval_loss_fn,
                decode_max_len=val_cap,
            )
        pck = val_stats["pck"]
        train_loss = logger.meters["loss"].global_avg
        if is_main():
            print(
                f"Epoch {epoch}: train loss {train_loss:.4f} | val PCK@0.2 "
                f"{pck:.2%} (macro {val_stats['pck_mean_categories']:.2%}) | "
                f"{time.time() - t0:.1f}s", flush=True,
            )
        # overfitting heuristic banner (reference
        # `train_cape_episodic.py:793-835` val/train ratio banding)
        val_loss = val_stats.get("total", 0.0)
        if train_loss > 0 and val_loss > 0:
            ratio = val_loss / train_loss
            if ratio > 2.0:
                print(f"  ⚠ val/train loss ratio {ratio:.2f} — strong "
                      f"overfitting signs", flush=True)
            elif ratio > 1.5:
                print(f"  note: val/train loss ratio {ratio:.2f} — mild "
                      f"overfitting", flush=True)
        history.append({"epoch": epoch, "train_loss": train_loss, "pck": pck})

        # ---- checkpointing / early stopping ----
        # multi-host: state is replicated, so process 0 alone writes
        # (reference `save_on_master`, util/misc.py:338-340); the host-numpy
        # conversion keeps the orbax write local to that process
        save_state = (jax.tree_util.tree_map(np.asarray, state)
                      if multi and is_main() else state)
        improved = pck > best_pck
        if improved:
            best_pck = pck
            patience = 0
            if is_main():
                ckpt.save_best(save_state, epoch, pck, cfg, best_pck,
                               patience, rng_state=numpy_rng_state(rng),
                               jrng_state=jax_rng_state(jrng))
        else:
            patience += 1
        if is_main():
            ckpt.save_epoch(save_state, epoch, cfg, best_pck, patience,
                            rng_state=numpy_rng_state(rng),
                            jrng_state=jax_rng_state(jrng),
                            extra={"val_stats": {
                                k: v for k, v in val_stats.items()
                                if np.isscalar(v)}})
        if cfg.early_stopping_patience and patience >= cfg.early_stopping_patience:
            if is_main():
                print(f"Early stopping at epoch {epoch} (no PCK "
                      f"improvement for {patience} epochs)", flush=True)
            break

    ckpt.wait()  # flush the last async checkpoint write
    return {"best_pck": best_pck, "history": history, "params": state.params}
