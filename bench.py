"""Benchmark: 1-shot CAPE eval episode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: flagship model (ResNet-50, 6+6 layers, d=256, 512x512 images,
seq_len 200), batch = 1 episode (the reference eval protocol,
`eval_cape_checkpoint.py:296-317`), full autoregressive decode (encoder
once + while_loop decode with KV caches capped at the category length +
margin — the eval CLI's decode_max_len=auto production default). Reported value = episodes/sec (average
over a queued batch of timed runs with a hard device->host sync — see the
timing-protocol note in main(); `block_until_ready` alone does not reliably
block through the axon relay); also prints episode latency to stderr.

Baseline: the reference publishes no benchmark numbers (BASELINE.md), so we
MEASURED it: `scripts/bench_reference_baseline.py` imports the reference
implementation read-only, builds the CAPE-default transformer + geometric
support encoder on torch-CPU, and times the same 18-token forced episode
protocol (support encode + 6-layer deformable encoder + 18 KV-cached decode
steps with the reference's host-side per-step re-tokenization). Measured
2026-08-16 on this container: 0.3204 episodes/sec (3.12 s/episode:
encoder 2.16 s, 17 decode steps 0.95 s, support 5 ms) — with the ResNet-50
backbone and input projections EXCLUDED (torchvision unavailable), so the
true reference throughput is LOWER and vs_baseline understates the speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# measured torch-CPU reference throughput (scripts/bench_reference_baseline.py)
BASELINE_EPISODES_PER_SEC = 0.3204


def _require_device(timeout_s: float = 300.0):
    """Initialize the JAX backend with a hard timeout.

    Backend init blocks indefinitely when the axon TPU relay is down
    (observed 2026-08-18: 9h outage); better to fail loudly than hang the
    driver. The probe runs in a daemon thread so a stuck init can't keep
    the process alive past the timeout."""
    import threading

    result = {}

    def probe():
        import jax

        result["platform"] = jax.devices()[0].platform

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "platform" not in result:
        print(
            f"bench.py: JAX backend init did not complete in {timeout_s:.0f}s "
            "(TPU relay unreachable?) — aborting without a measurement",
            file=sys.stderr,
        )
        os._exit(1)
    print(f"bench.py: device platform = {result['platform']}", file=sys.stderr)


def main():
    _require_device()
    import jax

    from cape_tpu.config import CAPEConfig
    from cape_tpu.models import CAPE
    from cape_tpu.models.cape import autoregressive_decode

    cfg = CAPEConfig(dropout=0.0, bf16=True)  # flagship: 512px, 6+6, d=256
    model = CAPE(cfg)
    rng = np.random.default_rng(0)
    B, S, K, E = 1, cfg.image_size, cfg.max_support_keypoints, cfg.max_skeleton_edges
    images = np.asarray(rng.uniform(size=(B, S, S, 3)), np.float32)
    sc = np.asarray(rng.uniform(size=(B, K, 2)), np.float32)
    sm = np.zeros((B, K), bool)
    sm[:, 17:] = True  # 17-keypoint category
    edges = np.full((B, E, 2), -1, np.int32)
    edges[:, :16] = np.stack([np.arange(1, 17), np.arange(2, 18)], -1)

    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints

    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    t = tokenize_keypoints(tok, rng.uniform(5, S - 5, (17, 2)), S, S)
    targets = {k: np.stack([v] * B) for k, v in t.items()}

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), images, sc, sm, edges, targets
    )
    # force_length=18 makes every episode generate a trained-model-
    # representative 17-keypoint sequence + EOS even with random params
    # (otherwise early random EOS would flatter the number). max_len caps
    # the KV caches at the category length + margin exactly as the eval
    # CLI's decode_max_len=auto default does (bit-identical decode — see
    # autoregressive_decode; the torch reference's dynamically-growing
    # caches never pay the full seq_len either, so the cap is also the
    # fair baseline comparison).
    decode = jax.jit(
        lambda p, i, c, m, e: autoregressive_decode(
            model, p, i, c, m, e, force_length=18, max_len=24)
    )

    # Timing protocol (relay-honest): `jax.block_until_ready` can return
    # before the device drains through the axon relay (measured: it yields
    # impossible >1.0 MFU on the train step), so every measurement below
    # queues N executions and then FETCHES the last output's value to host
    # (np.asarray) — a real device->host sync. TPU cores run executables
    # in dispatch order, so the last fetch bounds all N; avg = wall / N.
    def timed_queue(fn, fetch_key, n, warmup=2):
        for _ in range(warmup):
            out = fn()
        np.asarray(out[fetch_key]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out[fetch_key]).ravel()[:1]
        return (time.perf_counter() - t0) / n

    p50 = timed_queue(lambda: decode(params, images, sc, sm, edges),
                      "pred_coords", 10)
    eps = B / p50
    print(f"p50 episode latency: {p50 * 1000:.1f} ms on "
          f"{jax.devices()[0].platform}", file=sys.stderr)

    # 68-keypoint episode (MP-100's largest category; the protocol spans
    # 9-68 kpts) — reported to stderr alongside the headline 17-kpt number
    sm68 = np.zeros((B, K), bool)
    sm68[:, 68:] = True
    decode68 = jax.jit(
        lambda p, i, c, m, e: autoregressive_decode(
            model, p, i, c, m, e, force_length=69, max_len=72)
    )
    t68 = timed_queue(lambda: decode68(params, images, sc, sm68, edges),
                      "pred_coords", 5)
    print(f"68-kpt episode latency: {t68 * 1000:.1f} ms"
          f" ({B / t68:.0f} eps/sec)", file=sys.stderr)

    # fleet-representative eval throughput: the MP-100 split-1 TEST mix
    # spans 9-68 keypoints (`engine_cape.py:743-798` extracts K coords per
    # category). Per-category counts below are the public per-source-
    # dataset keypoint definitions for the 20 test categories in
    # `/root/reference/category_splits.json` (AnimalWeb faces 9, CUB birds
    # 15, AP-10K/animal-pose bodies 17, Keypoint-5 furniture 10/13,
    # DeepFashion2 garments 29/39) — approximate where the container has
    # no annotations to read exact counts from. Per-episode latency is
    # interpolated linearly in decode length between the two measured
    # points (17-kpt and 68-kpt episodes above).
    test_mix = [9] * 5 + [15] * 2 + [17] * 9 + [10, 13, 29, 39]
    slope_per_tok = (t68 - p50) / (69 - 18)
    lat = [p50 + slope_per_tok * (k + 1 - 18) for k in test_mix]
    fleet_eps = len(lat) / sum(lat)
    print(f"fleet-weighted eval throughput (MP-100 split-1 test mix, "
          f"{len(test_mix)} categories, 9-39 kpts): "
          f"{fleet_eps:.1f} eps/sec/chip "
          f"(mean episode {1e3 * sum(lat) / len(lat):.1f} ms)",
          file=sys.stderr)

    # batched decode throughput (serving mode): the reference is locked to
    # batch 1 by ragged torch shapes; our fixed-shape episodes batch freely
    B8 = 8
    images8 = np.repeat(images, B8, 0)
    sc8 = np.repeat(sc, B8, 0)
    sm8 = np.repeat(sm, B8, 0)
    edges8 = np.repeat(edges, B8, 0)
    args8 = jax.device_put((images8, sc8, sm8, edges8))
    p50_8 = timed_queue(lambda: decode(params, *args8), "pred_coords", 10)
    print(f"batched decode (B=8): {p50_8 * 1000:.2f} ms -> "
          f"{B8 / p50_8:.0f} eps/sec/chip throughput", file=sys.stderr)

    # train step (fwd+loss+bwd+clip+fused AdamW), batch 4, device-resident
    # batch (the training loop device-puts on the prefetch thread)
    from cape_tpu.train import create_train_state, make_train_step

    tcfg = cfg.replace(dropout=0.1, batch_size=4, accumulation_steps=1)
    model_t = CAPE(tcfg)  # dropout rates live in the modules, not the step
    tb = 4
    tbatch = jax.device_put(dict(
        query_images=np.repeat(images, tb, 0),
        support_coords=np.repeat(sc, tb, 0),
        support_mask=np.repeat(sm, tb, 0),
        skeleton_edges=np.repeat(edges, tb, 0),
        targets={k: np.repeat(v[:1], tb, 0) for k, v in targets.items()},
    ))
    state = create_train_state(tcfg, params, steps_per_epoch=100)
    step = make_train_step(model_t, tcfg, steps_per_epoch=100)
    jrng = jax.device_put(jax.random.PRNGKey(0))
    def run_steps(n):
        nonlocal state
        metrics = None
        for _ in range(n):
            state, metrics = step(state, tbatch, jrng)
        float(metrics["total"])
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[:1]

    run_steps(3)  # compile + warm
    t0 = time.perf_counter()
    run_steps(10)
    tstep = (time.perf_counter() - t0) / 10
    print(f"train step p50 (batch {tb}): {tstep * 1000:.1f} ms "
          f"({tb / tstep:.0f} queries/sec)", file=sys.stderr)
    print(json.dumps({
        "metric": "episodes_per_sec_1shot_eval",
        "value": round(eps, 4),
        "unit": "episodes/sec/chip",
        "vs_baseline": round(eps / BASELINE_EPISODES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
