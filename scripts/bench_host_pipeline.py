#!/usr/bin/env python
"""Host input-pipeline benchmark: per-record stage costs + sustained
loader-fed training throughput (round-3 VERDICT item 2).

Builds a realistic synthetic MP-100 fixture (512x640 images — real MP-100
photos are this scale pre-crop), then measures:

1. per-record host cost for the train path (decode+crop -> augment ->
   tokenize), cold vs. crop-cache-warm, with a stage breakdown;
2. per-record cost for the deterministic val path, cold vs.
   record-cache-warm (fixed-episode validation is a pure replay);
3. sustained loader-fed train-step time: the REAL
   `episode_batches -> prefetch(device_put) -> train_step` path on the
   available device, vs. the device-resident step time on the same batch —
   the ratio VERDICT item 2 asks to publish.

Usage:
    JAX_PLATFORMS=cpu python scripts/bench_host_pipeline.py --tiny   # smoke
    python scripts/bench_host_pipeline.py                            # TPU

Prints one JSON line with all measurements.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true",
                   help="tiny model/images (CPU smoke)")
    p.add_argument("--steps", type=int, default=12,
                   help="sustained-loop measured steps")
    p.add_argument("--threads", type=int, default=None,
                   help="loader threads (default: min(8, cpu_count))")
    args = p.parse_args()

    from cape_tpu.config import CAPEConfig, tiny_test_config
    from cape_tpu.data.mp100 import MP100Dataset
    from cape_tpu.data.synthetic import make_synthetic_mp100
    from cape_tpu.data.tokenizer import DiscreteTokenizer

    threads = args.threads or min(8, os.cpu_count() or 1)
    if args.tiny:
        cfg = tiny_test_config(batch_size=2, num_data_threads=threads)
        img_hw = (128, 160)
    else:
        cfg = CAPEConfig(batch_size=4, accumulation_steps=1, dropout=0.1,
                         num_data_threads=threads)
        img_hw = (512, 640)

    tmp = tempfile.mkdtemp(prefix="host_bench_")
    paths = make_synthetic_mp100(
        tmp, num_categories=6, images_per_category=8,
        keypoint_range=(8, 17), image_size=img_hw, learnable=True)
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)

    results = {"image_hw": list(img_hw), "image_size": cfg.image_size,
               "threads": threads}

    # ---- 1. train-path record cost ------------------------------------
    ds = MP100Dataset(paths["img_dir"], paths["train_ann"], tok,
                      image_size=cfg.image_size, split="train",
                      cache_mb=cfg.data_cache_mb,
                      uint8_images=cfg.uint8_transfer)
    rng = np.random.default_rng(0)
    n = len(ds)

    def cold_record():
        ds._crop_cache.d.clear(); ds._crop_cache.bytes = 0
        return ds.get_record(rng.integers(n), rng)

    results["train_record_cold_ms"] = round(timeit(cold_record, 20) * 1e3, 3)
    ds.get_record(0, rng)  # warm every id once
    for i in range(n):
        ds._load_crop(ds.ids[i])
    results["train_record_cached_ms"] = round(
        timeit(lambda: ds.get_record(int(rng.integers(n)), rng), 30) * 1e3, 3)

    # stage breakdown on one representative record
    from cape_tpu.data.augment import resize_with_keypoints, train_augment
    from cape_tpu.data.tokenizer import tokenize_keypoints
    img_id = ds.ids[0]
    results["decode_crop_ms"] = round(timeit(
        lambda: (ds._crop_cache.d.clear(), ds._load_crop(img_id)), 20) * 1e3, 3)
    crop, kpts, vis, ann, bw, bh = ds._load_crop(img_id)
    results["augment_ms"] = round(timeit(
        lambda: train_augment(crop, kpts.copy(), cfg.image_size, rng),
        20) * 1e3, 3)
    results["resize_only_ms"] = round(timeit(
        lambda: resize_with_keypoints(crop, kpts.copy(), cfg.image_size),
        20) * 1e3, 3)
    aug_img, aug_k = train_augment(crop, kpts.copy(), cfg.image_size, rng)
    results["tokenize_ms"] = round(timeit(
        lambda: tokenize_keypoints(tok, aug_k, cfg.image_size,
                                   cfg.image_size, vis, 1), 50) * 1e3, 3)

    # ---- 2. val-path record cost --------------------------------------
    vds = MP100Dataset(paths["img_dir"], paths["val_ann"], tok,
                       image_size=cfg.image_size, split="val",
                       cache_mb=cfg.data_cache_mb,
                       uint8_images=cfg.uint8_transfer)
    vn = len(vds)

    def cold_val():
        vds._record_cache.d.clear(); vds._record_cache.bytes = 0
        vds._crop_cache.d.clear(); vds._crop_cache.bytes = 0
        return vds.get_record(int(rng.integers(vn)))

    results["val_record_cold_ms"] = round(timeit(cold_val, 15) * 1e3, 3)
    for i in range(vn):
        vds.get_record(i)
    results["val_record_cached_ms"] = round(timeit(
        lambda: vds.get_record(int(rng.integers(vn))), 50) * 1e3, 3)

    # ---- 3. sustained loader-fed training ------------------------------
    import jax

    from cape_tpu.data.episodic import EpisodicSampler, episode_batches
    from cape_tpu.data.prefetch import prefetch
    from cape_tpu.models import CAPE
    from cape_tpu.parallel import make_mesh, replicate, shard_batch
    from cape_tpu.train import create_train_state, make_train_step

    model = CAPE(cfg)
    sampler = EpisodicSampler(ds, paths["split_file"], "train",
                              num_queries=cfg.num_queries_per_episode,
                              num_support=cfg.num_support_per_episode)
    steps = args.steps
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)

    def make_batches(num, thr):
        return episode_batches(
            ds, sampler, cfg.batch_size, num, cfg.image_size,
            cfg.max_support_keypoints, cfg.max_skeleton_edges,
            np.random.default_rng(1), num_threads=thr)

    probe = next(make_batches(1, 1))
    variables = model.init(jax.random.PRNGKey(0), probe["query_images"],
                           probe["support_coords"], probe["support_mask"],
                           probe["skeleton_edges"], probe["targets"])
    state = create_train_state(cfg, variables, steps_per_epoch=100)
    state = replicate(state, mesh)
    step = make_train_step(model, cfg, steps_per_epoch=100)
    jrng = jax.random.PRNGKey(0)

    # device-resident step time. Timing protocol (relay-honest, see
    # PERF.md round-3 note): chain N steps through the donated state and
    # sync ONCE with a real device->host value fetch — per-iteration
    # block_until_ready returns early through the axon relay.
    dbatch = shard_batch(probe, mesh)

    def run_chain(n):
        nonlocal state
        m = None
        for _ in range(n):
            state, m = step(state, dbatch, jrng)
        float(m["total"])

    run_chain(3)  # compile + warm
    t0 = time.perf_counter()
    run_chain(steps)
    results["device_step_ms"] = round(
        (time.perf_counter() - t0) / steps * 1e3, 2)

    # loader-fed sustained loop (prefetch thread device-puts); same
    # chained timing: total wall over `steps` steps with one final sync
    def sustained(thr):
        batches = prefetch(make_batches(steps + 3, thr),
                           transform=lambda b: shard_batch(b, mesh))
        nonlocal state
        m = None
        n = t0 = 0
        for i, b in enumerate(batches):
            if i == 3:  # skip warm-in
                float(m["total"])
                t0 = time.perf_counter()
            state, m = step(state, b, jrng)
            if i >= 3:
                n += 1
        float(m["total"])
        return (time.perf_counter() - t0) / n if n else float("nan")

    for thr in sorted({1, threads}):
        key = f"sustained_step_ms_threads{thr}"
        results[key] = round(sustained(thr) * 1e3, 2)
    sus = results[f"sustained_step_ms_threads{threads}"]
    results["sustained_over_device"] = round(
        sus / results["device_step_ms"], 2)
    results["records_per_step"] = cfg.batch_size * (
        cfg.num_queries_per_episode + cfg.num_support_per_episode)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
