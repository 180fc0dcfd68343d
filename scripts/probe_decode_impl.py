#!/usr/bin/env python
"""A/B the decode-step MSDA impl at B=1 and B=8 (flagship, TPU).

bench.py showed the 1-shot episode p50 going 71.5 ms (mxu kernels at the
decode step) -> 256 ms ('naive') -> 513 ms ('flat') while batched decode
IMPROVED 356 -> 299 ms — and the 68-kpt episode measuring CHEAPER than
the 17-kpt one, i.e. a large fixed per-episode cost appeared. This probe
times ONE thing (jitted autoregressive_decode, forced 18 tokens) under
each CAPE_MSDA_TINY setting with the encoder path fixed (auto -> mxu),
one subprocess per setting.

    timeout 3600 bash -c 'for s in mxu flat naive xla; do
        CAPE_MSDA_TINY=$s python scripts/probe_decode_impl.py; done'
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from cape_tpu.config import CAPEConfig
    from cape_tpu.models import CAPE
    from cape_tpu.models.cape import autoregressive_decode

    tiny = os.environ.get("CAPE_MSDA_TINY", "flat")
    batch = int(os.environ.get("PROBE_BATCH", "1"))
    cfg = CAPEConfig(dropout=0.0, bf16=True)
    model = CAPE(cfg)
    rng = np.random.default_rng(0)
    S, K, E = cfg.image_size, cfg.max_support_keypoints, cfg.max_skeleton_edges
    images = rng.uniform(size=(batch, S, S, 3)).astype(np.float32)
    sc = rng.uniform(size=(batch, K, 2)).astype(np.float32)
    sm = np.zeros((batch, K), bool)
    sm[:, 17:] = True
    edges = np.full((batch, E, 2), -1, np.int32)

    from cape_tpu.data.tokenizer import DiscreteTokenizer, tokenize_keypoints
    tok = DiscreteTokenizer(cfg.num_bins, cfg.seq_len)
    t = tokenize_keypoints(tok, rng.uniform(5, S - 5, (17, 2)), S, S)
    targets = {k: np.stack([v] * batch) for k, v in t.items()}
    params = model.init(jax.random.PRNGKey(0), images[:1], sc[:1], sm[:1],
                        edges[:1], {k: v[:1] for k, v in targets.items()})

    decode = jax.jit(lambda p, i, c, m, e: autoregressive_decode(
        model, p, i, c, m, e, force_length=18))

    t0 = time.perf_counter()
    out = decode(params, images, sc, sm, edges)
    np.asarray(out["pred_coords"]).ravel()[:1]
    compile_s = time.perf_counter() - t0

    def timed_queue(n):
        for _ in range(2):
            out = decode(params, images, sc, sm, edges)
        np.asarray(out["pred_coords"]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(n):
            out = decode(params, images, sc, sm, edges)
        np.asarray(out["pred_coords"]).ravel()[:1]
        return (time.perf_counter() - t0) / n

    ts = [timed_queue(10) for _ in range(3)]
    print(json.dumps({
        "tiny_impl": tiny, "batch": batch,
        "episode_ms": round(min(ts) * 1e3 / 1, 2),
        "per_episode_ms": round(min(ts) * 1e3 / batch, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
