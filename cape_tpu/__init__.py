"""cape_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
Category-Agnostic Pose Estimation (CAPE) on the MP-100 benchmark.

Re-designed from scratch for TPU hardware with the same capabilities as the
PyTorch reference `nkkrnkl/category-agnostic-pose-estimation`:

- Episodic MP-100 data pipeline (bbox crop, resize, appearance augmentation,
  discrete coordinate tokenization) on the host, feeding fixed-shape batches.
- ResNet-50 backbone + multi-scale deformable-attention encoder + causal
  token decoder with support cross-attention, as flax.linen modules compiled
  by XLA (deformable sampling has a Pallas kernel with an XLA-gather
  fallback).
- Autoregressive keypoint decoding as a single fused `lax.scan` with static
  KV caches — no host<->device sync per step.
- Data-parallel training over a `jax.sharding.Mesh` via jit + NamedSharding;
  multi-host pods via `jax.distributed` with per-host input sharding and
  process-0 checkpoint/log gating.
- Batch-parallel autoregressive PCK@0.2 evaluation with a 6-part leakage
  audit, orbax checkpointing (best-PCK + retention + exact RNG resume),
  episodic training / evaluation / visualization CLIs.

Package layout:
    cape_tpu.config      — typed dataclass configuration (replaces argparse ns)
    cape_tpu.data        — tokenizer, MP-100 loader, episodic sampling, augs
    cape_tpu.models      — flax modules (backbone, encoder, decoder, support)
    cape_tpu.ops         — Pallas kernels + XLA compute primitives
    cape_tpu.losses      — CAPE criterion (token CE w/ EOS weight, masked L1)
    cape_tpu.train       — train state, train step, training loop
    cape_tpu.eval        — PCK metrics, autoregressive evaluation, leak audit
    cape_tpu.parallel    — device mesh, sharding, multi-host runtime
    cape_tpu.utils       — logging, checkpointing
    cape_tpu.cli         — train / eval command-line entry points
"""

__version__ = "0.2.0"
