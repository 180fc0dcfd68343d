"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count` (the TPU-native analogue of a fake
cluster backend — SURVEY.md §4 takeaway).

NOTE: this environment's axon sitecustomize registers the TPU backend at
interpreter boot and writes `jax_platforms="axon,cpu"` via jax.config —
which overrides env vars set afterwards. Force the config back to cpu here
(before any test imports jax math) and set the host-device-count flag
before the CPU backend initializes.
"""

import os

# stash the axon relay address BEFORE scrubbing it: the tpu-marked
# lowering smoke test (tests/test_tpu_lowering.py) re-exports it into a
# fresh subprocess to reach the real chip from this CPU-forced session
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    os.environ.setdefault(
        "CAPE_STASHED_AXON_IPS", os.environ["PALLAS_AXON_POOL_IPS"])
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
