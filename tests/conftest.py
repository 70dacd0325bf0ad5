"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake multi-node backend (SURVEY.md §4):
sharding/collective correctness is validated on host devices; the real chip
is only used by bench.py.

The environment pins JAX_PLATFORMS=axon (single real TPU) via a sitecustomize
that registers the PJRT plugin at interpreter start, so we must override the
platform through jax.config *after* import but before backend init.
"""

import os

# XLA reads this env var at backend init (which happens on first device use,
# after conftest) — safe to set here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = os.environ.get("MTP_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == os.environ["JAX_PLATFORMS"], (
    "test platform override failed", jax.devices())
