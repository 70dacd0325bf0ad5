"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake multi-node backend (SURVEY.md §4):
sharding/collective correctness is validated on host devices, the real chip
is only used by bench.py.
"""

import os

# Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
