"""Test environment: 8 virtual CPU devices (SURVEY.md §4.5).

Tests run hermetically on the CPU backend with a forced 8-device host
platform so distributed (dp-mesh) code paths execute for real; Pallas kernels
run through their interpret path on CPU. Bench runs on the real TPU.
Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env pins JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
