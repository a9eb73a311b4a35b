"""Test environment: 8 virtual CPU devices (SURVEY.md §4.5).

Tests run hermetically on the CPU backend with a forced 8-device host
platform so distributed (dp-mesh) code paths execute for real; Pallas kernels
run through their interpret path on CPU. Bench runs on the real TPU.

Note: the sandbox's sitecustomize registers the axon TPU plugin at interpreter
start and pins JAX_PLATFORMS=axon, so the env var alone can't force CPU here —
but backends initialize lazily, so updating jax's config before first use
works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# MDBN_TEST_PLATFORM=axon runs the TPU-only tests (test_pallas_tpu.py) on the
# real chip; default is the hermetic 8-device CPU suite.
_platform = os.environ.get("MDBN_TEST_PLATFORM", "cpu")
if _platform != "axon":
    jax.config.update("jax_platforms", _platform)
