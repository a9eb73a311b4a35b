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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    The full suite compiles many hundreds of XLA CPU executables, all kept
    alive by the package's lru-cached jitted factories; past roughly 60% of
    the suite the NEXT compilation segfaults inside
    ``backend_compile_and_load`` (reproduced twice at the identical test,
    which passes alone and after any ~third of the suite — the trigger is
    cumulative live-executable state, not any one test). Clearing between
    modules caps the live count at one file's worth, which is measured
    safe; the cost is a handful of recompiles per module boundary.
    """
    yield
    jax.clear_caches()
