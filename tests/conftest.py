"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference's de-facto test seam is its CPU fallback path
(ref: torch_utils/ops/*.py `impl='ref'`, SURVEY.md §4); our equivalent is
running the whole stack on CPU with a faked 8-chip mesh so multi-device
sharding is exercised without TPU hardware.

NOTE: this environment pre-registers an `axon` TPU backend from
sitecustomize (which imports jax before any user code), so the JAX_PLATFORMS
env var is too late — the platform must be forced through jax.config. The
XLA_FLAGS fake-device flag still applies because the CPU client initializes
lazily on first use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # Compile-cheap XLA:CPU: tests verify NUMERICS on a 1-core box where
    # wall time IS compile time — O0 + no expensive LLVM passes cut the
    # multichip dryrun's cold compile >2x (runs/hw_r5/dryrun_cold_O0.log)
    # and change nothing semantically. NFE_TEST_O2=1 restores defaults.
    + ("" if os.environ.get("NFE_TEST_O2") == "1" else
       " --xla_backend_optimization_level=0"
       " --xla_llvm_disable_expensive_passes=true")
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: repeated suite runs skip XLA re-compilation of
# unchanged programs (measured ~17% off a compile-heavy module's wall time
# on this 1-core box; biggest wins on the training-step programs). Keyed by
# HLO, so code changes invalidate exactly the affected programs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/nfe_testcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The XLA CPU compiler segfaults on FRESH compiles late in a single-process
    run of the full suite (reproduced at tests/test_vgg_equiv.py and
    tests/test_visualizer.py, 2026-08-17; each passes in isolation) — the
    accumulated program cache of ~200 earlier tests poisons subsequent
    compilation. Dropping the caches per module bounds that state; the cost
    is per-module recompiles of shared tiny-config programs."""
    yield
    jax.clear_caches()
