"""Test harness: force an 8-device virtual CPU mesh before jax import.

Mirrors the multi-host test strategy called for in SURVEY.md §4 — collectives
and shardings are exercised on `--xla_force_host_platform_device_count=8`
without a TPU pod. bench.py / production entry points do NOT import this.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

# jax may already be imported by a pytest plugin (jaxtyping), in which case the
# env var was latched too early — set the config knob directly as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Keep the one-process full-suite run alive on small hosts.

    Compiled executables accumulate across the ~150-test suite until an XLA
    compile aborts the process with SIGABRT on a 2-vCPU host (observed at
    test #147). Dropping the compile caches at module boundaries bounds the
    resident footprint; re-compiles within later modules are cheap on CPU.
    """
    yield
    jax.clear_caches()
    gc.collect()
