"""Test harness: force an 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 test strategy).

Note: this sandbox force-registers the tunneled 'axon' TPU backend through a
sitecustomize hook and presets JAX_PLATFORMS=axon; the env var cannot be
overridden from here. `jax.config.update('jax_platforms', ...)` after import
is the supported escape hatch — it keeps tests off the (single, shared,
sometimes-busy) TPU tunnel.
"""
import os

# XLA_FLAGS is read at first backend initialization, which happens after this
# module runs, so setting it here is still effective.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    Full-suite runs intermittently segfault inside XLA:CPU's
    backend_compile (observed at tests/test_vae_training.py after ~160
    prior compilations; the same test passes in isolation). Host RAM is
    not the limit — the crash is in compiler state that accumulates
    across hundreds of jit compilations in one process. Clearing the
    executable/tracing caches per module keeps that state bounded.
    """
    yield
    jax.clear_caches()
