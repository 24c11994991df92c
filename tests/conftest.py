"""Test config: run everything on a virtual 8-device CPU mesh so sharding
logic is testable without TPU hardware (SURVEY.md section 4 implication (d)).

Must set env vars before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and overrides
# JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process compile-cache memory: the full suite compiles
    hundreds of programs and the XLA CPU compiler has twice segfaulted
    (host-dependent) compiling test_spectral's program at ~48% of the
    suite with every prior module's executables still resident.  Each
    module's tests share compilations; across modules they rarely do."""
    yield
    jax.clear_caches()
