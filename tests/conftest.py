"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual XLA host devices so that the
mesh/collective code paths (data-parallel shard_map, pjit shardings) are
exercised without real multi-chip hardware.

Gotcha: this image's axon TPU plugin registers itself (and imports jax) from
sitecustomize at interpreter startup, so env vars set here are too late for
jax's import-time config.  ``jax.config.update`` after import still works as
long as no backend has been initialized — XLA_FLAGS however must be in place
before the CPU client spins up, which also happens lazily, so setting it here
is still effective.
"""

import os

# hermeticity: CLI entrypoints default the persistent jit cache ON
# (utils/jit_cache.enable_default_cache) — tests that invoke train/sweep
# mains must not write into ~/.cache.  Unconditional assignment: a
# shell-exported PCC_COMPILE_CACHE=1 (the documented opt-in) must not
# leak into the suite (setdefault would have let it win); cache-specific
# tests monkeypatch per-test
os.environ["PCC_COMPILE_CACHE"] = "0"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
