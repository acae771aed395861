"""Persistent jit-compilation cache knob (utils/jit_cache.py).

The product claim: a second process (or a later run in the same process)
re-using the cache directory skips XLA recompilation of identical
programs — the dominant cold-start cost measured by
``scripts/measure_e2e.py``.  Tests pin (a) entries are written where we
point the cache, (b) the env-knob parsing, and restore jax's config so
the rest of the suite keeps its default (no persistent cache).
"""

import os

import jax
import jax.numpy as jnp
import pytest

from point_cloud_classifier_tpu.utils import jit_cache


@pytest.fixture
def restore_cache_config():
    old_dir = jax.config.jax_compilation_cache_dir
    old_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    old_enabled = jit_cache._enabled
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_size)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_secs)
    jit_cache._enabled = old_enabled


def test_cache_writes_entries(tmp_path, restore_cache_config):
    d = jit_cache.enable_compile_cache(
        str(tmp_path / "jit"),
        min_entry_size_bytes=0,
        min_compile_time_secs=0,
    )
    # a fresh program (constant baked in via closure) so this test writes
    # its own entry even if something enabled the cache earlier
    c = float(os.getpid() % 97)
    f = jax.jit(lambda x: (x * c + 1.0).sum())
    f(jnp.arange(64, dtype=jnp.float32)).block_until_ready()
    assert os.listdir(d), "no cache entries written"


def test_env_knob(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.setenv("PCC_COMPILE_CACHE", "0")
    jit_cache._enabled = None
    assert jit_cache.maybe_enable_from_env() is None

    target = str(tmp_path / "envjit")
    monkeypatch.setenv("PCC_COMPILE_CACHE", target)
    path = jit_cache.maybe_enable_from_env()
    assert path == os.path.abspath(target) and os.path.isdir(path)
    # idempotent: second call reports the already-enabled dir
    assert jit_cache.maybe_enable_from_env() == path


def test_env_knob_default_dir(restore_cache_config, monkeypatch, tmp_path):
    # "1" routes to the default user-cache location (redirected via HOME
    # so the test writes under tmp)
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setattr(
        jit_cache, "_DEFAULT_DIR",
        os.path.join(str(tmp_path), ".cache", "pcc_tpu", "jit"),
    )
    monkeypatch.setenv("PCC_COMPILE_CACHE", "1")
    jit_cache._enabled = None
    path = jit_cache.maybe_enable_from_env()
    assert path.startswith(str(tmp_path)) and os.path.isdir(path)
