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
    # default dir is REV-KEYED: jax version + framework source digest, so
    # a framework upgrade starts a fresh directory (round-5 policy)
    leaf = os.path.basename(path)
    assert leaf.startswith("jax") and "-pcc" in leaf


def test_enable_default_cache_policy(restore_cache_config, monkeypatch, tmp_path):
    """CLI warm-start policy (round 5): unset env → cache ON at the
    rev-keyed default dir; PCC_COMPILE_CACHE=0 → off; explicit dir →
    honored.  train.py / sweep.py / bench.py mains call this."""
    monkeypatch.setattr(
        jit_cache, "_DEFAULT_DIR", os.path.join(str(tmp_path), "jit")
    )
    monkeypatch.setenv("PCC_COMPILE_CACHE", "0")
    jit_cache._enabled = None
    assert jit_cache.enable_default_cache() is None

    monkeypatch.delenv("PCC_COMPILE_CACHE")
    path = jit_cache.enable_default_cache()
    assert path and path.startswith(str(tmp_path)) and os.path.isdir(path)

    explicit = str(tmp_path / "explicit")
    monkeypatch.setenv("PCC_COMPILE_CACHE", explicit)
    jit_cache._enabled = None
    assert jit_cache.enable_default_cache() == os.path.abspath(explicit)

    # EMPTY value = off, mirroring maybe_enable_from_env's "unset/0/empty
    # = off" contract (`PCC_COMPILE_CACHE= cmd` must disable, round-5
    # review finding)
    monkeypatch.setenv("PCC_COMPILE_CACHE", "")
    jit_cache._enabled = None
    assert jit_cache.enable_default_cache() is None


def test_prune_stale_keyed_dirs(tmp_path):
    """The default cache root keeps the current rev dir + the 8 most
    recently touched siblings; older revision dirs are deleted (the
    unbounded-growth concern that kept the cache opt-in pre-round-5)."""
    root = tmp_path / "jit"
    root.mkdir()
    current = root / "jaxX-pcccurrent"
    current.mkdir()
    stale = []
    for i in range(12):
        d = root / f"jaxX-pccrev{i:02d}"
        d.mkdir()
        (d / "entry.bin").write_bytes(b"x")
        os.utime(d, (1000 + i, 1000 + i))  # rev00 oldest ... rev11 newest
        stale.append(d)
    jit_cache._prune_stale_keyed_dirs(str(current), keep_n=8)
    survivors = sorted(p.name for p in root.iterdir())
    assert current.name in survivors
    # the 8 newest siblings survive, the 4 oldest are gone
    assert [f"jaxX-pccrev{i:02d}" in survivors for i in range(12)] == (
        [False] * 4 + [True] * 8
    )
    """The rev key is deterministic within a revision AND changes with
    the source bytes (the staleness story depends on both halves: a
    digest that ignored file contents would route every revision into
    one shared, stale-accreting directory)."""
    a = jit_cache._source_digest()
    jit_cache._rev_digest = None
    assert jit_cache._source_digest() == a  # recompute → same revision key

    # sensitivity, on a synthetic tree: content change → new key;
    # non-source files don't participate
    pkg = tmp_path / "pkg"
    (pkg / "sub").mkdir(parents=True)
    (pkg / "a.py").write_text("x = 1\n")
    (pkg / "sub" / "b.cpp").write_text("int b;\n")
    d0 = jit_cache._digest_tree(str(pkg))
    assert jit_cache._digest_tree(str(pkg)) == d0  # deterministic
    (pkg / "a.py").write_text("x = 2\n")
    d1 = jit_cache._digest_tree(str(pkg))
    assert d1 != d0  # .py edit lands in a fresh cache dir
    (pkg / "sub" / "b.cpp").write_text("int b2;\n")
    d2 = jit_cache._digest_tree(str(pkg))
    assert d2 != d1  # native source participates too
    (pkg / "notes.md").write_text("docs only\n")
    assert jit_cache._digest_tree(str(pkg)) == d2  # non-source ignored
    (pkg / "c.py").write_text("")
    assert jit_cache._digest_tree(str(pkg)) != d2  # new file changes key


def test_warm_start_bit_identical(tmp_path):
    """A cache HIT reproduces the cold-compile result bit-for-bit: two
    fresh processes share one cache dir; the second writes NO new entries
    (pure hits) and its outputs are byte-identical to the first's."""
    import subprocess
    import sys

    cache = tmp_path / "jit"
    prog = r"""
import os, sys
import numpy as np
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from point_cloud_classifier_tpu.utils import jit_cache
jit_cache.enable_compile_cache(
    sys.argv[1], min_entry_size_bytes=0, min_compile_time_secs=0
)
import jax, jax.numpy as jnp
@jax.jit
def f(x, w):
    return jnp.tanh(x @ w).sum(axis=1) * 3.0
x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 16)), jnp.float32)
w = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8)), jnp.float32)
np.save(sys.argv[2], np.asarray(f(x, w)))
"""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PCC_COMPILE_CACHE="0",  # the program enables its own dir explicitly
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)

    def run(out):
        subprocess.run(
            [sys.executable, "-c", prog, str(cache), str(out)],
            check=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )

    run(tmp_path / "cold.npy")
    entries_after_cold = sorted(os.listdir(cache))
    assert entries_after_cold, "cold run wrote no cache entries"
    run(tmp_path / "warm.npy")
    assert sorted(os.listdir(cache)) == entries_after_cold, (
        "warm run recompiled (new cache entries) instead of hitting"
    )
    cold = (tmp_path / "cold.npy").read_bytes()
    warm = (tmp_path / "warm.npy").read_bytes()
    assert cold == warm  # bit-for-bit identical result through the cache
