"""Persistent jit-compilation cache (default-on for CLI entrypoints,
``PCC_COMPILE_CACHE`` overrides).

Every CLI invocation (``train.py``, ``sweep.py``, ``bench.py``, serving)
re-traces and re-compiles the same XLA programs; on this image the compile
round-trips a remote-compile tunnel, and the end-to-end measurement
(``scripts/measure_e2e.py``) attributes the bulk of a cold run's wall-clock
to exactly that first-epoch compile cost (BASELINE.md).  JAX ships a
persistent on-disk executable cache keyed by HLO+flags; it works through
the axon remote-compile backend (probed: a second process's first call
dropped 0.45 s -> 0.04 s) and on stock CPU/TPU runtimes.  The reference
(single-process torch eager, no compilation step) has no counterpart —
this is TPU-native operational tooling, cited against the cold-start cost
its compilation model introduces.

Default policy (round 5): CLI product entrypoints (``train.py``,
``sweep.py``, ``bench.py``) enable the cache automatically via
``enable_default_cache()`` — the round-4 sweep campaign measured the
warm cache as the difference between 6.6 and ~2 min/run (BASELINE.md),
too large to hide behind an env var a sweep user must discover.  Plain
``import point_cloud_classifier_tpu`` stays side-effect-free unless
``PCC_COMPILE_CACHE`` opts in.  ``PCC_COMPILE_CACHE=0`` force-disables
everywhere (the test suite sets this for hermeticity);
``PCC_COMPILE_CACHE=1`` uses the default dir; any other value is used as
the directory path.

Staleness is impossible twice over: jax keys every entry on the compiled
HLO + compile options + jax/jaxlib version (an executable is only reused
for a byte-identical program), and the default directory is additionally
keyed on the framework source digest + jax version
(``~/.cache/pcc_tpu/jit/<key>``) so a framework upgrade starts a fresh
directory instead of accreting entries the new revision's programs will
never hit.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pcc_tpu", "jit"
)
_enabled: str | None = None
_rev_digest: str | None = None


def _digest_tree(root: str) -> str:
    """sha256 over a source tree's name-sorted .py/.cpp/.cc/.h bytes."""
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(
            d for d in dirnames if d != "__pycache__"
        )
        for fn in sorted(filenames):
            if fn.endswith((".py", ".cpp", ".cc", ".h")):
                h.update(fn.encode())
                with open(os.path.join(dirpath, fn), "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


def _source_digest() -> str:
    """Digest of the framework's own source tree.  Part of the default
    cache-dir key: any code change — even one jax's HLO keying would
    dedupe — lands in a fresh directory, so stale accumulation across
    framework revisions is structurally impossible.  ~1 MB of source,
    hashed once per process (~ms)."""
    global _rev_digest
    if _rev_digest is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        _rev_digest = _digest_tree(pkg_root)
    return _rev_digest


def _default_keyed_dir() -> str:
    import jax

    return os.path.join(
        _DEFAULT_DIR, f"jax{jax.__version__}-pcc{_source_digest()}"
    )


def enable_compile_cache(
    cache_dir: str | None = None,
    min_entry_size_bytes: int | None = None,
    min_compile_time_secs: float | None = None,
) -> str:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Must run before the first compilation to catch it (jax reads the
    config lazily, so later calls still affect subsequent compiles).
    The min-entry/min-time thresholds default to jax's own (which skip
    trivial sub-second programs); tests lower them to observe writes.
    Returns the directory used.
    """
    import jax

    global _enabled
    path = os.path.abspath(cache_dir or _default_keyed_dir())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    if min_entry_size_bytes is not None:
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", min_entry_size_bytes
        )
    if min_compile_time_secs is not None:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
    _enabled = path
    return path


def maybe_enable_from_env() -> str | None:
    """Honor ``PCC_COMPILE_CACHE`` (unset/``0`` = off, ``1`` = default
    dir, anything else = the cache directory).  Idempotent."""
    val = os.environ.get("PCC_COMPILE_CACHE", "0")
    if val == "0" or not val:
        return None
    if _enabled is not None:
        return _enabled
    # opting in means "give me warm starts": drop jax's 1 s min-compile-time
    # filter so the per-bucket eval/predict programs are cached too (measured:
    # default thresholds cached 1 program of a train run, zero-thresholds 28)
    return enable_compile_cache(
        None if val == "1" else val,
        min_entry_size_bytes=0,
        min_compile_time_secs=0.0,
    )


def _prune_stale_keyed_dirs(current: str, keep_n: int = 8) -> None:
    """Bound the default cache root: every framework revision gets its own
    keyed subdirectory (staleness story above), so a developer iterating on
    the package would otherwise accrete one dead executable dir per source
    change forever — the exact unbounded growth that kept the cache opt-in
    before round 5.  Keep the current dir plus the ``keep_n`` most recently
    TOUCHED siblings (a live process at another revision keeps refreshing
    its dir's mtime as it writes entries, so recency protects concurrent
    runs; jax also tolerates a cache dir vanishing mid-run — it recompiles
    and rewrites).  Best-effort: IO races with concurrent pruners are
    swallowed."""
    import shutil

    root = os.path.dirname(current)
    try:
        entries = [
            os.path.join(root, name)
            for name in os.listdir(root)
            if os.path.isdir(os.path.join(root, name))
            and os.path.join(root, name) != current
        ]
        entries.sort(key=lambda p: os.path.getmtime(p), reverse=True)
        for stale in entries[keep_n:]:
            shutil.rmtree(stale, ignore_errors=True)
    except OSError:
        pass


def enable_default_cache() -> str | None:
    """Warm-start policy for the CLI product entrypoints: enable the
    persistent cache at the rev-keyed default directory unless the user
    disabled it (``PCC_COMPILE_CACHE`` unset-to-empty or ``0`` — same
    opt-out values ``maybe_enable_from_env`` honors) or already pointed
    it somewhere.  The round-4 sweep campaign measured the warm cache at
    6.6 → ~2 min/run — sweep/train users get that without knowing the
    env var.  Library imports never call this."""
    val = os.environ.get("PCC_COMPILE_CACHE")
    if val is not None and (val == "0" or not val):
        # explicit opt-out: "0" or empty — mirror maybe_enable_from_env's
        # "unset/0/empty = off" contract so `PCC_COMPILE_CACHE= cmd`
        # disables the CLI default instead of silently enabling it
        return None
    if val:  # explicit dir / "1": honor it exactly
        return maybe_enable_from_env()
    if _enabled is not None:
        return _enabled
    path = enable_compile_cache(
        None, min_entry_size_bytes=0, min_compile_time_secs=0.0
    )
    _prune_stale_keyed_dirs(path)
    return path
