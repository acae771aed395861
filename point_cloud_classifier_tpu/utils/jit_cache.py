"""Persistent jit-compilation cache (opt-in via ``PCC_COMPILE_CACHE``).

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

Opt-in rather than default: the cache directory grows unboundedly and is
keyed to the jax build, so enabling it silently for every user/test run is
a policy decision the user should make.  ``PCC_COMPILE_CACHE=1`` uses
``~/.cache/pcc_tpu/jit``; any other value is used as the directory path.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pcc_tpu", "jit"
)
_enabled: str | None = None


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
    path = os.path.abspath(cache_dir or _DEFAULT_DIR)
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
