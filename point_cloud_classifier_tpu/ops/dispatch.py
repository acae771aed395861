"""Trace-time kernel dispatch policy: TPU Pallas kernels vs pure XLA.

Model code gates its Pallas fast paths on :func:`use_tpu_kernels` instead
of calling ``jax.default_backend()`` directly, so one switch can force the
portable pure-StableHLO lowering everywhere.  The one consumer of that
switch is deployment export (``serving.export_run``): a program traced on
a TPU host with Pallas gates open would embed ``tpu_custom_call`` ops and
could never serve on a CPU/GPU host, silently breaking the module's
"artifacts are pure StableHLO" contract.

The flag is a process-global, not a tracer value: kernel selection happens
at TRACE time (Python control flow), so a context manager around the
``jax.jit``/``jax.export`` call is exactly the right scope.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

_FORCE_XLA = False


def use_tpu_kernels() -> bool:
    """True when model code may route to Pallas TPU kernels."""
    return jax.default_backend() == "tpu" and not _FORCE_XLA


@contextmanager
def force_xla():
    """Within this context, every kernel gate picks the pure-XLA path.

    Used by ``serving.export_run`` so exported artifacts contain no
    ``tpu_custom_call`` ops regardless of the tracing host's backend.

    CAVEAT (round-5 review): the flag is consulted at TRACE time and does
    NOT participate in jax's jit cache key — a jitted callable that
    already traced with the Pallas gates open keeps serving its cached
    ``tpu_custom_call`` executable inside this context.  Always trace a
    FRESH ``jax.jit``/``jax.export`` inside the context (what
    ``serving.export_run`` does); never wrap an already-warm jitted fn
    and expect a pure-XLA lowering.
    """
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev
