"""GELU variants for the flagship step — the activation is a third of it.

Measured motivation (same-window device-truth A/Bs, v5e, flagship
deep_sets shapes, resident fuse): the activation choice alone moves the
whole train step from 248.4k clouds/sec (``jax.nn.gelu``, tanh form) to
367.8k (``relu``) — the GELU's transcendental chain costs ~0.34
ms/step, a third of the entire step, because the [P=65536, 256]
activation tensors are evaluated twice forward and once more (as the
derivative) in the backward.  ``silu`` (one ``exp``) measured 312.4k —
the cost tracks transcendental count.

Two replacement strategies, both measured whole-step same-window:

1. :func:`fast_gelu` — a zero-transcendental degree-6 polynomial
   (value err ≤ 7.4e-4 vs the tanh form, i.e. bf16-quantization-level):
   **177.7k clouds/sec — a measured NEGATIVE result.**  Its ~15 fwd +
   ~25 autodiff'd bwd VPU f32 ops/element cost ~0.7 ms — XLA's ``tanh``
   lowers to only ~10 VPU-op-equivalents total, so the v5e VPU executes
   the real transcendental cheaper than any polynomial of this accuracy.
   Kept selectable (``PCC_GELU=poly``) as the documented negative.
2. :func:`quick_gelu` — ``x * sigmoid(1.702 x)`` (the sigmoid-form
   approximation from the original GELU paper; what OpenAI CLIP calls
   QuickGELU): one transcendental.  **286.0k clouds/sec — +15% whole
   step** (evaluated in the input dtype; an f32-upcast variant measured
   261.4k — cast chains cost real VPU time).  Coarser than the tanh
   form (max abs deviation ~2e-2 near |x|≈2) but trained-accuracy
   parity vs the torch reference holds: Δ +0.0042, identical seeds to
   the exact-gelu run (scripts/measure_parity.py, 3 seeds — the
   reference itself uses exact-erf GELU, so every framework form here
   is an approximation; the parity metric is the contract, not ulps).

Round-2 addendum: HOW the sigmoid is written matters as much as which
activation, and the best form differs per consumer:

- **Mosaic (Pallas kernels)**: ``jax.nn.sigmoid``/``lax.logistic`` is
  outright broken at bf16 (its lowering emits an f32-constant
  ``vector.broadcast`` into a bf16 vector, failing verification — the
  fused φ kernel crashed on TPU), so kernels ALWAYS get the explicit
  ``1/(1+exp(-x))`` form (``resolve_activation(name, mosaic=True)``).
- **XLA**: which form is faster FLIPPED with the post-pool
  final-linear default.  Pre-post-pool (3 per-point matmul passes
  fwd) the explicit form won 18% whole-step (377.2k vs 319.5k
  clouds/sec); post-pool (2 passes — the step is leaner so the
  activation is a larger fraction, and XLA fuses differently) the
  native ``lax.logistic`` lowering wins ~3%, reproduced A/B/A/B:
  486.1/481.3 explicit vs 498.5/499.4 logistic (2026-08-18,
  device-truth resident fuse-256).  XLA paths therefore default to
  ``jax.nn.sigmoid``; ``PCC_SIGMOID_FORM=exp`` re-selects the
  explicit form for A/B (and as the kill-switch).

Policy: ``resolve_activation("gelu")`` follows ``PCC_GELU``:
``quick`` (default), ``exact`` (``jax.nn.gelu`` — the kill-switch), or
``poly``.  The resolver is shared by the φ chain, the Pallas kernels
(``mosaic=True``), and the ρ/head MLP stacks, so train/eval math stays
consistent (the two sigmoid forms are numerically interchangeable —
pinned by tests/test_activations.py).

fast_gelu form: ``gelu(x) = x * (0.5 + xc * q(xc^2))`` with
``xc = clip(x, -4, 4)``, q a Chebyshev fit of ``(Φ(x) - 0.5)/x`` against
the tanh-form ``jax.nn.gelu``, exact tails via selects; evaluated in f32
regardless of input dtype (bf16 Horner would lose ~3 digits).  Gradient
err ≤ 2.2e-2 at the clamp boundary, ≤ 3.3e-4 in the tails
(tests/test_activations.py pins all bounds).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_B = 4.0
# degree-6 polynomial in u = x^2 for (Φ(x) - 0.5)/x, |x|-weighted
# Chebyshev-node fit on [0, 16] with the boundary value pinned
# (fit script in the module docstring's derivation; coefficients f32)
_Q = (
    0.39846205711364746,
    -0.06555620580911636,
    0.009224939160048962,
    -0.0009029763750731945,
    5.6556225899839774e-05,
    -2.0027623577334452e-06,
    3.016109317854898e-08,
)


def fast_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial tanh-form GELU, exact tails, no transcendentals."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -_B, _B)
    u = xc * xc
    q = jnp.full_like(xf, _Q[-1])
    for k in range(len(_Q) - 2, -1, -1):
        q = q * u + _Q[k]
    g = xf * (0.5 + xc * q)
    g = jnp.where(xf > _B, xf, jnp.where(xf < -_B, 0.0, g))
    return g.astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """QuickGELU: ``x * sigmoid(1.702 x)`` — one transcendental (XLA form).

    The sigmoid-form GELU approximation (Hendrycks & Gimpel 2016 §2;
    the form OpenAI CLIP trained with).  Max abs deviation from the
    tanh form is ~2e-2 around |x|≈2 — far coarser than
    :func:`fast_gelu`, but measured trained-accuracy parity holds (see
    module docstring) and on the v5e VPU it costs the same as ``silu``.
    """
    # evaluated in the input dtype like jax.nn.silu (an f32 upcast of the
    # sigmoid measured 261.4k vs silu's 312.4k — the cast chain costs real
    # VPU time).  Native lax.logistic lowering: measured ~3% faster
    # whole-step than the explicit form since post-pool (module
    # docstring); PCC_SIGMOID_FORM=exp re-selects the explicit form
    if os.environ.get("PCC_SIGMOID_FORM") == "exp":
        return quick_gelu_mosaic(x)
    return x * jax.nn.sigmoid(1.702 * x)


def quick_gelu_mosaic(x: jnp.ndarray) -> jnp.ndarray:
    """QuickGELU with the sigmoid written out as ``1/(1+exp(-a))``.

    The Mosaic-safe form: lax.logistic's lowering is broken at bf16
    inside Pallas kernels (an f32-constant vector.broadcast fails
    verification, ``(f32) -> vector<...xbf16>``) — this form lowers
    cleanly.  Also the XLA A/B arm (``PCC_SIGMOID_FORM=exp``)."""
    a = 1.702 * x
    return x * _sigmoid_exp(a)


def gelu_variant() -> str:
    """PCC_GELU ∈ {quick (default), exact, poly} — see module docstring."""
    return os.environ.get("PCC_GELU", "quick")


def resolve_activation(name: str, mosaic: bool = False):
    """Activation lookup shared by the φ kernels and the MLP stacks.

    ``gelu`` maps to the variant selected by ``PCC_GELU``:
    ``quick`` (default — measured +25% whole-step throughput, trained
    parity inside the ±0.5% target), ``exact`` (``jax.nn.gelu``, the
    kill-switch), or ``poly`` (:func:`fast_gelu`, kept as a documented
    negative result).  Everything else is the plain jax op.

    ``mosaic=True`` (the Pallas kernels) always selects the explicit-exp
    sigmoid forms — lax.logistic and bf16 cmpf are broken under Mosaic
    (module docstring) — while XLA callers get the native lowerings,
    each the measured-faster form for its compiler.  The two are
    numerically interchangeable (pinned by tests/test_activations.py),
    so a model whose XLA eval runs against a Pallas-trained checkpoint
    (or vice versa) sees identical math.
    """
    if name == "gelu":
        return {
            "quick": quick_gelu_mosaic if mosaic else quick_gelu,
            "poly": fast_gelu,
            "exact": jax.nn.gelu,
        }[gelu_variant()]
    table = {
        "relu": _relu,
        "silu": _silu_mosaic if mosaic else _silu,
        "tanh": _tanh_exp if os.environ.get("PCC_TANH_FORM") == "exp" else jnp.tanh,
    }
    return table[name]


@jax.custom_jvp
def _sigmoid_exp(a: jnp.ndarray) -> jnp.ndarray:
    """``1/(1+exp(-a))`` with the exp argument floored at -60.

    The naive form's autodiff VJP is NaN once ``exp(-a)`` overflows
    (f32: a ≤ ~-88; through QuickGELU's 1.702 factor a single
    pre-activation ≤ ~-52 silently NaN'd the whole gradient tree —
    ``jax.nn.sigmoid``'s stable lowering returns 0 there).  Flooring
    ``a`` at -60 keeps ``exp(-a)`` ≤ 1.2e26 (finite in bf16 and f32, so
    no inf·0 anywhere in the VJP) at the cost of ONE extra VPU max op;
    below the floor the true sigmoid and its gradient are ≤ 9e-27 ≈ 0,
    which is exactly what the clamped branch yields.  The floor constant
    follows the input dtype — Mosaic rejects f32 constants broadcast
    into bf16 vectors (the lax.logistic bug this module works around).

    The derivative is supplied in closed form (``s·(1−s)``, the custom
    jvp below) rather than left to autodiff: ``lax.max``'s gradient
    tie-splits through bf16 EQUALITY compares, and Mosaic rejects
    ``arith.cmpf oeq`` on packed bf16 vectors ("Target does not support
    this comparison") — the mechanical VJP of this function crashed
    every fused-φ TRAINING kernel compile on real v5e hardware
    (2026-08-18 phi_ab session; eval/forward-only kernels, which lower
    the max as ``maximumf`` with no compare, were unaffected).  The
    closed form is also cheaper: it reuses the recomputed ``s`` instead
    of re-deriving ``e^{-a}/(1+e^{-a})²`` with an extra divide.

    tests/test_activations.py pins finite grads at the overflow points."""
    return 1.0 / (1.0 + jnp.exp(-jnp.maximum(a, -60.0)))


@_sigmoid_exp.defjvp
def _sigmoid_exp_jvp(primals, tangents):
    (a,), (da,) = primals, tangents
    s = _sigmoid_exp(a)
    # exact for a > -60; below the floor the true gradient is ≤ 9e-27 and
    # s·(1−s) yields that same ~0 (the clamped-constant branch would give
    # literal 0 — indistinguishable at any working precision)
    return s, s * (1.0 - s) * da


@jax.custom_jvp
def _relu(x: jnp.ndarray) -> jnp.ndarray:
    """``max(x, 0)`` with a Mosaic-safe derivative.

    ``jax.nn.relu``'s own custom gradient is ``lax.select(x > 0, dx, 0)``
    — a compare in the INPUT dtype, and Mosaic rejects ``arith.cmpf`` on
    packed bf16 vectors (the same target limitation as
    :func:`_sigmoid_exp`'s floor; a bf16 fused-φ relu config crashed the
    kernel compile on real v5e, 2026-08-18 probe).  The mask compare here
    runs in f32 — one upcast per element in the backward only; the
    forward ``maximum`` lowers compare-free as ``arith.maximumf``."""
    return jnp.maximum(x, 0.0)


@_relu.defjvp
def _relu_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    mask = (x.astype(jnp.float32) > 0.0).astype(dx.dtype)  # grad(0) = 0,
    # matching jax.nn.relu's convention
    return jnp.maximum(x, 0.0), mask * dx


def _tanh_exp(x: jnp.ndarray) -> jnp.ndarray:
    """``tanh`` as ``2/(1+exp(-2x)) - 1`` — A/B knob (PCC_TANH_FORM=exp)
    probing whether XLA's native tanh lowering carries the same TPU cost
    premium the logistic lowering did (graph_net's convs run tanh over
    [B, M, C] twice per step).  Exactly one transcendental; max abs value
    error vs jnp.tanh is ~1 ulp of bf16 at the steep region.  Shares
    :func:`_sigmoid_exp`'s overflow floor (naive form: NaN grad at
    x ≤ ~-44)."""
    return 2.0 * _sigmoid_exp(2.0 * x) - 1.0


def _silu(x: jnp.ndarray) -> jnp.ndarray:
    """``x * sigmoid(x)`` — XLA form (native logistic, same policy as
    :func:`quick_gelu`; ``PCC_SIGMOID_FORM=exp`` selects the explicit
    form)."""
    if os.environ.get("PCC_SIGMOID_FORM") == "exp":
        return _silu_mosaic(x)
    return x * jax.nn.sigmoid(x)


def _silu_mosaic(x: jnp.ndarray) -> jnp.ndarray:
    """``x * sigmoid(x)`` with the sigmoid written out — the Mosaic bf16
    ``lax.logistic`` workaround (see :func:`quick_gelu_mosaic`; the fused
    φ kernel supports silu configs)."""
    return x * _sigmoid_exp(x)
