"""fast_gelu (ops/activations.py) vs jax.nn.gelu — the bounds the module
docstring promises, plus resolver policy."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.ops.activations import (
    fast_gelu,
    quick_gelu,
    resolve_activation,
)

XS = np.concatenate(
    [
        np.linspace(-30.0, 30.0, 120001),
        np.linspace(-4.1, 4.1, 50001),  # dense around the clamp boundary
    ]
).astype(np.float32)


def test_value_bound():
    got = np.asarray(fast_gelu(jnp.asarray(XS)))
    want = np.asarray(jax.nn.gelu(jnp.asarray(XS)))
    assert np.max(np.abs(got - want)) < 8e-4


def test_exact_tails():
    xs = jnp.asarray(np.array([4.5, 10.0, 100.0, 1e6], dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(fast_gelu(xs)), np.asarray(xs))
    np.testing.assert_array_equal(
        np.asarray(fast_gelu(-xs)), np.zeros_like(np.asarray(xs))
    )


def test_grad_bound():
    d_fast = jax.vmap(jax.grad(fast_gelu))(jnp.asarray(XS))
    d_ref = jax.vmap(jax.grad(jax.nn.gelu))(jnp.asarray(XS))
    assert np.max(np.abs(np.asarray(d_fast) - np.asarray(d_ref))) < 2.5e-2


def test_bf16_quantization_level():
    """After casting to the bf16 compute dtype, the approximation is at
    quantization level: <= 2 ulp from bf16-cast jax.nn.gelu."""
    xs = jnp.asarray(XS)
    got = np.asarray(fast_gelu(xs).astype(jnp.bfloat16), dtype=np.float32)
    want = np.asarray(
        jax.nn.gelu(xs).astype(jnp.bfloat16), dtype=np.float32
    )
    denom = np.maximum(np.abs(want), 4e-2)
    assert np.max(np.abs(got - want) / denom) < 2e-2  # ~2 bf16 ulp


def test_dtype_preserved():
    for dt in (jnp.float32, jnp.bfloat16, jnp.float16):
        out = fast_gelu(jnp.ones((4,), dt))
        assert out.dtype == dt


def test_quick_gelu_bounds():
    """QuickGELU is the coarse sigmoid form: bounded deviation from the
    tanh form, monotone tails, exact limits."""
    xs = jnp.asarray(XS)
    got = np.asarray(quick_gelu(xs))
    want = np.asarray(jax.nn.gelu(xs))
    assert np.max(np.abs(got - want)) < 2.5e-2
    # tails converge to x / 0
    big = jnp.asarray(np.array([20.0, 50.0], dtype=np.float32))
    np.testing.assert_allclose(np.asarray(quick_gelu(big)), np.asarray(big))
    np.testing.assert_allclose(
        np.asarray(quick_gelu(-big)), np.zeros(2), atol=1e-6
    )
    assert quick_gelu(jnp.ones((2,), jnp.bfloat16)).dtype == jnp.bfloat16


def test_resolver_policy(monkeypatch):
    assert resolve_activation("gelu") is quick_gelu  # PCC_GELU default
    monkeypatch.setenv("PCC_GELU", "exact")
    assert resolve_activation("gelu") is jax.nn.gelu
    monkeypatch.setenv("PCC_GELU", "poly")
    assert resolve_activation("gelu") is fast_gelu
    from point_cloud_classifier_tpu.ops.activations import _relu

    assert resolve_activation("relu") is _relu  # Mosaic-safe custom-jvp form
    with pytest.raises(KeyError):
        resolve_activation("swishish")


def test_silu_explicit_form_matches_jax():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_cloud_classifier_tpu.ops.activations import _silu

    x = jnp.linspace(-8.0, 8.0, 257)
    np.testing.assert_allclose(
        np.asarray(_silu(x)), np.asarray(jax.nn.silu(x)), rtol=1e-6, atol=1e-6
    )


def test_tanh_exp_form_matches_jnp(monkeypatch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_cloud_classifier_tpu.ops.activations import (
        _tanh_exp,
        resolve_activation,
    )

    x = jnp.linspace(-6.0, 6.0, 257)
    np.testing.assert_allclose(
        np.asarray(_tanh_exp(x)), np.asarray(jnp.tanh(x)), rtol=1e-6, atol=1e-6
    )
    # grads too (the conv backward runs through it)
    g1 = jax.grad(lambda v: jnp.sum(_tanh_exp(v) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(jnp.tanh(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)
    # knob routing
    monkeypatch.setenv("PCC_TANH_FORM", "exp")
    assert resolve_activation("tanh") is _tanh_exp
    monkeypatch.delenv("PCC_TANH_FORM")
    assert resolve_activation("tanh") is jnp.tanh


def test_explicit_exp_forms_grad_stable_at_overflow():
    """The naive 1/(1+exp(-a)) VJP is NaN once exp(-a) overflows (inf·0);
    the _sigmoid_exp floor must keep values AND grads finite and correct
    far into the saturated tails, in f32 and bf16, matching the stable
    jax.nn lowerings (code-review finding: quick_gelu is the flagship
    default, so x ≤ ~-52 silently NaN'd whole training steps)."""
    from point_cloud_classifier_tpu.ops.activations import (
        _silu,
        _tanh_exp,
        quick_gelu,
    )

    for dtype in (jnp.float32, jnp.bfloat16):
        xs = jnp.asarray([-1e4, -200.0, -55.0, -40.0, 0.0, 40.0, 1e4], dtype)
        for ours, ref in (
            (quick_gelu, lambda v: v * jax.nn.sigmoid(1.702 * v)),
            (_silu, jax.nn.silu),
            (_tanh_exp, jnp.tanh),
        ):
            val = ours(xs)
            g = jax.grad(lambda v: jnp.sum(ours(v).astype(jnp.float32)))(xs)
            assert bool(jnp.all(jnp.isfinite(val.astype(jnp.float32)))), (ours, dtype)
            assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32)))), (ours, dtype)
            gr = jax.grad(lambda v: jnp.sum(ref(v).astype(jnp.float32)))(xs)
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(gr, np.float32),
                rtol=2e-2, atol=2e-2,
            )


def test_sigmoid_form_knob_matches_explicit(monkeypatch):
    """The XLA default (native lax.logistic) and the Mosaic/A-B explicit-exp
    form (PCC_SIGMOID_FORM=exp, and what resolve_activation(mosaic=True)
    returns) must be numerically interchangeable — same QuickGELU math,
    different lowering — so checkpoints cross between the paths and the
    ab_session A/B only measures lowering cost."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import point_cloud_classifier_tpu.ops.activations as act

    x = jnp.linspace(-20.0, 20.0, 513)
    default = act.quick_gelu(x)
    gdef = jax.grad(lambda v: act.quick_gelu(v).sum())(x)
    monkeypatch.setenv("PCC_SIGMOID_FORM", "exp")
    explicit = act.quick_gelu(x)
    gexp = jax.grad(lambda v: act.quick_gelu(v).sum())(x)
    mosaic = act.quick_gelu_mosaic(x)
    np.testing.assert_allclose(
        np.asarray(default), np.asarray(explicit), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(explicit), np.asarray(mosaic))
    np.testing.assert_allclose(
        np.asarray(gdef), np.asarray(gexp), rtol=1e-5, atol=1e-6
    )
    # the resolver routes mosaic callers to the explicit form regardless
    # of the knob
    monkeypatch.delenv("PCC_SIGMOID_FORM")
    assert act.resolve_activation("gelu", mosaic=True) is act.quick_gelu_mosaic
    assert act.resolve_activation("gelu") is act.quick_gelu
    assert act.resolve_activation("silu", mosaic=True) is act._silu_mosaic


def test_relu_kernel_form_matches_jax_nn_relu():
    """resolve_activation('relu') is the Mosaic-safe custom-jvp form (f32
    mask compare — bf16 cmpf is rejected on real TPUs); values and grads
    must match jax.nn.relu exactly, including grad(0) == 0."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_cloud_classifier_tpu.ops.activations import resolve_activation

    f = resolve_activation("relu")
    x = jnp.asarray([-2.0, -1e-3, 0.0, 1e-3, 3.0], jnp.float32)
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(jax.nn.relu(x)))
    g_ours = jax.vmap(jax.grad(f))(x)
    g_jax = jax.vmap(jax.grad(jax.nn.relu))(x)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_jax))
    assert float(jax.grad(f)(jnp.float32(0.0))) == 0.0
