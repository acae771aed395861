"""Pallas fused φ+pool kernel: parity vs the XLA reference implementation.

Runs the kernel in interpreter mode (tests are CPU-only); the real-TPU
compile path is exercised by bench.py and the driver's entry check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.ops.fused_phi import (
    phi_forward_xla,
    phi_pool,
    phi_pool_pallas,
    phi_pool_xla,
)


def _make_params(key, spec, in_dim, width):
    params = []
    last = in_dim
    for kind, has_ln in spec:
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (last, width)) * 0.3
        b = jax.random.normal(k2, (width,)) * 0.1
        ln = (jnp.ones(width), jnp.zeros(width)) if has_ln else (None, None)
        params.append((w, b, *ln))
        last = width
    key, k1, k2 = jax.random.split(key, 3)
    wf = jax.random.normal(k1, (last, last)) * 0.3
    bf = jax.random.normal(k2, (last,)) * 0.1
    params.append((wf, bf))
    return tuple(params)


def _inputs(p=64, f=6, b=5, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(p, f)).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, b + 1, size=(p,))).astype(np.int32))
    return pts, seg, b + 1


@pytest.mark.parametrize(
    "spec",
    [
        (("plain", False),),
        (("plain", False), ("residual", False)),
        (("plain", False), ("residual", False), ("residual", False)),
        (),
    ],
    ids=["plain", "plain+res", "deep", "empty"],
)
@pytest.mark.parametrize("activation", ["gelu", "relu"])
def test_pallas_matches_xla_forward(spec, activation):
    pts, seg, s = _inputs()
    params = _make_params(jax.random.PRNGKey(0), spec, 6, 32)
    ref = phi_pool_xla(pts, seg, spec, params, activation, s)
    out = phi_pool_pallas(pts, seg, spec, params, activation, s, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


def test_pallas_bf16_close_to_f32():
    spec = (("plain", False), ("residual", False))
    pts, seg, s = _inputs()
    params = _make_params(jax.random.PRNGKey(1), spec, 6, 32)
    ref = phi_pool_xla(pts, seg, spec, params, "gelu", s)
    out = phi_pool_pallas(
        pts.astype(jnp.bfloat16), seg, spec, params, "gelu", s, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=0.05, atol=0.1)


@pytest.mark.parametrize("activation", ["gelu", "relu"])
def test_custom_vjp_matches_xla_grads(activation):
    spec = (("plain", False), ("residual", False))
    pts, seg, s = _inputs()
    params = _make_params(jax.random.PRNGKey(2), spec, 6, 32)

    def loss_fused(pts, params):
        out = phi_pool(pts, seg, spec, params, activation, s, True)
        return jnp.sum(out**2)

    def loss_xla(pts, params):
        out = phi_pool_xla(pts, seg, spec, params, activation, s)
        return jnp.sum(out**2)

    (v1, g1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(pts, params)
    (v2, g2) = jax.value_and_grad(loss_xla, argnums=(0, 1))(pts, params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_deepsets_fused_on_matches_off():
    """Full model: fused_phi='on' (interpreted pallas) == 'off' (XLA)."""
    from point_cloud_classifier_tpu.models import DeepSets

    from tests.test_parallel import _pointcloud_batch

    batch = _pointcloud_batch()
    mk = lambda mode: DeepSets(
        input_dim=6,
        phi_layers=[32, 32],
        rho_layers=[32],
        output_dim=1,
        activation="gelu",
        layer_norm=False,
        residual_block=True,
        pooling="mean",
        fused_phi=mode,
    )
    off = mk("off")
    variables = off.init(jax.random.PRNGKey(0), batch, train=False)
    out_off = off.apply(variables, batch, train=False)
    out_on = mk("on").apply(variables, batch, train=False)
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_on), rtol=1e-4, atol=1e-4
    )


def test_auto_pallas_gating_by_width_and_backend():
    from unittest.mock import patch

    from point_cloud_classifier_tpu.models.deep_sets import DeepSets

    def mk(width, **kw):
        kw.setdefault("layer_norm", False)
        return DeepSets(
            input_dim=6, phi_layers=[width, width], rho_layers=[64],
            output_dim=1, activation="gelu",
            residual_block=True, pooling="mean", **kw,
        )

    assert not mk(1024)._use_pallas(train=False)  # cpu backend: XLA
    with patch("jax.default_backend", return_value="tpu"):
        # "auto" is XLA at every width in BOTH phases since the post-pool
        # final-linear default (2026-08-18 device-truth eval A/B: XLA won
        # 248.0k vs 223.2k at 256 and 191.3k vs 172.1k at 512 — see
        # models/deep_sets._use_pallas and docs/kernels.md)
        assert not mk(256)._use_pallas(train=True)
        assert not mk(512)._use_pallas(train=True)
        assert not mk(1024)._use_pallas(train=True)
        assert not mk(256)._use_pallas(train=False)
        assert not mk(512)._use_pallas(train=False)
        assert not mk(1024)._use_pallas(train=False)
        assert not mk(1024, layer_norm=True)._use_pallas(train=False)
        # explicit modes override the measurement policy in both phases
        assert mk(256, fused_phi="on")._use_pallas(train=True)
        assert not mk(1024, fused_phi="off")._use_pallas(train=False)


def test_pallas_adaptive_tile_wide_phi_parity():
    # width 512 chain through the kernel (interpret mode) vs the XLA oracle;
    # exercises the VMEM-budgeted tile selection (tile*width <= 2**20)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from point_cloud_classifier_tpu.ops.fused_phi import (
        phi_pool_pallas,
        phi_pool_xla,
    )

    rng = np.random.default_rng(0)
    p, f, h, bsz = 512, 6, 512, 7
    spec = (("plain", False), ("residual", False))

    def lin(i, o):
        return (
            jnp.asarray(rng.normal(size=(i, o)) * 0.1, dtype=jnp.float32),
            jnp.asarray(rng.normal(size=(o,)) * 0.1, dtype=jnp.float32),
            None,
            None,
        )

    params = (lin(f, h), lin(h, h), lin(h, h)[:2])
    pts = jnp.asarray(rng.normal(size=(p, f)), dtype=jnp.float32)
    seg = jnp.sort(jnp.asarray(rng.integers(0, bsz, size=(p,)), dtype=jnp.int32))
    want = phi_pool_xla(pts, seg, spec, params, "gelu", bsz + 1)
    got = phi_pool_pallas(pts, seg, spec, params, "gelu", bsz + 1, interpret=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-5, atol=2e-5)


def test_fused_backward_kernel_used_and_matches(monkeypatch):
    """The custom VJP routes to the Pallas backward kernel (spy-gated so a
    silent XLA fallback can't pass) and its grads match the XLA replay."""
    import point_cloud_classifier_tpu.ops.fused_phi as fp

    spec = (("plain", False), ("residual", False))
    pts, seg, s = _inputs(p=128)  # pow2 rows: backward kernel eligible
    params = _make_params(jax.random.PRNGKey(3), spec, 6, 32)

    calls = []
    real = fp.phi_pool_bwd_pallas

    def spy(*a, **k):
        out = real(*a, **k)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(fp, "phi_pool_bwd_pallas", spy)

    def loss_fused(pts, params):
        return jnp.sum(fp.phi_pool(pts, seg, spec, params, "gelu", s, True) ** 2)

    def loss_xla(pts, params):
        return jnp.sum(fp.phi_pool_xla(pts, seg, spec, params, "gelu", s) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(pts, params)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(pts, params)
    assert calls == [True], "Pallas backward kernel was not used"
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fused_backward_falls_back_on_untileable_rows():
    """Non-pow2 row counts can't tile: backward must take the XLA replay
    (returns None) and still produce correct grads through phi_pool."""
    import point_cloud_classifier_tpu.ops.fused_phi as fp

    spec = (("plain", False),)
    pts, seg, s = _inputs(p=96)  # 96 = 3*32: not a pow2, not tileable
    params = _make_params(jax.random.PRNGKey(4), spec, 6, 32)
    assert (
        fp.phi_pool_bwd_pallas(
            pts, seg, jnp.zeros((s, 32)), spec, params, "gelu", s, interpret=True
        )
        is None
    )

    def loss_fused(pts, params):
        return jnp.sum(fp.phi_pool(pts, seg, spec, params, "gelu", s, True) ** 2)

    def loss_xla(pts, params):
        return jnp.sum(fp.phi_pool_xla(pts, seg, spec, params, "gelu", s) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(pts, params)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(pts, params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fused_backward_bf16_param_grads_close():
    """bf16 compute: per-tile f32 accumulation of d_params stays within
    bf16 rounding of the XLA replay's whole-array contraction."""
    import point_cloud_classifier_tpu.ops.fused_phi as fp

    spec = (("plain", False), ("residual", False))
    rng = np.random.default_rng(5)
    p, f, bsz = 256, 6, 5
    pts = jnp.asarray(rng.normal(size=(p, f)), jnp.bfloat16)
    seg = jnp.sort(jnp.asarray(rng.integers(0, bsz + 1, size=(p,)), jnp.int32))
    params = _make_params(jax.random.PRNGKey(6), spec, 6, 32)

    # LINEAR loss with a fixed weighting: both paths then see the exact
    # same cotangent, isolating the backward (a nonlinear loss would feed
    # the two paths different cotangents through the bf16 forward delta)
    c = jnp.asarray(rng.normal(size=(bsz, 32)), jnp.float32)

    def loss(fn):
        def inner(pts, params):
            if fn == "fused":
                out = fp.phi_pool(pts, seg, spec, params, "gelu", bsz + 1, True)
            else:
                out = fp.phi_pool_xla(pts, seg, spec, params, "gelu", bsz + 1)
            return jnp.sum(out[:bsz] * c)

        return inner

    g1 = jax.grad(loss("fused"), argnums=(0, 1))(pts, params)
    g2 = jax.grad(loss("xla"), argnums=(0, 1))(pts, params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
        rel = np.linalg.norm(a64 - b64) / (np.linalg.norm(b64) + 1e-8)
        assert rel < 1e-2, rel


def test_tail_empty_spec_backward_kernel_used_and_matches(monkeypatch):
    """Tail fusion (empty spec = final linear + pool): the closed-form
    backward kernel is used (spy-gated) and matches XLA grads exactly."""
    import point_cloud_classifier_tpu.ops.fused_phi as fp

    rng = np.random.default_rng(7)
    p, k, h, bsz = 128, 32, 32, 5
    pts = jnp.asarray(rng.normal(size=(p, k)).astype(np.float32))
    seg = jnp.sort(jnp.asarray(rng.integers(0, bsz + 1, size=(p,)), jnp.int32))
    params = (
        (
            jnp.asarray(rng.normal(size=(k, h)).astype(np.float32) * 0.3),
            jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1),
        ),
    )
    s = bsz + 1

    calls = []
    real = fp.phi_pool_bwd_pallas

    def spy(*a, **kw):
        out = real(*a, **kw)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(fp, "phi_pool_bwd_pallas", spy)

    def loss_fused(pts, params):
        return jnp.sum(fp.phi_pool(pts, seg, (), params, "gelu", s, True) ** 2)

    def loss_xla(pts, params):
        return jnp.sum(fp.phi_pool_xla(pts, seg, (), params, "gelu", s) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(pts, params)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(pts, params)
    assert calls == [True], "closed-form backward kernel was not used"
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_deepsets_tail_matches_off():
    """fused_phi='tail' (XLA hidden chain + fused final-linear+pool) is
    forward- and gradient-equivalent to the pure XLA path."""
    from point_cloud_classifier_tpu.models import DeepSets

    from tests.test_parallel import _pointcloud_batch

    batch = _pointcloud_batch()
    mk = lambda mode: DeepSets(  # noqa: E731
        input_dim=6,
        phi_layers=[32, 32],
        rho_layers=[32],
        output_dim=1,
        activation="gelu",
        layer_norm=False,
        residual_block=True,
        pooling="mean",
        fused_phi=mode,
    )
    off = mk("off")
    variables = off.init(jax.random.PRNGKey(0), batch, train=False)
    out_off = off.apply(variables, batch, train=True)
    out_tail = mk("tail").apply(variables, batch, train=True)
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_tail), rtol=1e-4, atol=1e-4
    )

    def loss(model):
        def f(v):
            return jnp.sum(model.apply(v, batch, train=True) ** 2)

        return jax.value_and_grad(f)(variables)

    v_off, g_off = loss(off)
    v_tail, g_tail = loss(mk("tail"))
    np.testing.assert_allclose(float(v_off), float(v_tail), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_tail)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_phi_mode_routing():
    from unittest.mock import patch

    from point_cloud_classifier_tpu.models.deep_sets import DeepSets

    def mk(**kw):
        kw.setdefault("fused_phi", "auto")
        kw.setdefault("pooling", "mean")
        return DeepSets(
            input_dim=6, phi_layers=[256, 256], rho_layers=[64],
            output_dim=1, activation="gelu", layer_norm=False,
            residual_block=True, **kw,
        )

    assert mk(fused_phi="tail")._phi_mode(train=True) == "tail"
    assert mk(fused_phi="tail", pooling="max")._phi_mode(train=True) == "xla"
    assert mk(fused_phi="off")._phi_mode(train=True) == "xla"
    assert mk(fused_phi="on")._phi_mode(train=True) == "pallas"
    with patch("jax.default_backend", return_value="tpu"):
        # eval under "tail" stays on the tail kernel at every width: the
        # full-forward crossover it used to defer to was withdrawn with
        # the post-pool default (see _use_pallas)
        m = DeepSets(
            input_dim=6, phi_layers=[512, 512], rho_layers=[64],
            output_dim=1, activation="gelu", layer_norm=False,
            residual_block=True, pooling="mean", fused_phi="tail",
        )
        assert m._phi_mode(train=False) == "tail"


@pytest.mark.parametrize(
    "knobs",
    [
        {"PCC_PHI_SPLIT": "2", "PCC_PHI_SPLIT_BWD": "2"},
        {"PCC_PHI_SPLIT": "4", "PCC_PHI_SPLIT_BWD": "4"},
        {"PCC_PHI_TILE": "128", "PCC_PHI_SPLIT": "2"},
        {"PCC_PHI_TILE_BWD": "128", "PCC_PHI_SPLIT_BWD": "2"},
        {"PCC_PHI_TILE": "128", "PCC_PHI_TILE_BWD": "128"},
        {"PCC_PHI_VMEM_MB": "32", "PCC_PHI_TILE_BWD": "128"},
    ],
    ids=["split2", "split4", "fwd-t128-s2", "bwd-t128-s2", "t128-both", "vmem32"],
)
def test_tuning_knob_combinations_keep_grads_exact(monkeypatch, knobs):
    """Every knob combination scripts/phi_ab.sh exercises (tile overrides,
    row splits, the scoped-VMEM raise — scaled to test shapes) must keep
    fwd+bwd parity with the XLA oracle, so a device A/B can never pick a
    numerically wrong configuration.  Knobs are read at trace time
    (``_env_int`` inside phi_pool_pallas / phi_pool_bwd_pallas)."""
    import point_cloud_classifier_tpu.ops.fused_phi as fp

    for k, v in knobs.items():
        monkeypatch.setenv(k, v)

    spec = (("plain", False), ("residual", False))
    pts, seg, s = _inputs(p=256, seed=7)  # pow2 rows >= 2 tiles at t=128
    params = _make_params(jax.random.PRNGKey(7), spec, 6, 32)

    want = fp.phi_pool_xla(pts, seg, spec, params, "gelu", s)
    got = fp.phi_pool_pallas(pts, seg, spec, params, "gelu", s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-4, atol=1e-4
    )

    def loss_fused(pts, params):
        return jnp.sum(fp.phi_pool(pts, seg, spec, params, "gelu", s, True) ** 2)

    def loss_xla(pts, params):
        return jnp.sum(fp.phi_pool_xla(pts, seg, spec, params, "gelu", s) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(pts, params)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(pts, params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_hidden_only_params_forward_and_backward_kernels(monkeypatch):
    """Post-pool placement passes HIDDEN-ONLY params (len(params) ==
    len(spec)): both kernels must skip the final linear — forward parity
    vs the XLA hidden chain + segment sum, and the fused backward must
    still run (spy-gated) with grads matching the XLA replay."""
    import point_cloud_classifier_tpu.ops.fused_phi as fp

    spec = (("plain", False), ("residual", False))
    pts, seg, s = _inputs(p=128, seed=9)
    hidden = _make_params(jax.random.PRNGKey(9), spec, 6, 32)[:-1]
    assert len(hidden) == len(spec)

    want = fp.phi_pool_xla(pts, seg, spec, hidden, "gelu", s)
    got = fp.phi_pool_pallas(pts, seg, spec, hidden, "gelu", s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-4, atol=1e-4
    )

    calls = []
    real = fp.phi_pool_bwd_pallas

    def spy(*a, **k):
        out = real(*a, **k)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(fp, "phi_pool_bwd_pallas", spy)

    def loss_fused(pts, params):
        return jnp.sum(fp.phi_pool(pts, seg, spec, params, "gelu", s, True) ** 2)

    def loss_xla(pts, params):
        return jnp.sum(fp.phi_pool_xla(pts, seg, spec, params, "gelu", s) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(pts, hidden)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(pts, hidden)
    assert calls == [True], "hidden-only backward kernel was not used"
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_bwd_auto_tile_static_vmem_anchors(monkeypatch):
    """Round-5 TPU calibration table for the backward's auto tile
    (ops/fused_phi._bwd_auto_tile): the static-footprint correction must
    keep every tuned default AND reject the shapes Mosaic hard-fails on
    (all five anchors TPU-verified 2026-08-21 — w1024×2 at the old
    formula's tile 512 was a remote-compile crash; the sweep's deepest
    draw w1024×4 has ~17 MB of f32 d_param accumulators and can never
    fit, so explicit fused_phi="on" now falls back to the XLA replay
    instead of crashing)."""
    import point_cloud_classifier_tpu.ops.fused_phi as fp

    monkeypatch.delenv("PCC_PHI_TILE_BWD", raising=False)
    monkeypatch.delenv("PCC_PHI_VMEM_MB", raising=False)

    def tile_for(width, layers, itemsize=2, split_req=2, segs=257):
        spec = (("plain", True),) * (layers - 1)  # chain spec, no LN
        key = jax.random.PRNGKey(0)
        params = _make_params(key, spec, 6, width)
        return fp._bwd_auto_tile(
            spec, params, width, segs, split_req, itemsize
        )

    assert tile_for(256, 2) == 2048   # flagship default stands
    assert tile_for(512, 2) == 1024   # measured round-2 default stands
    assert tile_for(1024, 2) == 256   # old formula said 512: compile crash
    assert tile_for(1024, 4) is None  # statically infeasible -> XLA replay

    # a raised PCC_PHI_VMEM_MB grows the pool in step (expert knob)
    monkeypatch.setenv("PCC_PHI_VMEM_MB", "100")
    assert tile_for(1024, 4) is not None

    # explicit tile override skips the gate (paired with the vmem knob in
    # phi_ab A/B arms; must fail loudly, not silently reroute to XLA)
    monkeypatch.delenv("PCC_PHI_VMEM_MB", raising=False)
    monkeypatch.setenv("PCC_PHI_TILE_BWD", "512")
    assert tile_for(1024, 4) == 512  # gate skipped: raw row-linear value
