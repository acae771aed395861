"""int8 inference path (ops/quant.py): numerics, routing, and end-to-end
agreement with the float forward.

The quantized path is eval/infer-only TPU-native capability (the reference
serves f32 torch); these tests pin the quantization math on CPU — the
s8 MXU speed claim is A/B'd by ``bench.py --latency --quant int8``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.models.deep_sets import DeepSets
from point_cloud_classifier_tpu.ops.fused_phi import phi_forward_xla
from point_cloud_classifier_tpu.ops.quant import (
    int8_linear,
    phi_forward_int8,
    quantize_cols,
    quantize_rows,
)


def test_quantize_rows_roundtrip_and_padding():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32) * 5.0)
    x = x.at[3].set(0.0)  # an all-zero padding row
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    # symmetric 127-level quantization: error bounded by scale/2 per element
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s), np.asarray(x),
        atol=float(jnp.max(s)) * 0.51,
    )
    assert int(jnp.max(jnp.abs(q[3]))) == 0  # zero rows quantize to zero


def test_quantize_cols_per_channel_scales():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 8)).astype(np.float32)
    w[:, 2] *= 100.0  # a heavy channel must not blow up the others' scales
    q, s = quantize_cols(jnp.asarray(w))
    deq = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(deq - w).max(axis=0) / np.abs(w).max(axis=0)
    assert rel.max() < 1 / 127  # per-channel: every column at full precision


def test_int8_linear_matches_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)
    ref = x @ w + b
    out = int8_linear(x, w, b, jnp.float32)
    # dynamic per-row × per-channel symmetric int8: ~1% relative is typical
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 0.02


def test_int8_linear_uses_int8_dot():
    x = jnp.ones((8, 16), jnp.float32)
    w = jnp.ones((16, 4), jnp.float32)
    jaxpr = str(jax.make_jaxpr(lambda a, c: int8_linear(a, c, None, jnp.float32))(x, w))
    assert "i8[" in jaxpr, "operands must reach dot_general as int8"
    assert "preferred_element_type=int32" in jaxpr


def _phi_fixture(width=32, depth=3, p=256, f=6, seed=3):
    rng = np.random.default_rng(seed)
    spec, params, last = [], [], f
    for i in range(depth):
        kind = "residual" if last == width else "plain"
        spec.append((kind, False))
        params.append(
            (
                jnp.asarray(rng.normal(size=(last, width)).astype(np.float32) * 0.3),
                jnp.asarray(rng.normal(size=(width,)).astype(np.float32) * 0.1),
                None,
                None,
            )
        )
        last = width
    params.append(
        (
            jnp.asarray(rng.normal(size=(last, last)).astype(np.float32) * 0.3),
            jnp.asarray(rng.normal(size=(last,)).astype(np.float32) * 0.1),
        )
    )
    pts = jnp.asarray(rng.normal(size=(p, f)).astype(np.float32))
    return pts, tuple(spec), tuple(params)


def test_phi_forward_int8_close_to_xla():
    pts, spec, params = _phi_fixture()
    ref = phi_forward_xla(pts, spec, params, "gelu")
    out = phi_forward_int8(pts, spec, params, "gelu")
    denom = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) / denom < 0.05


def test_phi_forward_int8_rejects_layer_norm():
    pts, spec, params = _phi_fixture(depth=1)
    ln_spec = (("plain", True),)
    ln_params = (
        (params[0][0], params[0][1], jnp.ones(32), jnp.zeros(32)),
        params[-1],
    )
    with pytest.raises(ValueError):
        phi_forward_int8(pts, ln_spec, ln_params, "gelu")


def _flagship(quant="none", layer_norm=False):
    return DeepSets(
        input_dim=6,
        phi_layers=(32, 32),
        rho_layers=(32,),
        output_dim=1,
        activation="gelu",
        layer_norm=layer_norm,
        residual_block=True,
        pooling="mean",
        quant=quant,
    )


def _batch(b=8, p=512, f=6, seed=4):
    rng = np.random.default_rng(seed)
    seg = np.sort(rng.integers(0, b, size=(p,))).astype(np.int32)
    return {
        "points": jnp.asarray(rng.normal(size=(p, f)).astype(np.float32)),
        "seg": jnp.asarray(seg),
        "y": jnp.asarray(rng.integers(0, 2, size=(b, 1)).astype(np.float32)),
        "y_mask": jnp.ones((b, 1), jnp.float32),
    }


def test_deep_sets_int8_eval_matches_float():
    batch = _batch()
    fmodel, qmodel = _flagship("none"), _flagship("int8")
    variables = fmodel.init(jax.random.PRNGKey(0), batch, train=False)
    ref = fmodel.apply(variables, batch, train=False)
    out = qmodel.apply(variables, batch, train=False)
    # same params drive both paths; pooled logits agree to quantization noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)
    # and the predictions agree exactly on this fixture
    assert ((np.asarray(out) >= 0) == (np.asarray(ref) >= 0)).all()


def test_deep_sets_int8_routing():
    q = _flagship("int8")
    assert q._phi_mode(train=False) == "int8"
    assert q._phi_mode(train=True) == "xla"  # training never quantizes
    # layer_norm rescales rows mid-chain → float fallback
    assert _flagship("int8", layer_norm=True)._phi_mode(train=False) != "int8"


def test_deep_sets_int8_train_step_is_float():
    batch = _batch()
    qmodel = _flagship("int8")
    variables = qmodel.init(jax.random.PRNGKey(0), batch, train=True)
    jaxpr = str(
        jax.make_jaxpr(lambda v, bt: qmodel.apply(v, bt, train=True))(
            variables, batch
        )
    )
    assert "i8[" not in jaxpr  # the training graph stays on the float path


def test_deep_sets_int8_eval_on_dense_wire():
    """The int8 eval path composes with the DENSE point-cloud wire: the
    per-point quantized chain runs on the reshaped rows and the masked
    matvec pool gates the in-row padding."""
    flat = _batch()
    b, m, f = 8, 128, 6
    rng = np.random.default_rng(4)
    seg = np.asarray(flat["seg"])
    pts = np.asarray(flat["points"])
    counts = np.bincount(seg, minlength=b).astype(np.int32)
    dense_pts = np.zeros((b, m, f), dtype=np.float32)
    off = 0
    for row, n in enumerate(counts):
        dense_pts[row, :n] = pts[off : off + n]
        off += n
    dense = {
        "points": jnp.asarray(dense_pts),
        "seg_counts": jnp.asarray(np.concatenate([counts, [0]]).astype(np.int32)),
        "y": flat["y"],
        "y_mask": flat["y_mask"],
    }
    fmodel, qmodel = _flagship("none"), _flagship("int8")
    variables = fmodel.init(jax.random.PRNGKey(0), flat, train=False)
    ref_flat = qmodel.apply(variables, flat, train=False)
    out_dense = qmodel.apply(variables, dense, train=False)
    # identical quantized math on both wires (padding rows quantize to 0
    # activations but are masked out of the pool)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(ref_flat), atol=0.05
    )


def test_resolve_quant_auto_gates_on_measured_crossover():
    """``--quant auto`` resolves by the measured int8 crossover (factory
    table, 2026-08-20: int8 loses at φ width 256/512, wins +12% at 1024):
    int8 iff deep_sets with max φ width ≥ 1024; never an error path."""
    from point_cloud_classifier_tpu.factory import apply_quant, resolve_quant

    small = {"model": {"phi_layers": [256, 256]}}
    big = {"model": {"phi_layers": [512, 1024]}}
    assert resolve_quant(small, "deep_sets", "auto") == "none"
    assert resolve_quant(big, "deep_sets", "auto") == "int8"
    # auto on an unsupported model resolves to none instead of raising
    assert resolve_quant(big, "graph_net", "auto") == "none"
    cfg = {"model": {}}
    apply_quant(cfg, "graph_net", "auto")
    assert "quant" not in cfg["model"]
    # explicit int8 still validates (and still errors off-model)
    assert resolve_quant(small, "deep_sets", "int8") == "int8"
    apply_quant(big, "deep_sets", "auto")
    assert big["model"]["quant"] == "int8"
    # layer_norm configs run the float phi path inside DeepSets, so auto
    # must not label them int8 (the artifacts would be float numbers)
    ln = {"model": {"phi_layers": [1024], "layer_norm": True}}
    assert resolve_quant(ln, "deep_sets", "auto") == "none"
