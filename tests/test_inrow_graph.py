"""Fused in-row aggregation kernel (ops/inrow_graph.py) vs the XLA oracle.

Kernel runs in Pallas interpreter mode on CPU; the XLA compare-build path
(`inrow_aggregate_xla`) is the semantics oracle — itself pinned against the
flat layout by tests/test_dense_graph.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.data.batching import GraphLoader
from point_cloud_classifier_tpu.ops.inrow_graph import (
    inrow_adjacency_xla,
    inrow_aggregate,
    inrow_aggregate_xla,
)


def _random_inrow(rng, b=3, m=32, d=4, h=8, frac=0.5):
    in_src = rng.integers(0, m, size=(b, m, d)).astype(np.int32)
    in_w = (rng.random((b, m, d)) * (rng.random((b, m, d)) < frac)).astype(
        np.float32
    )
    x = rng.normal(size=(b, m, h)).astype(np.float32)
    # out-row mirror built from the dense adjacency's transpose
    adj = np.asarray(inrow_adjacency_xla(in_src, in_w, m, jnp.float32))
    adj_t = np.swapaxes(adj, 1, 2)
    d_out = max(4, int((adj_t != 0).sum(axis=2).max()))
    out_dst = np.zeros((b, m, d_out), np.int32)
    out_w = np.zeros((b, m, d_out), np.float32)
    for bb in range(b):
        for row in range(m):
            cols = np.flatnonzero(adj_t[bb, row])
            out_dst[bb, row, : len(cols)] = cols
            out_w[bb, row, : len(cols)] = adj_t[bb, row, cols]
    return x, in_src, in_w, out_dst, out_w


@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_kernel_matches_xla_forward(aggr):
    rng = np.random.default_rng(0)
    x, in_src, in_w, out_dst, out_w = _random_inrow(rng)
    got = inrow_aggregate(x, in_src, in_w, out_dst, out_w, aggr, True)
    want = inrow_aggregate_xla(x, in_src, in_w, aggr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_kernel_gradient_matches_xla(aggr):
    rng = np.random.default_rng(1)
    x, in_src, in_w, out_dst, out_w = _random_inrow(rng)
    g = rng.normal(size=x.shape[:2] + (x.shape[2],)).astype(np.float32)

    def loss_kernel(xx):
        return jnp.sum(
            inrow_aggregate(xx, in_src, in_w, out_dst, out_w, aggr, True) * g
        )

    def loss_xla(xx):
        return jnp.sum(inrow_aggregate_xla(xx, in_src, in_w, aggr) * g)

    dk = jax.grad(loss_kernel)(x)
    dx = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dx), rtol=1e-4, atol=1e-5)


def test_non_pow2_m_falls_back_to_xla():
    rng = np.random.default_rng(2)
    b, m, d, h = 2, 24, 4, 8  # m multiple of 8 but not a power of two
    in_src = rng.integers(0, m, size=(b, m, d)).astype(np.int32)
    in_w = rng.random((b, m, d)).astype(np.float32)
    x = rng.normal(size=(b, m, h)).astype(np.float32)
    got = inrow_aggregate(x, in_src, in_w, None, None, "add", True)
    want = inrow_aggregate_xla(x, in_src, in_w, "add")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def _random_graphs(n_graphs, seed):
    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(3, 12))
        pairs = sorted(
            {
                (int(a), int(bb))
                for a, bb in rng.integers(0, n, size=(3 * n, 2))
                if a != bb
            }
        )
        edges = np.array(pairs, dtype=np.int32).T.reshape(2, -1)
        graphs.append(
            {
                "features": rng.normal(size=(n, 4)).astype(np.float32),
                "edges": edges,
                "weights": rng.uniform(0.1, 1.0, size=(edges.shape[1],)).astype(
                    np.float32
                ),
                "label": float(i % 2),
            }
        )
    return graphs


def test_loader_out_lists_are_the_transposed_adjacency():
    """in-row and out-row wires must describe the same adjacency, transposed."""
    graphs = _random_graphs(6, seed=3)
    loader = GraphLoader(
        graphs, batch_size=3, shuffle=False, layout="dense", emit_out_rows=True
    )
    for batch in loader:
        assert "out_dst" in batch and "out_w" in batch
        m = batch["nodes"].shape[1]
        a_in = np.asarray(
            inrow_adjacency_xla(batch["in_src"], batch["in_w"], m, jnp.float32)
        )
        a_out = np.asarray(
            inrow_adjacency_xla(batch["out_dst"], batch["out_w"], m, jnp.float32)
        )
        np.testing.assert_allclose(a_in, np.swapaxes(a_out, 1, 2), rtol=1e-6)


def test_loader_out_lists_native_matches_python():
    import os

    import point_cloud_classifier_tpu.native as native

    if not native.packer_available():
        pytest.skip("C++ toolchain unavailable")
    graphs = _random_graphs(10, seed=4)
    mk = lambda: GraphLoader(
        graphs, batch_size=4, shuffle=True, seed=11, layout="dense",
        transfer_dtype="float16", emit_out_rows=True,
    )
    a = list(mk())
    os.environ["PCC_NATIVE"] = "0"
    native._packer_lib = None
    try:
        b = list(mk())
    finally:
        del os.environ["PCC_NATIVE"]
        native._packer_lib = None
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for key in ba:
            np.testing.assert_array_equal(ba[key], bb[key], err_msg=key)


def test_default_wire_omits_out_rows():
    graphs = _random_graphs(4, seed=5)
    for batch in GraphLoader(graphs, batch_size=2, shuffle=False, layout="dense"):
        assert "out_dst" not in batch and "in_src" in batch


@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_kernel_weight_gradient_matches_xla(aggr):
    """dL/din_w must be the true cotangent, not silent zeros."""
    rng = np.random.default_rng(6)
    x, in_src, in_w, out_dst, out_w = _random_inrow(rng)
    g = rng.normal(size=x.shape).astype(np.float32)

    dk = jax.grad(
        lambda w: jnp.sum(inrow_aggregate(x, in_src, w, out_dst, out_w, aggr, True) * g)
    )(in_w)
    dx = jax.grad(
        lambda w: jnp.sum(inrow_aggregate_xla(x, in_src, w, aggr) * g)
    )(in_w)
    # the oracle's mean path differentiates through the (w != 0) degree
    # indicator the same way (piecewise-constant -> no extra term)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dx), rtol=1e-4, atol=1e-5)


def test_model_fused_path_matches_xla_path(monkeypatch):
    """GraphNet(fused_inrow=True) end-to-end (kernel in interpreter mode)
    must reproduce the ordinary dense path's logits and updates."""
    import point_cloud_classifier_tpu.ops.inrow_graph as ig
    from point_cloud_classifier_tpu.models import GraphNet, ModelWrapper

    graphs = _random_graphs(8, seed=7)

    def run(fused):
        loader = GraphLoader(
            graphs, batch_size=4, shuffle=False, layout="dense",
            emit_out_rows=fused, min_dense_nodes=16,
        )
        model = GraphNet(
            input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
            local_pooling="mean", deepchem_style=True, fused_inrow=fused,
        )
        w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0)
        w.fit(loader)
        return w

    base = run(False)
    # route the fused gate through the interpreter-mode kernel on CPU,
    # counting calls so a silently-disengaged gate fails the test
    calls = {"n": 0}
    orig = ig.inrow_aggregate

    def spy(*args, **kw):
        calls["n"] += 1
        return orig(*args, **dict(kw, interpret=True))

    monkeypatch.setattr(ig, "inrow_aggregate", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fused = run(True)
    assert calls["n"] > 0, "fused_inrow path never engaged"
    for pa, pb in zip(jax.tree.leaves(base.params), jax.tree.leaves(fused.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=2e-5
        )


# -- inrow_gather (the scatter-free per-edge gather behind in-row GAT) -----


def _gather_wires(seed=5, n=6, bsz=3):
    loader = GraphLoader(
        _random_graphs(n, seed=seed),
        batch_size=bsz,
        shuffle=False,
        layout="dense",
        emit_out_rows=True,
    )
    batch = next(iter(loader))
    assert "out_pos" in batch
    return batch


def test_out_pos_names_each_edges_inrow_slot():
    """Wire contract: valid out slot (j, q) of graph b must satisfy
    in_src[b, out_dst[j,q], out_pos[j,q]] == j with a live in-row weight."""
    batch = _gather_wires()
    in_src = np.asarray(batch["in_src"], dtype=np.int64)
    in_w = np.asarray(batch["in_w"])
    out_dst = np.asarray(batch["out_dst"], dtype=np.int64)
    out_pos = np.asarray(batch["out_pos"], dtype=np.int64)
    out_w = np.asarray(batch["out_w"])
    b, m, q = out_dst.shape
    checked = 0
    for bb in range(b):
        for j in range(m):
            for s in range(q):
                if out_w[bb, j, s] == 0:
                    continue
                i, pos = out_dst[bb, j, s], out_pos[bb, j, s]
                assert in_src[bb, i, pos] == j
                assert in_w[bb, i, pos] != 0
                checked += 1
    assert checked > 0


def test_inrow_gather_forward_and_backward_match_autodiff():
    from point_cloud_classifier_tpu.ops.inrow_graph import (
        _inrow_gather_impl,
        inrow_gather,
    )

    batch = _gather_wires()
    in_src = jnp.asarray(batch["in_src"], jnp.int32)
    in_w = jnp.asarray(batch["in_w"])
    out_dst = jnp.asarray(batch["out_dst"], jnp.int32)
    out_pos = jnp.asarray(batch["out_pos"], jnp.int32)
    out_w = jnp.asarray(batch["out_w"])
    b, m, d = in_src.shape
    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.normal(size=(b, m, 5)).astype(np.float32))
    # the usage contract: upstream cotangent vanishes on padding slots
    cot = jnp.asarray(
        rng.normal(size=(b, m, d, 5)).astype(np.float32)
    ) * (in_w != 0)[..., None]

    got = inrow_gather(values, in_src, out_dst, out_pos, out_w)
    want = _inrow_gather_impl(values, in_src)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    g1 = jax.grad(
        lambda v: jnp.sum(inrow_gather(v, in_src, out_dst, out_pos, out_w) * cot)
    )(values)
    g2 = jax.grad(lambda v: jnp.sum(_inrow_gather_impl(v, in_src) * cot))(values)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_inrow_gather_backward_without_out_wires_raises():
    from point_cloud_classifier_tpu.ops.inrow_graph import inrow_gather

    batch = _gather_wires()
    in_src = jnp.asarray(batch["in_src"], jnp.int32)
    values = jnp.zeros((*in_src.shape[:2], 3), jnp.float32)
    with pytest.raises(ValueError, match="out-row mirror"):
        jax.grad(
            lambda v: jnp.sum(inrow_gather(v, in_src, None, None, None))
        )(values)
