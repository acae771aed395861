"""Model-layer tests: op semantics vs hand math and vs torch where it pins them.

torch (CPU) is available in the image, so BatchNorm/LayerNorm/Linear-init
semantics are cross-checked against the actual torch modules the reference
uses.  Graph ops are checked against hand-computed message passing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.models import DeepSets, FullyConnectedNet, GraphNet
from point_cloud_classifier_tpu.models.common import (
    MaskedBatchNorm,
    TorchLayerNorm,
    TorchLinear,
)
from point_cloud_classifier_tpu.models.graph_net import GATConv, GraphConv, SAGPool
from point_cloud_classifier_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_rank_desc,
    segment_softmax,
    segment_sum,
)


# --- segment ops -----------------------------------------------------------


def test_segment_sum_matmul_matches_scatter(rng):
    data = jnp.asarray(rng.normal(size=(50, 8)), dtype=jnp.float32)
    seg = jnp.asarray(rng.integers(0, 5, size=50), dtype=jnp.int32)
    a = segment_sum(data, seg, 5, method="scatter")
    b = segment_sum(data, seg, 5, method="matmul")
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_segment_mean_and_max_empty_segments():
    data = jnp.array([[1.0], [3.0], [5.0]])
    seg = jnp.array([0, 0, 2])
    mean = segment_mean(data, seg, 4)
    np.testing.assert_allclose(mean[:, 0], [2.0, 0.0, 5.0, 0.0])
    mx = segment_max(data, seg, 4)
    np.testing.assert_allclose(mx[:, 0], [3.0, 0.0, 5.0, 0.0])  # empties → 0


def test_segment_softmax_masks_and_normalizes(rng):
    logits = jnp.asarray(rng.normal(size=12), dtype=jnp.float32)
    seg = jnp.asarray(rng.integers(0, 3, size=12), dtype=jnp.int32)
    valid = jnp.asarray(rng.integers(0, 2, size=12), dtype=jnp.float32)
    alpha = segment_softmax(logits, seg, 3, valid=valid)
    assert float(jnp.max(jnp.abs(alpha * (1 - valid)))) == 0.0
    sums = jax.ops.segment_sum(alpha, seg, num_segments=3)
    for s in range(3):
        if float(jax.ops.segment_sum(valid, seg, num_segments=3)[s]) > 0:
            assert abs(float(sums[s]) - 1.0) < 1e-5


def test_segment_rank_desc():
    score = jnp.array([0.1, 0.9, 0.5, 0.7, 0.2, 0.3])
    seg = jnp.array([0, 0, 0, 1, 1, 1])
    valid = jnp.array([1.0, 1.0, 1.0, 1.0, 0.0, 1.0])
    ranks = segment_rank_desc(score, seg, 2, valid)
    np.testing.assert_array_equal(np.asarray(ranks[:3]), [2, 0, 1])
    assert int(ranks[3]) == 0 and int(ranks[5]) == 1
    assert int(ranks[4]) == 2  # invalid ranks last


# --- torch-parity of primitives -----------------------------------------------


def test_masked_batchnorm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(1).normal(size=(16, 4)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(4)
    tbn.train()
    t_out = tbn(torch.tensor(x)).detach().numpy()

    bn = MaskedBatchNorm()
    vars0 = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    j_out, mutated = bn.apply(
        vars0, jnp.asarray(x), mask=jnp.ones(16), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(j_out, t_out, atol=1e-5)
    # running stats: torch stores unbiased var
    np.testing.assert_allclose(
        mutated["batch_stats"]["var"], tbn.running_var.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        mutated["batch_stats"]["mean"], tbn.running_mean.numpy(), atol=1e-6
    )

    # masked = torch on the unmasked prefix
    x_pad = np.concatenate([x, 99 * np.ones((4, 4), np.float32)])
    mask = np.concatenate([np.ones(16), np.zeros(4)]).astype(np.float32)
    j_masked, _ = bn.apply(
        vars0, jnp.asarray(x_pad), mask=jnp.asarray(mask), train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(j_masked[:16], t_out, atol=1e-5)

    # eval mode uses running stats
    tbn.eval()
    t_eval = tbn(torch.tensor(x)).detach().numpy()
    j_eval = bn.apply(
        {"params": vars0["params"], "batch_stats": mutated["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(j_eval, t_eval, atol=1e-5)


def test_layernorm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(2).normal(size=(7, 5)).astype(np.float32)
    t_out = torch.nn.LayerNorm(5)(torch.tensor(x)).detach().numpy()
    ln = TorchLayerNorm()
    j_out = ln.apply(ln.init(jax.random.PRNGKey(0), jnp.asarray(x)), jnp.asarray(x))
    np.testing.assert_allclose(j_out, t_out, atol=1e-5)


def test_torch_linear_init_bounds():
    lin = TorchLinear(64)
    params = lin.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))["params"]
    bound = 100**-0.5
    for name in ["kernel", "bias"]:
        vals = np.asarray(params[name])
        assert np.abs(vals).max() <= bound
        assert np.abs(vals).max() > 0.5 * bound  # actually spans the range


# --- DeepSets pooling semantics --------------------------------------------------


@pytest.mark.parametrize("pooling", ["sum", "mean", "max"])
def test_deepsets_pooling_matches_ragged(pooling):
    """Padded segment formulation == the reference's per-chunk loop math."""
    model = DeepSets(3, [8], [8], 1, "relu", layer_norm=False, pooling=pooling)
    rng = np.random.default_rng(0)
    counts = [4, 7, 2]
    events = [rng.normal(size=(c, 3)).astype(np.float32) for c in counts]
    flat = np.concatenate(events)
    p_pad = 32
    points = np.zeros((p_pad, 3), np.float32)
    points[: len(flat)] = flat
    seg = np.full(p_pad, 3, np.int32)
    seg[: len(flat)] = np.repeat(np.arange(3), counts)
    batch = {
        "points": jnp.asarray(points),
        "seg": jnp.asarray(seg),
        "y": jnp.zeros((3, 1)),
        "y_mask": jnp.ones(3),
    }
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    logits = model.apply(variables, batch, train=False)

    # reproduce with explicit ragged math through the same phi/rho params
    phi = lambda x: model.apply(variables, {
        "points": jnp.asarray(np.pad(x, ((0, p_pad - len(x)), (0, 0)))),
        "seg": jnp.asarray(np.concatenate([np.zeros(len(x)), 3 * np.ones(p_pad - len(x))]).astype(np.int32)),
        "y": jnp.zeros((3, 1)), "y_mask": jnp.ones(3)}, train=False)
    per_event = [phi(ev)[0] for ev in events]
    np.testing.assert_allclose(np.asarray(logits)[:, 0], np.asarray(per_event)[:, 0], atol=1e-4)


def test_deepsets_sum_is_sum_over_sqrt_n():
    """The reference's 'sum' pooling divides by √N (models/deep_sets.py:99)."""
    # identity-ish check: with phi ≈ identity via linear layers we can't get
    # exact identity, so compare sum vs mean pooling on equal-size segments:
    # sum/√N = mean·√N  →  logits differ unless N=1
    rng = np.random.default_rng(3)
    ev = rng.normal(size=(4, 3)).astype(np.float32)
    batch = lambda: {
        "points": jnp.asarray(np.pad(ev, ((0, 12), (0, 0)))),
        "seg": jnp.asarray(np.concatenate([np.zeros(4), np.ones(12)]).astype(np.int32)),
        "y": jnp.zeros((1, 1)),
        "y_mask": jnp.ones(1),
    }
    m_sum = DeepSets(3, [], [], 1, "relu", layer_norm=False, pooling="sum")
    m_mean = DeepSets(3, [], [], 1, "relu", layer_norm=False, pooling="mean")
    v = m_sum.init(jax.random.PRNGKey(0), batch(), train=False)
    out_sum = m_sum.apply(v, batch(), train=False)
    out_mean = m_mean.apply(v, batch(), train=False)
    # pooled_sum = pooled_mean * √4 = 2·pooled_mean (before rho bias) — check
    # via the linear structure: logits = W·pool + b
    b = v["params"]["TorchLinear_0"]["bias"]  # classifier head
    np.testing.assert_allclose(
        np.asarray(out_sum - b), 2 * np.asarray(out_mean - b), atol=1e-5
    )


# --- GraphConv / GAT / SAGPool -----------------------------------------------------


def _tiny_graph_batch():
    # 3 real nodes in one graph + 1 padding node; edges 0→1, 1→2 (+ reverses)
    nodes = jnp.asarray(np.array([[1.0], [2.0], [4.0], [0.0]], np.float32))
    node_seg = jnp.array([0, 0, 0, 1], dtype=jnp.int32)
    src = jnp.array([0, 1, 1, 2, 3, 3], dtype=jnp.int32)
    dst = jnp.array([1, 0, 2, 1, 3, 3], dtype=jnp.int32)
    edge_w = jnp.array([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    edge_mask = jnp.array([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    return nodes, node_seg, src, dst, edge_w, edge_mask


@pytest.mark.parametrize("aggr", ["add", "mean", "max"])
def test_graphconv_manual(aggr):
    nodes, node_seg, src, dst, edge_w, edge_mask = _tiny_graph_batch()
    conv = GraphConv(2, aggr)
    v = conv.init(jax.random.PRNGKey(0), nodes, src, dst, edge_w, edge_mask)
    out = conv.apply(v, nodes, src, dst, edge_w, edge_mask)

    W_rel = np.asarray(v["params"]["TorchLinear_0"]["kernel"])
    b_rel = np.asarray(v["params"]["TorchLinear_0"]["bias"])
    W_root = np.asarray(v["params"]["TorchLinear_1"]["kernel"])
    x = np.asarray(nodes)
    # incoming messages: node0 ← x1 ; node1 ← x0, x2 ; node2 ← x1
    inc = {0: [x[1]], 1: [x[0], x[2]], 2: [x[1]]}
    for i in range(3):
        msgs = np.stack(inc[i])
        if aggr == "add":
            agg = msgs.sum(0)
        elif aggr == "mean":
            agg = msgs.mean(0)
        else:
            agg = msgs.max(0)
        expect = agg @ W_rel + b_rel + x[i] @ W_root
        np.testing.assert_allclose(np.asarray(out[i]), expect, atol=1e-5)


def test_graphconv_edge_weights():
    nodes, node_seg, src, dst, edge_w, edge_mask = _tiny_graph_batch()
    w = jnp.array([0.5, 0.25, 2.0, 1.5, 0.0, 0.0])
    conv = GraphConv(1, "add")
    v = conv.init(jax.random.PRNGKey(0), nodes, src, dst, w, edge_mask)
    out = conv.apply(v, nodes, src, dst, w, edge_mask)
    W_rel = float(v["params"]["TorchLinear_0"]["kernel"][0, 0])
    b_rel = float(v["params"]["TorchLinear_0"]["bias"][0])
    W_root = float(v["params"]["TorchLinear_1"]["kernel"][0, 0])
    x = np.asarray(nodes)[:, 0]
    # node1 ← 0.5·x0 + 1.5·x2
    expect = (0.5 * x[0] + 1.5 * x[2]) * W_rel + b_rel + x[1] * W_root
    assert abs(float(out[1, 0]) - expect) < 1e-5


def test_gatconv_attention_normalizes():
    nodes, node_seg, src, dst, edge_w, edge_mask = _tiny_graph_batch()
    node_valid = (node_seg < 1).astype(jnp.float32)
    gat = GATConv(4, heads=2)
    v = gat.init(jax.random.PRNGKey(0), nodes, src, dst, edge_mask, node_valid)
    out = gat.apply(v, nodes, src, dst, edge_mask, node_valid)
    assert out.shape == (4, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_sagpool_keeps_ceil_ratio():
    # 2 graphs: 5 and 3 valid nodes → keep ceil(2.5)=3 and ceil(1.5)=2
    n = 10
    nodes = jnp.asarray(np.random.default_rng(0).normal(size=(n, 4)).astype(np.float32))
    node_seg = jnp.array([0, 0, 0, 0, 0, 1, 1, 1, 2, 2], dtype=jnp.int32)
    node_valid = (node_seg < 2).astype(jnp.float32)
    src = jnp.array([0, 1, 5, 6, 9, 9], dtype=jnp.int32)
    dst = jnp.array([1, 0, 6, 5, 9, 9], dtype=jnp.int32)
    edge_w = jnp.ones(6)
    edge_mask = jnp.array([1, 1, 1, 1, 0, 0], dtype=jnp.float32)
    pool = SAGPool(0.5)
    v = pool.init(
        jax.random.PRNGKey(0), nodes, node_seg, src, dst, edge_w, edge_mask,
        node_valid, 2,
    )
    x, new_edge_valid, keep = pool.apply(
        v, nodes, node_seg, src, dst, edge_w, edge_mask, node_valid, 2
    )
    keep = np.asarray(keep)
    assert keep[:5].sum() == 3 and keep[5:8].sum() == 2
    assert keep[8:].sum() == 0  # padding never kept
    # dropped nodes zeroed
    assert (np.asarray(x)[keep == 0] == 0).all()


# --- full model shape/NaN sanity ------------------------------------------------------


def test_fcn_forward_shapes():
    model = FullyConnectedNet(9, [32, 32], True, 1)
    batch = {
        "x": jnp.ones((8, 9)),
        "y": jnp.zeros((8, 1)),
        "y_mask": jnp.concatenate([jnp.ones(6), jnp.zeros(2)]),
    }
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(v, batch, train=True, mutable=["batch_stats"])
    assert out.shape == (8, 1) and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("deepchem", [True, False])
@pytest.mark.parametrize("use_gat,sag", [(False, False), (True, True), (False, True)])
def test_graphnet_variants_finite(deepchem, use_gat, sag):
    model = GraphNet(
        4, 16, 1, "tanh", use_gat=use_gat, gat_heads=4, sag_pool=sag,
        pool_ratio=0.5, deepchem_style=deepchem,
    )
    rng = np.random.default_rng(0)
    batch = {
        "nodes": jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32)),
        "node_seg": jnp.asarray(np.minimum(np.arange(32) // 8, 3).astype(np.int32)),
        "src": jnp.asarray(rng.integers(0, 24, 48).astype(np.int32)),
        "dst": jnp.asarray(rng.integers(0, 24, 48).astype(np.int32)),
        "edge_w": jnp.ones(48),
        "edge_mask": jnp.ones(48),
        "y": jnp.zeros((3, 1)),
        "y_mask": jnp.ones(3),
    }
    # nodes with seg==3 are padding (B=3)
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(v, batch, train=True, mutable=["batch_stats"])
    assert out.shape == (3, 1) and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("pooling", ["mean", "sum"])
@pytest.mark.parametrize("layer_norm", [False, True])
def test_postpool_final_linear_is_exact(monkeypatch, pooling, layer_norm):
    """The final φ Linear commutes with mean and sum/√N pooling (it carries
    no activation/LN — reference models/deep_sets.py:55), so the default
    post-pool placement (PCC_PHI_POSTPOOL) must match the per-point
    placement in forward AND gradients, including empty (fully padded)
    events that never see the bias."""
    model = DeepSets(
        3, [16, 16], [8], 1, "gelu",
        layer_norm=layer_norm, residual_block=True, pooling=pooling,
    )
    rng = np.random.default_rng(7)
    b, p_pad = 4, 48
    counts = [5, 9, 0, 3]  # event 2 is EMPTY — bias masking edge case
    flat = np.concatenate(
        [rng.normal(size=(c, 3)).astype(np.float32) for c in counts]
    )
    points = np.zeros((p_pad, 3), np.float32)
    points[: len(flat)] = flat
    seg = np.full(p_pad, b, np.int32)
    seg[: len(flat)] = np.repeat(np.arange(b), counts)
    batch = {
        "points": jnp.asarray(points),
        "seg": jnp.asarray(seg),
        "y": jnp.zeros((b, 1)),
        "y_mask": jnp.ones(b),
    }
    variables = model.init(jax.random.PRNGKey(2), batch, train=False)

    def run():
        out = model.apply(variables, batch, train=False)
        grads = jax.grad(
            lambda v: jnp.sum(model.apply(v, batch, train=False) ** 2)
        )(variables)
        return out, grads

    out_post, g_post = run()  # default: post-pool
    monkeypatch.setenv("PCC_PHI_POSTPOOL", "0")
    out_pp, g_pp = run()  # per-point placement (the reference's order)
    np.testing.assert_allclose(
        np.asarray(out_post), np.asarray(out_pp), rtol=1e-5, atol=1e-6
    )
    for a, c in zip(jax.tree.leaves(g_post), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5
        )


def test_remat_auto_gates_on_phi_width(monkeypatch):
    """Round-5 policy audit (docs/kernels.md): PCC_PHI_REMAT=auto remats
    the per-point φ chain only when max(phi_layers) <= 384 — remat won
    +38%/+7.1% at width 256 (B=256/64) but LOST at every measured draw at
    512 and 1024, and the B-agreement shows width drives the trade.
    Pinned at the jaxpr level: the checkpoint primitive must appear in
    the width-256 backward and be absent at width 512."""
    monkeypatch.delenv("PCC_PHI_REMAT", raising=False)
    rng = np.random.default_rng(3)
    batch = _postpool_batch(rng)

    def grad_jaxpr(width):
        model = DeepSets(
            3, [width, width], [8], 1, "gelu",
            layer_norm=False, residual_block=True, pooling="mean",
        )
        variables = model.init(jax.random.PRNGKey(2), batch, train=False)
        return str(jax.make_jaxpr(
            jax.grad(lambda v: jnp.sum(model.apply(v, batch, train=False) ** 2))
        )(variables))

    assert "remat" in grad_jaxpr(256)
    assert "remat" not in grad_jaxpr(512)
    # explicit PCC_PHI_REMAT=1 still forces remat at any width
    monkeypatch.setenv("PCC_PHI_REMAT", "1")
    assert "remat" in grad_jaxpr(512)


def _postpool_batch(rng, b=4, p_pad=64, f=3):
    """Pow-2 padded rows (so the Pallas kernel tiles) with one EMPTY event."""
    counts = [9, 17, 0, 21]
    flat = np.concatenate(
        [rng.normal(size=(c, f)).astype(np.float32) for c in counts]
    )
    points = np.zeros((p_pad, f), np.float32)
    points[: len(flat)] = flat
    seg = np.full(p_pad, b, np.int32)
    seg[: len(flat)] = np.repeat(np.arange(b), counts)
    return {
        "points": jnp.asarray(points),
        "seg": jnp.asarray(seg),
        "y": jnp.zeros((b, 1)),
        "y_mask": jnp.ones(b),
    }


@pytest.mark.parametrize("pooling", ["mean", "sum"])
def test_postpool_applies_on_fused_pallas_path(monkeypatch, pooling):
    """fused_phi='on': the post-pool default passes HIDDEN-ONLY params to
    the kernel (one less matmul per tile) — forward and grads must match
    the per-point placement (PCC_PHI_POSTPOOL=0), empty event included."""
    model = DeepSets(
        3, [16, 16], [8], 1, "gelu",
        layer_norm=False, residual_block=True, pooling=pooling,
        fused_phi="on",
    )
    batch = _postpool_batch(np.random.default_rng(11))
    variables = model.init(jax.random.PRNGKey(3), batch, train=False)

    def run():
        out = model.apply(variables, batch, train=False)
        grads = jax.grad(
            lambda v: jnp.sum(model.apply(v, batch, train=False) ** 2)
        )(variables)
        return out, grads

    out_post, g_post = run()  # default: post-pool (hidden-only kernel)
    monkeypatch.setenv("PCC_PHI_POSTPOOL", "0")
    out_pp, g_pp = run()  # fully-fused kernel (final linear per point)
    np.testing.assert_allclose(
        np.asarray(out_post), np.asarray(out_pp), rtol=1e-5, atol=1e-6
    )
    for a, c in zip(jax.tree.leaves(g_post), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5
        )


def test_postpool_applies_on_int8_path(monkeypatch):
    """quant='int8' eval: post-pool runs the final linear per-event in f32
    (one less quantization).  Both placements must stay within the int8
    tolerance of the f32 oracle and of each other."""
    model = DeepSets(
        3, [16, 16], [8], 1, "gelu",
        layer_norm=False, residual_block=True, pooling="mean",
        quant="int8",
    )
    f32 = DeepSets(
        3, [16, 16], [8], 1, "gelu",
        layer_norm=False, residual_block=True, pooling="mean",
    )
    batch = _postpool_batch(np.random.default_rng(13))
    variables = f32.init(jax.random.PRNGKey(5), batch, train=False)
    want = np.asarray(f32.apply(variables, batch, train=False))

    out_post = np.asarray(model.apply(variables, batch, train=False))
    monkeypatch.setenv("PCC_PHI_POSTPOOL", "0")
    out_pp = np.asarray(model.apply(variables, batch, train=False))
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(out_post - want) / scale) < 5e-2
    assert np.max(np.abs(out_pp - want) / scale) < 5e-2


def test_init_cache_does_not_retain_wrapper():
    """_INIT_CACHE's jitted init must capture the Flax MODULE, not the
    wrapper: a lambda over `self` pinned the first wrapper per
    architecture (trained params, opt state, HBM window memo) in the
    module-level cache for the process lifetime (round-5 review
    finding)."""
    import gc
    import weakref

    from point_cloud_classifier_tpu.models import ModelWrapper
    from tests.test_parallel import _tabular_batch

    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[7, 5], batch_normalization=True, output_dim=1
    )  # unusual widths: guarantees a fresh _INIT_CACHE entry
    w = ModelWrapper(model, learning_rate=1e-2, epochs=1, seed=0)
    w._ensure_initialized(_tabular_batch(seed=0))
    ref = weakref.ref(w)
    del w
    gc.collect()
    assert ref() is None, "_INIT_CACHE retained the wrapper"


def test_fit_rebuilds_steps_after_direct_param_assignment():
    """fit() after assigning params directly (not via fit/load) must
    rebuild the step functions instead of calling a None _train_step —
    the guard _eval_dispatch always had (round-5 review finding)."""
    from point_cloud_classifier_tpu.models import ModelWrapper
    from tests.test_parallel import _tabular_batch

    batches = [_tabular_batch(seed=s) for s in range(2)]

    def mk():
        return ModelWrapper(
            FullyConnectedNet(
                input_dim=9, hidden_layers=[8], batch_normalization=True,
                output_dim=1,
            ),
            learning_rate=1e-2, epochs=1, seed=0,
        )

    src = mk()
    src.fit(batches)
    dst = mk()
    dst.params = src.params  # e.g. a converted/loaded checkpoint
    dst.batch_stats = src.batch_stats
    dst.fit(batches)  # was: TypeError ('NoneType' object is not callable)
    assert dst._train_step is not None and dst.opt_state is not None
