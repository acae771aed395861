"""Dense batched-adjacency graph layout vs the flat edge-list layout.

The two layouts must be exact drop-ins for each other: same parameter tree,
same logits (f32), same training artifacts. `data/batching.GraphLoader`
(layout="dense") + `GraphNet._dense_forward`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.data.batching import GraphLoader
from point_cloud_classifier_tpu.models import GraphNet


def _random_graphs(n_graphs=7, seed=0, f=4):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(3, 12))
        feats = rng.normal(size=(n, f)).astype(np.float32)
        # unique directed edge pairs (simple graph, like the lineage builder)
        pairs = {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(3 * n, 2))
            if a != b
        }
        pairs = sorted(pairs)
        edges = np.array(pairs, dtype=np.int32).T.reshape(2, -1)
        w = rng.uniform(0.1, 1.0, size=(edges.shape[1],)).astype(np.float32)
        graphs.append(
            {
                "features": feats,
                "edges": edges,
                "weights": w,
                "label": float(rng.integers(0, 2)),
            }
        )
    return graphs


def _loaders(graphs, adj_wire="device", **kw):
    flat = GraphLoader(graphs, batch_size=4, shuffle=False, layout="flat", **kw)
    dense = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="dense", adj_wire=adj_wire, **kw
    )
    return flat, dense


@pytest.mark.parametrize("adj_wire", ["host", "device"])
@pytest.mark.parametrize("local_pooling", ["add", "mean"])
@pytest.mark.parametrize("sag_pool", [False, True])
@pytest.mark.parametrize("deepchem_style", [False, True])
def test_dense_matches_flat_logits(local_pooling, sag_pool, deepchem_style, adj_wire):
    graphs = _random_graphs()
    flat, dense = _loaders(graphs, adj_wire=adj_wire, use_weights=True)
    model = GraphNet(
        input_dim=4,
        hidden_dim=16,
        output_dim=1,
        activation="tanh",
        local_pooling=local_pooling,
        sag_pool=sag_pool,
        deepchem_style=deepchem_style,
    )
    fb, db = next(iter(flat)), next(iter(dense))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    # identical parameter trees: init from either layout is interchangeable
    v2 = model.init(jax.random.PRNGKey(0), db, train=False)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(v2["params"])

    for fbatch, dbatch in zip(flat, dense):
        lf = model.apply(variables, fbatch, train=False)
        ld = model.apply(variables, dbatch, train=False)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ld), rtol=1e-5, atol=1e-5
        )


def test_dense_matches_flat_under_training_updates():
    from point_cloud_classifier_tpu.models import ModelWrapper

    graphs = _random_graphs(n_graphs=8, seed=3)

    def run(layout):
        loader = GraphLoader(
            graphs, batch_size=4, shuffle=False, layout=layout, use_weights=True
        )
        model = GraphNet(
            input_dim=4, hidden_dim=8, output_dim=1, activation="relu",
            local_pooling="add", deepchem_style=True,
        )
        w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0)
        w.fit(loader)
        return w

    a, b = run("flat"), run("dense")
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=2e-5
        )


def test_dense_auto_falls_back_for_oversized_batches():
    graphs = _random_graphs(n_graphs=4, seed=1)
    auto = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="auto", max_dense_bytes=64
    )
    batches = list(auto)
    # fell back to flat: no adjacency in any wire form
    assert all(
        "adj" not in b and "edge_slot" not in b and "in_src" not in b
        for b in batches
    )
    with pytest.raises(ValueError, match="max_dense_bytes"):
        list(
            GraphLoader(
                graphs, batch_size=4, shuffle=False, layout="dense", max_dense_bytes=64
            )
        )


def test_dense_rejects_max_aggregation():
    """max rides the in-row wire via per-slot one-hot einsums (round-3
    rewrite — no out-row mirror needed), so a plain dense batch RUNS,
    with or without SAG (round 4 keep-masks conv2's in-row weights).
    Only a dense batch WITHOUT the in-row wire (adj_wire="host") rejects.
    GAT runs dense regardless (its use of local_pooling is vacuous, like
    the reference's)."""
    graphs = _random_graphs(n_graphs=2, seed=2)
    dense = GraphLoader(graphs, batch_size=2, shuffle=False, layout="dense")
    batch = next(iter(dense))  # no out rows
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="max",
    )
    model.init(jax.random.PRNGKey(0), batch, train=False)  # fine since r3
    # SAG+max rides dense too since round 4
    sag_max = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="max", sag_pool=True,
    )
    sag_max.init(jax.random.PRNGKey(0), batch, train=False)  # fine since r4
    # ... but the host-adjacency wire has no in-row lists to max over
    host = next(iter(GraphLoader(
        graphs, batch_size=2, shuffle=False, layout="dense", adj_wire="host"
    )))
    with pytest.raises(ValueError, match="dense graph layout"):
        model.init(jax.random.PRNGKey(0), host, train=False)
    gat_max = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="max", use_gat=True,
    )
    gat_max.init(jax.random.PRNGKey(0), batch, train=False)  # fine


@pytest.mark.parametrize("sag_pool", [False, True])
@pytest.mark.parametrize("use_weights", [False, True])
def test_inrow_max_matches_flat(use_weights, sag_pool):
    """Dense in-row max (ops/inrow_graph.inrow_max_aggregate) == flat
    segment_max, logits and training updates; sag_pool=True covers the
    round-4 keep-masked conv2 weights (the broadcast-compare keep[src]
    composition) against the flat path's edge filtering."""
    from point_cloud_classifier_tpu.models import ModelWrapper

    graphs = _random_graphs(n_graphs=8, seed=13)
    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="tanh",
        local_pooling="max", deepchem_style=True, sag_pool=sag_pool,
    )
    flat = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="flat", use_weights=use_weights
    )
    dense = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="dense",
        use_weights=use_weights, emit_out_rows=True,
    )
    fb = next(iter(flat))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    for fbatch, dbatch in zip(flat, dense):
        lf = model.apply(variables, fbatch, train=False)
        ld = model.apply(variables, dbatch, train=False)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ld), rtol=1e-5, atol=1e-5
        )

    def run(layout, **kw):
        loader = GraphLoader(
            graphs, batch_size=4, shuffle=False, layout=layout,
            use_weights=use_weights, **kw
        )
        w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0)
        w.fit(loader)
        return w

    a = run("flat")
    b = run("dense", emit_out_rows=True)
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=2e-5
        )


def test_use_weights_false_dense_adjacency_is_binary():
    graphs = _random_graphs(n_graphs=3, seed=4)
    dense = GraphLoader(
        graphs,
        batch_size=3,
        shuffle=False,
        layout="dense",
        adj_wire="host",
        use_weights=False,
    )
    batch = next(iter(dense))
    vals = np.unique(batch["adj"])
    assert set(vals.tolist()) <= {0.0, 1.0}
    wire = GraphLoader(
        graphs, batch_size=3, shuffle=False, layout="dense", use_weights=False
    )
    assert set(np.unique(next(iter(wire))["in_w"]).tolist()) <= {0.0, 1.0}


def _rebuild_adjacency(dev_b, shape):
    """Numpy re-implementation of the model's on-device adjacency build."""
    adj = np.zeros(shape, np.float32)
    if "in_src" in dev_b:
        b, m, d = dev_b["in_src"].shape
        in_src = dev_b["in_src"].astype(np.int64)
        in_w = dev_b["in_w"].astype(np.float32)
        for di in range(d):
            rows = np.arange(m)[None, :].repeat(b, axis=0)
            slots = np.arange(b)[:, None].repeat(m, axis=1)
            np.add.at(adj, (slots, rows, in_src[:, :, di]), in_w[:, :, di])
    else:
        live = dev_b["edge_slot"].astype(np.int64) < shape[0]
        np.add.at(
            adj,
            (
                dev_b["edge_slot"].astype(np.int64)[live],
                dev_b["edge_dst"].astype(np.int64)[live],
                dev_b["edge_src"].astype(np.int64)[live],
            ),
            dev_b["edge_w"].astype(np.float32)[live],
        )
    return adj


@pytest.mark.parametrize("max_in_degree_wire", [32, 0])
def test_device_wire_adjacency_matches_host_adjacency(max_in_degree_wire):
    """Both device wires (in-row / triple fallback) rebuild the host adj."""
    graphs = _random_graphs(n_graphs=6, seed=5)
    mk = lambda wire: GraphLoader(
        graphs,
        batch_size=3,
        shuffle=False,
        layout="dense",
        adj_wire=wire,
        max_in_degree_wire=max_in_degree_wire,
    )
    saw = set()
    for host_b, dev_b in zip(mk("host"), mk("device")):
        saw |= {"in_src", "edge_slot"} & set(dev_b)
        adj = _rebuild_adjacency(dev_b, host_b["adj"].shape)
        np.testing.assert_array_equal(adj, host_b["adj"])
        np.testing.assert_array_equal(dev_b["nodes"], host_b["nodes"])
        np.testing.assert_array_equal(dev_b["node_mask"], host_b["node_mask"])
    # max_in_degree_wire=0 forces the triple fallback; 32 keeps in-row
    assert saw == ({"in_src"} if max_in_degree_wire else {"edge_slot"})


def test_dense_dp_matches_single_device():
    """Dense-layout training under a data mesh == single-device, bit-for-bit."""
    from point_cloud_classifier_tpu.models import ModelWrapper
    from point_cloud_classifier_tpu.parallel import make_mesh

    graphs = _random_graphs(n_graphs=8, seed=7)

    def run(mesh):
        loader = GraphLoader(graphs, batch_size=8, shuffle=False, layout="dense")
        model = GraphNet(
            input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
            local_pooling="mean", deepchem_style=True,
        )
        w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0, mesh=mesh)
        w.fit(loader)
        return w

    a, b = run(None), run(make_mesh())
    # psum's per-shard-then-cross-shard reduction can reorder float adds vs
    # the single-device reduce, so equality is to accumulation noise
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-6
        )


def test_length_sorted_batches_similar_sizes():
    """length_sorted groups similar-size graphs; every graph still trains once."""
    rng = np.random.default_rng(11)
    graphs = []
    for i in range(32):
        n = int(rng.integers(3, 100))
        graphs.append(
            {
                "features": rng.normal(size=(n, 4)).astype(np.float32),
                "edges": np.array([[0], [min(1, n - 1)]], dtype=np.int32),
                "weights": np.ones(1, np.float32),
                "label": float(i % 2),
            }
        )
    loader = GraphLoader(
        graphs, batch_size=8, shuffle=True, layout="dense", length_sorted=True, seed=0
    )
    sizes = np.array([len(g["features"]) for g in graphs])
    batches = list(loader)
    total = sum(int(b["y_mask"].sum()) for b in batches)
    assert total == len(graphs)
    # each batch's node dim is the bucket of ITS largest graph: with sorted
    # batching the smallest batch's M must undercut the global bucket
    ms = sorted(b["nodes"].shape[1] for b in batches)
    from point_cloud_classifier_tpu.data.batching import pow2_bucket

    assert ms[0] < pow2_bucket(int(sizes.max()), 64)
    # batch order reshuffles across epochs while membership stays size-sorted
    again = list(loader)
    assert [b["nodes"].shape[1] for b in again] != [
        b["nodes"].shape[1] for b in batches
    ] or len(batches) <= 2


def test_triple_fallback_wire_matches_flat_logits():
    """The scatter-wire fallback (in-degree outliers) gives the same logits."""
    graphs = _random_graphs(n_graphs=8, seed=6)
    flat = GraphLoader(graphs, batch_size=4, shuffle=False, layout="flat")
    wire = GraphLoader(
        graphs,
        batch_size=4,
        shuffle=False,
        layout="dense",
        max_in_degree_wire=0,
    )
    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="tanh",
        local_pooling="add", deepchem_style=True,
    )
    fb = next(iter(flat))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    for fbatch, dbatch in zip(flat, wire):
        assert "edge_slot" in dbatch and "in_src" not in dbatch
        lf = model.apply(variables, fbatch, train=False)
        ld = model.apply(variables, dbatch, train=False)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ld), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sag_pool", [False, True])
@pytest.mark.parametrize("deepchem_style", [False, True])
def test_dense_gat_matches_flat_logits(sag_pool, deepchem_style):
    """GATv1's factorised dense attention == the flat segment softmax."""
    graphs = _random_graphs(n_graphs=8, seed=8)
    # torch_geometric's GATConv rejects edge weights outright; the GAT
    # configs therefore run unweighted (matching the reference's options)
    flat = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="flat", use_weights=False
    )
    dense = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="dense", use_weights=False
    )
    model = GraphNet(
        input_dim=4,
        hidden_dim=16,
        output_dim=1,
        activation="tanh",
        use_gat=True,
        gat_heads=4,
        sag_pool=sag_pool,
        deepchem_style=deepchem_style,
    )
    fb, db = next(iter(flat)), next(iter(dense))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    v2 = model.init(jax.random.PRNGKey(0), db, train=False)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(v2["params"])
    for fbatch, dbatch in zip(flat, dense):
        lf = model.apply(variables, fbatch, train=False)
        ld = model.apply(variables, dbatch, train=False)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ld), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("sag_pool", [False, True])
def test_dense_gat_training_matches_flat(sag_pool):
    """sag_pool=True covers the inrow_gat+SAG path end-to-end: conv2 runs
    the in-row attention on keep-masked weights (gradients flow through
    the broadcast-compare keep[src] masking — the round-3 rewrite that
    replaced the take_along_axis gather), which must train identically to
    the flat segment-softmax arm."""
    from point_cloud_classifier_tpu.models import ModelWrapper

    graphs = _random_graphs(n_graphs=8, seed=9)

    def run(layout):
        loader = GraphLoader(
            graphs, batch_size=4, shuffle=False, layout=layout, use_weights=False
        )
        model = GraphNet(
            input_dim=4, hidden_dim=8, output_dim=1, activation="relu",
            use_gat=True, gat_heads=2, deepchem_style=True, sag_pool=sag_pool,
        )
        w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0)
        w.fit(loader)
        return w

    a, b = run("flat"), run("dense")
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-3, atol=2e-4
        )


def test_duplicate_edges_match_flat_for_unweighted_add():
    """A duplicated directed edge must contribute its occurrence count in
    every layout under use_weights=False (the flat scatter adds 1.0 per
    occurrence; the dense merge carries multiplicity instead)."""
    graphs = [
        {
            "features": np.eye(3, 4, dtype=np.float32),
            # edge 0->1 twice plus 2->1: node 1's unweighted aggregate is 3
            "edges": np.array([[0, 0, 2], [1, 1, 1]], dtype=np.int32),
            "weights": np.array([0.3, 0.4, 0.5], dtype=np.float32),
            "label": 1.0,
        }
    ]
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="add", deepchem_style=True,
    )
    mk = lambda layout, **kw: next(
        iter(
            GraphLoader(
                graphs, batch_size=1, shuffle=False, layout=layout,
                use_weights=False, **kw
            )
        )
    )
    fb = mk("flat")
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    lf = np.asarray(model.apply(variables, fb, train=False))
    for batch in (mk("dense"), mk("dense", adj_wire="host"),
                  mk("dense", max_in_degree_wire=0)):
        ld = np.asarray(model.apply(variables, batch, train=False))
        np.testing.assert_allclose(lf, ld, rtol=1e-5, atol=1e-6)
    # and the host adjacency itself carries the multiplicity
    host = mk("dense", adj_wire="host")
    assert host["adj"][0, 1, 0] == 2.0 and host["adj"][0, 1, 2] == 1.0


_MULTIGRAPHS = [
    {
        "features": np.eye(3, 4, dtype=np.float32),
        # edge 0->1 twice plus 2->1: node 1 has per-occurrence in-degree 3
        "edges": np.array([[0, 0, 2], [1, 1, 1]], dtype=np.int32),
        "weights": np.array([0.3, 0.4, 0.5], dtype=np.float32),
        "label": 1.0,
    }
]


@pytest.mark.parametrize("use_weights", [False, True])
@pytest.mark.parametrize("local_pooling", ["add", "mean", "max"])
def test_auto_layout_flat_fallback_preserves_multiplicity(
    use_weights, local_pooling
):
    """ADVICE r1 + code-review r2: a layout='auto' batch that falls back to
    the flat wire rides the duplicate-MERGED edge store, so it must ship
    edge_w = merged_w/mult (1.0 unweighted) with edge_mask = multiplicity —
    restoring per-occurrence sums AND mean denominators AND unweighted max
    (the earlier mult-as-weight fix kept sums exact but still divided means
    by the unique-edge count)."""
    if use_weights and local_pooling == "max":
        pytest.skip("weighted multigraph max is the documented divergence")
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling=local_pooling, deepchem_style=True,
    )
    pure_flat = next(iter(GraphLoader(
        _MULTIGRAPHS, batch_size=1, shuffle=False, layout="flat",
        use_weights=use_weights,
    )))
    # max_dense_bytes=1 forces every auto batch onto the flat fallback wire
    fallback = next(iter(GraphLoader(
        _MULTIGRAPHS, batch_size=1, shuffle=False, layout="auto",
        use_weights=use_weights, max_dense_bytes=1,
    )))
    assert "adj" not in fallback and "in_src" not in fallback
    # the duplicated 0->1 edge rides the wire once, multiplicity 2 on the
    # mask; the model's message weight is the product edge_w * edge_mask
    mask = np.asarray(fallback["edge_mask"])
    assert sorted(mask[mask > 0]) == [1.0, 2.0]
    if not use_weights:
        # message weight = edge_w * edge_mask = the occurrence count
        prod = np.asarray(fallback["edge_w"]) * mask
        assert sorted(prod[mask > 0]) == [1.0, 2.0]
    variables = model.init(jax.random.PRNGKey(0), pure_flat, train=False)
    lf = np.asarray(model.apply(variables, pure_flat, train=False))
    lb = np.asarray(model.apply(variables, fallback, train=False))
    np.testing.assert_allclose(lf, lb, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_weights", [False, True])
@pytest.mark.parametrize("adj_wire", ["host", "device"])
def test_dense_mean_matches_flat_on_multigraph(use_weights, adj_wire):
    """ADVICE r1: dense mean divides by the wire's exact per-occurrence
    in-degree (``in_deg``), so duplicate-merged edges keep flat parity."""
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="mean", deepchem_style=True,
    )
    mk = lambda layout, **kw: next(iter(GraphLoader(
        _MULTIGRAPHS, batch_size=1, shuffle=False, layout=layout,
        use_weights=use_weights, **kw
    )))
    fb = mk("flat")
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    lf = np.asarray(model.apply(variables, fb, train=False))
    db = mk("dense", adj_wire=adj_wire)
    assert np.asarray(db["in_deg"])[0, 1] == 3.0
    ld = np.asarray(model.apply(variables, db, train=False))
    np.testing.assert_allclose(lf, ld, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("deepchem_style", [False, True])
def test_inrow_gat_matches_flat_logits(deepchem_style):
    """In-row GAT (flash-attention over the in-row wire, no [B, M, M]
    logit matrix) must equal the flat segment-softmax GAT exactly."""
    import point_cloud_classifier_tpu.ops.gat_pallas as gp

    graphs = _random_graphs(n_graphs=6, seed=11)
    flat = GraphLoader(graphs, batch_size=3, shuffle=False, layout="flat")
    dense = GraphLoader(graphs, batch_size=3, shuffle=False, layout="dense")
    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="tanh",
        use_gat=True, gat_heads=4, deepchem_style=deepchem_style,
    )
    fb = next(iter(flat))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    calls = {"n": 0}
    real = gp.gat_attention

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    gp.gat_attention = spy
    try:
        for fbatch, dbatch in zip(flat, dense):
            assert "in_src" in dbatch and "adj" not in dbatch
            lf = model.apply(variables, fbatch, train=False)
            ld = model.apply(variables, dbatch, train=False)
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(ld), rtol=1e-5, atol=1e-5
            )
    finally:
        gp.gat_attention = real
    assert calls["n"] > 0, "in-row GAT path never engaged"


def test_inrow_gat_training_matches_flat():
    """Gradients through the in-row attention must match the flat path's
    segment-op autodiff (one fit, parameter-level parity)."""
    from point_cloud_classifier_tpu.models import ModelWrapper

    graphs = _random_graphs(n_graphs=8, seed=12)

    def run(layout, **kw):
        loader = GraphLoader(graphs, batch_size=4, shuffle=False, layout=layout, **kw)
        model = GraphNet(
            input_dim=4, hidden_dim=16, output_dim=1, activation="relu",
            use_gat=True, gat_heads=2, deepchem_style=True,
        )
        w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0)
        w.fit(loader)
        return w

    a = run("flat")
    b = run("dense")
    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=2e-5
        )


def test_dense_mean_counts_zero_weight_edges_like_flat():
    """A w==0 edge (e.g. fp16-underflowed gaussian weight) is invisible in
    the adjacency but must still count in the mean denominator, exactly as
    the flat path's segment_count does."""
    graphs = [
        {
            "features": np.eye(3, 4, dtype=np.float32),
            "edges": np.array([[0, 2], [1, 1]], dtype=np.int32),
            "weights": np.array([0.0, 0.5], dtype=np.float32),
            "label": 0.0,
        }
    ]
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="mean", deepchem_style=True,
    )
    mk = lambda layout, **kw: next(iter(GraphLoader(
        graphs, batch_size=1, shuffle=False, layout=layout,
        use_weights=True, **kw
    )))
    fb = mk("flat")
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    lf = np.asarray(model.apply(variables, fb, train=False))
    for db in (mk("dense"), mk("dense", adj_wire="host")):
        assert np.asarray(db["in_deg"])[0, 1] == 2.0
        ld = np.asarray(model.apply(variables, db, train=False))
        np.testing.assert_allclose(lf, ld, rtol=1e-5, atol=1e-6)


def test_dense_node_bucketing_rides_the_rung_ladder():
    """m_pad is the k*2^j rung of the batch max (>= min_dense_nodes), not
    the pow2 bucket — padding M costs quadratically in the dense step."""
    rng = np.random.default_rng(0)
    graphs = []
    for n in (250, 260, 255, 258):  # pow2 would pad all to 512
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        edges = np.array([[0, 1], [1, 0]], dtype=np.int32).T.reshape(2, -1)
        graphs.append(
            {
                "features": feats,
                "edges": edges,
                "weights": np.ones((2,), np.float32),
                "label": 1.0,
            }
        )
    loader = GraphLoader(graphs, batch_size=4, shuffle=False, layout="dense")
    (batch,) = list(loader)
    m = batch["nodes"].shape[1]
    assert m == 288, m  # _dense_rung(260) = 9*32; pow2 would give 512


def test_dense_node_bucketing_stays_8_aligned():
    """An unaligned min_dense_nodes (or a j<3 rung, 9..15) must still give
    an 8-aligned m_pad — the GAT Pallas kernels require M % 8 == 0
    (ops/gat_pallas._shapes_ok) and an unaligned M would silently gate
    every batch off the kernel."""
    rng = np.random.default_rng(1)
    graphs = []
    for n in (10, 12, 9, 11):
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        edges = np.array([[0, 1], [1, 0]], dtype=np.int32).T.reshape(2, -1)
        graphs.append(
            {
                "features": feats,
                "edges": edges,
                "weights": np.ones((2,), np.float32),
                "label": 0.0,
            }
        )
    loader = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="dense", min_dense_nodes=60
    )
    (batch,) = list(loader)
    m = batch["nodes"].shape[1]
    assert m % 8 == 0, m  # min_dense_nodes=60 rounds up to 64
    assert m == 64, m


def test_graph_remat_knob_keeps_grads_and_stats_exact(monkeypatch):
    """PCC_GRAPH_REMAT=1 (opt-in deepchem-head rematerialisation — a
    measured throughput negative kept for memory-tight regimes, see
    models/graph_net.py) must be numerically invisible: identical loss,
    grads, and batch_stats updates vs the inline head."""
    import bench
    import jax.numpy as jnp

    wire = bench._graph_batch_dense_inrow(4, 256, 512, 4)
    batch = {k: jnp.asarray(v) for k, v in wire.items()}

    def run(knob):
        monkeypatch.setenv("PCC_GRAPH_REMAT", knob)
        model = GraphNet(
            input_dim=4, hidden_dim=16, output_dim=1, activation="tanh",
            deepchem_style=True, compute_dtype="float32",
        )
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(out), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        return loss, grads, upd

    l0, g0, u0 = run("0")
    l1, g1, u1 = run("1")
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(u0), jax.tree_util.tree_leaves(u1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("sag_pool", [False, True])
def test_weighted_gat_rides_dense_when_no_zero_weights(sag_pool):
    """GAT + use_weights on strictly-positive weights (real lineage data)
    now keeps the dense layout: flat GAT ignores the weight VALUES (GATv1
    takes none) and dense GAT only gates existence on w != 0, so with no
    exact-zero wire weight the two layouts are equivalent — the factory
    previously kept every such config flat (~40x slower attention)."""
    graphs = _random_graphs(n_graphs=8, seed=11)  # weights in [0.1, 1.0]
    flat = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="flat", use_weights=True
    )
    dense = GraphLoader(
        graphs, batch_size=4, shuffle=False, layout="dense",
        use_weights=True, dense_w_is_existence=True,
    )
    assert dense.layout == "dense"  # no zero weights -> no demotion
    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="tanh",
        use_gat=True, gat_heads=4, sag_pool=sag_pool,
    )
    fb = next(iter(flat))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    for fbatch, dbatch in zip(flat, dense):
        lf = model.apply(variables, fbatch, train=False)
        ld = model.apply(variables, dbatch, train=False)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(ld), rtol=1e-4, atol=1e-5
        )


def test_weighted_gat_demotes_to_flat_on_exact_zero_weight():
    """An exact-zero wire weight means dense attention would DROP that
    edge (existence is w != 0) while the flat path keeps it — the loader
    must demote itself to flat, and the demoted batches must match a
    pure-flat loader exactly."""
    graphs = _random_graphs(n_graphs=6, seed=12)
    graphs[2]["weights"][0] = 0.0  # the hazard: a real but zero-weight edge
    with pytest.warns(UserWarning, match="demoting layout to 'flat'"):
        demoted = GraphLoader(
            graphs, batch_size=3, shuffle=False, layout="auto",
            use_weights=True, dense_w_is_existence=True,
        )
    assert demoted.layout == "flat"
    flat = GraphLoader(
        graphs, batch_size=3, shuffle=False, layout="flat", use_weights=True
    )
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        use_gat=True, gat_heads=2,
    )
    fb = next(iter(flat))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    for fbatch, dbatch in zip(flat, demoted):
        lf = model.apply(variables, fbatch, train=False)
        ld = model.apply(variables, dbatch, train=False)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ld))


def test_factory_routes_weighted_gat_to_auto_dense(tmp_path, monkeypatch):
    """get_dataloader: GAT + use_weights configs now get layout='auto'
    with the loader-side zero-weight existence check enabled, instead of
    the old unconditional flat demotion.  (The cache-backed end-to-end
    variant is test_orchestration.test_graph_layout_eligibility_sees_model_config;
    this one pins the factory wiring without touching the filesystem.)"""
    import point_cloud_classifier_tpu.factory as factory_mod

    seen = {}

    class _SpyDS:
        def __init__(self, **kwargs):
            seen.update(kwargs)

    monkeypatch.setattr(factory_mod, "Step2PointGraph", _SpyDS)
    config = {
        "dataset": {"data_dir": str(tmp_path), "use_weights": True},
        "model": {"use_gat": True},
    }
    factory_mod.get_dataloader("s2pg", config)
    assert seen["graph_layout"] == "auto"
    assert seen["dense_w_is_existence"] is True


@pytest.mark.parametrize("layout", ["dense", "auto"])
def test_factory_zero_weight_gate_survives_explicit_layout(
    tmp_path, monkeypatch, layout
):
    """The dense_w_is_existence safety gate must apply even when the config
    pins graph_layout explicitly — an explicit `graph_layout: dense` with
    GAT + use_weights previously skipped the gate entirely, so an
    exact-zero wire weight would silently drop an edge dense-side."""
    import point_cloud_classifier_tpu.factory as factory_mod

    seen = {}

    class _SpyDS:
        def __init__(self, **kwargs):
            seen.update(kwargs)

    monkeypatch.setattr(factory_mod, "Step2PointGraph", _SpyDS)
    config = {
        "dataset": {
            "data_dir": str(tmp_path),
            "use_weights": True,
            "graph_layout": layout,
        },
        "model": {"use_gat": True},
    }
    factory_mod.get_dataloader("s2pg", config)
    assert seen["graph_layout"] == layout
    assert seen["dense_w_is_existence"] is True

    # explicit flat needs no gate (flat GAT ignores weight values)
    seen.clear()
    config["dataset"]["graph_layout"] = "flat"
    factory_mod.get_dataloader("s2pg", config)
    assert "dense_w_is_existence" not in seen

def test_require_inrow_routes_outlier_batches_to_flat():
    """Under require_inrow (the factory's dense-max gate) a batch whose
    in-degree overflows max_in_degree_wire ships the flat GLOBAL wire —
    which the model's flat path consumes exactly — instead of the
    edge_slot fallback triples that the dense max path rejects with a
    mid-epoch ValueError."""
    graphs = _random_graphs(n_graphs=8, seed=21)
    # graph 2 gets one node with in-degree 40 > max_in_degree_wire (32)
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(48, 4)).astype(np.float32)
    srcs = np.arange(1, 41, dtype=np.int32)
    graphs[2] = {
        "features": feats,
        "edges": np.stack([srcs, np.zeros_like(srcs)]),
        "weights": np.full(40, 0.5, np.float32),
        "label": 1.0,
    }
    with pytest.warns(UserWarning, match="require_inrow"):
        loader = GraphLoader(
            graphs, batch_size=4, shuffle=False, layout="auto",
            require_inrow=True, emit_out_rows=True,
        )
        batches = list(loader)
    assert len(batches) == 2
    # the outlier batch (graphs 0-3) went flat; the other stays dense
    assert "in_src" not in batches[0] and "edge_slot" not in batches[0]
    assert "src" in batches[0]
    assert "in_src" in batches[1] and "out_dst" in batches[1]

    # GraphNet(max) consumes the mixed epoch, matching a pure-flat loader
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="max",
    )
    flat = GraphLoader(graphs, batch_size=4, shuffle=False, layout="flat")
    fb = next(iter(flat))
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    for fbatch, mbatch in zip(flat, batches):
        lf = model.apply(variables, fbatch, train=False)
        lm = model.apply(variables, mbatch, train=False)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lm), rtol=1e-5, atol=1e-5
        )


def test_require_inrow_gates_missing_out_rows():
    """require_inrow + emit_out_rows also guards the OUT-degree cap: a
    batch whose out-degree overflows (in-degree fine) must go flat rather
    than ship in_src without out rows (which dense max rejects)."""
    graphs = _random_graphs(n_graphs=4, seed=22)
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(48, 4)).astype(np.float32)
    dsts = np.arange(1, 41, dtype=np.int32)  # node 0 out-degree 40
    graphs[1] = {
        "features": feats,
        "edges": np.stack([np.zeros_like(dsts), dsts]),
        "weights": np.full(40, 0.5, np.float32),
        "label": 0.0,
    }
    with pytest.warns(UserWarning, match="require_inrow"):
        loader = GraphLoader(
            graphs, batch_size=4, shuffle=False, layout="dense",
            require_inrow=True, emit_out_rows=True,
        )
        batches = list(loader)
    assert len(batches) == 1
    assert "in_src" not in batches[0] and "src" in batches[0]


def test_require_inrow_host_wire_demotes_to_flat():
    graphs = _random_graphs(n_graphs=4, seed=23)
    with pytest.warns(UserWarning, match="host adjacency"):
        loader = GraphLoader(
            graphs, batch_size=4, shuffle=False, layout="dense",
            adj_wire="host", require_inrow=True,
        )
    assert loader.layout == "flat"


def test_factory_dense_max_sets_inrow_gates(tmp_path, monkeypatch):
    """Max-pooling configs get require_inrow defaulted by the factory on
    both pinned and default-routed layouts (the dense max path needs the
    in-row wire; edge-triple / degree-outlier batches must ride flat),
    incl. the round-4 SAG+max dense routing."""
    import point_cloud_classifier_tpu.factory as factory_mod

    seen = {}

    class _SpyDS:
        def __init__(self, **kwargs):
            seen.update(kwargs)

    monkeypatch.setattr(factory_mod, "Step2PointGraph", _SpyDS)
    config = {
        "dataset": {"data_dir": str(tmp_path), "graph_layout": "dense"},
        "model": {"local_pooling": "max"},
    }
    factory_mod.get_dataloader("s2pg", config)
    assert seen["require_inrow"] is True
    # the one-hot-einsum max (round 3) needs no out-row mirror
    assert "emit_out_rows" not in seen

    # default routing also rides dense since round 3 (129.7k vs 24.4k
    # flat), with the same edge-triple fallback gate
    seen.clear()
    factory_mod.get_dataloader(
        "s2pg",
        {"dataset": {"data_dir": str(tmp_path)}, "model": {"local_pooling": "max"}},
    )
    assert seen["graph_layout"] == "auto"
    assert seen["require_inrow"] is True

    # SAG+max rides dense too since round 4 (keep-masked in-row weights)
    seen.clear()
    factory_mod.get_dataloader(
        "s2pg",
        {
            "dataset": {"data_dir": str(tmp_path)},
            "model": {"local_pooling": "max", "sag_pool": True},
        },
    )
    assert seen["graph_layout"] == "auto"
    assert seen["require_inrow"] is True

    # ... and the EXPLICIT-layout gate covers SAG+max as well (the old
    # `not sag_pool` exclusion predated round-4's SAG+max dense routing
    # and left pinned dense/auto SAG+max configs crashable on a
    # degree-outlier edge-triple batch — round-5 review finding)
    seen.clear()
    factory_mod.get_dataloader(
        "s2pg",
        {
            "dataset": {"data_dir": str(tmp_path), "graph_layout": "auto"},
            "model": {"local_pooling": "max", "sag_pool": True},
        },
    )
    assert seen["require_inrow"] is True

    # GAT ignores local_pooling — no max gates
    seen.clear()
    factory_mod.get_dataloader(
        "s2pg",
        {
            "dataset": {"data_dir": str(tmp_path), "graph_layout": "auto"},
            "model": {"local_pooling": "max", "use_gat": True},
        },
    )
    assert "require_inrow" not in seen

    # weighted GAT still gets the zero-weight existence gate exactly once
    # (the defaulted-layout duplicate setdefault was removed round 5 —
    # the explicit gate's `!= "flat"` check covers the absent-key case)
    seen.clear()
    factory_mod.get_dataloader(
        "s2pg",
        {"dataset": {"data_dir": str(tmp_path)}, "model": {"use_gat": True}},
    )
    assert seen["dense_w_is_existence"] is True
    assert seen["graph_layout"] == "auto"


def test_factory_fused_inrow_gate_survives_explicit_layout(tmp_path, monkeypatch):
    """model.fused_inrow needs the out-row wire even when the config pins
    graph_layout explicitly (same bypass class as dense_w_is_existence)."""
    import point_cloud_classifier_tpu.factory as factory_mod

    seen = {}

    class _SpyDS:
        def __init__(self, **kwargs):
            seen.update(kwargs)

    monkeypatch.setattr(factory_mod, "Step2PointGraph", _SpyDS)
    factory_mod.get_dataloader(
        "s2pg",
        {
            "dataset": {"data_dir": str(tmp_path), "graph_layout": "dense"},
            "model": {"fused_inrow": True},
        },
    )
    assert seen["emit_out_rows"] is True


def test_flat_gatconv_returns_compute_dtype():
    """Flat-wire GATConv must cast its f32 segment-sum output back to the
    compute dtype — returning f32 silently de-bf16'd every downstream
    layer of a bfloat16 config (the in-row and adj_mask branches cast)."""
    from point_cloud_classifier_tpu.models.graph_net import GATConv

    rng = np.random.default_rng(0)
    n, e = 6, 10
    x = jnp.asarray(rng.normal(size=(n, 8)), dtype=jnp.bfloat16)
    src = jnp.asarray(rng.integers(0, n, e), dtype=jnp.int32)
    dst = jnp.asarray(rng.integers(0, n, e), dtype=jnp.int32)
    ev = jnp.ones((e,), jnp.float32)
    nv = jnp.ones((n,), jnp.float32)
    conv = GATConv(4, 2)
    vs = conv.init(jax.random.PRNGKey(0), x, src, dst, ev, nv)
    out = conv.apply(vs, x, src, dst, ev, nv)
    assert out.dtype == jnp.bfloat16


def test_dense_sag_topk_exact_above_256_nodes_bf16():
    """Round-5 review: dense SAGPool's count/rank arithmetic must run in
    f32/int32 even when the compute dtype is bf16 — a bf16 sum cannot
    represent odd node counts above 256 and `ranks < kk` rounded the
    int32 ranks once they promoted to bf16, silently diverging the keep
    set from the flat path for >256-node graphs (M rungs run to 512)."""
    rng = np.random.default_rng(0)
    n = 301  # odd, > 256: unrepresentable as a bf16 integer
    e = 600
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    graphs = [{
        "features": rng.normal(size=(n, 4)).astype(np.float32),
        "edges": np.stack([src, dst]),
        "weights": np.ones(e, dtype=np.float32),
        "label": 1.0,
    }]
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        sag_pool=True, pool_ratio=0.5, deepchem_style=True,
        compute_dtype="bfloat16",
    )
    mk = lambda layout: next(iter(GraphLoader(
        graphs, batch_size=1, shuffle=False, layout=layout,
        use_weights=False,
    )))
    fb, db = mk("flat"), mk("dense")
    variables = model.init(jax.random.PRNGKey(0), fb, train=False)
    lf = np.asarray(model.apply(variables, fb, train=False))
    ld = np.asarray(model.apply(variables, db, train=False))
    np.testing.assert_allclose(lf, ld, rtol=2e-2, atol=2e-2)
    # the sharp check, through the MODEL: the dense keep COUNT must be
    # ceil(0.5 * 301) = 151 exactly — the bf16 arithmetic summed 301
    # mask ones to 300 and kept 150 (a one-node keep-set divergence the
    # logit tolerance above can hide)
    _, inter = model.apply(
        variables, db, train=False, capture_intermediates=True
    )
    # walk the intermediates pytree for the SAGPool output tuple (x, keep)
    flat_inter = jax.tree_util.tree_leaves_with_path(inter["intermediates"])
    keep_leaves = [
        np.asarray(leaf)
        for path, leaf in flat_inter
        if "SAGPool" in "/".join(str(p) for p in path)
        and np.asarray(leaf).shape == (1, db["node_mask"].shape[1])
    ]
    assert keep_leaves, "SAGPool keep intermediate not captured"
    assert int(keep_leaves[0].astype(np.float32).sum()) == 151


def test_multigraph_demotes_gat_sag_dense_to_flat():
    """Round-5 review: dense attention terms and the SAG score conv count
    a duplicate-MERGED edge once where the flat path counts each
    occurrence — with factory-set flat_if_multigraph the loader demotes a
    multigraph store to flat (exact semantics), while simple graphs keep
    the dense layout."""
    dup_graphs = [{
        "features": np.eye(3, 4, dtype=np.float32),
        "edges": np.array([[0, 0, 2], [1, 1, 1]], dtype=np.int32),
        "weights": np.array([0.3, 0.4, 0.5], dtype=np.float32),
        "label": 1.0,
    }]
    simple_graphs = [{
        "features": np.eye(3, 4, dtype=np.float32),
        "edges": np.array([[0, 2], [1, 1]], dtype=np.int32),
        "weights": np.array([0.3, 0.5], dtype=np.float32),
        "label": 1.0,
    }]
    with pytest.warns(UserWarning, match="duplicate"):
        dup = GraphLoader(
            dup_graphs, batch_size=1, shuffle=False, layout="auto",
            use_weights=False, flat_if_multigraph=True,
        )
    assert dup.layout == "flat"
    # the demoted-flat batches ride the per-occurrence fallback wires
    b = next(iter(dup))
    assert "adj" not in b and "in_src" not in b
    assert b["edge_mask"].max() == 2.0
    simple = GraphLoader(
        simple_graphs, batch_size=1, shuffle=False, layout="auto",
        use_weights=False, flat_if_multigraph=True,
    )
    assert simple.layout == "auto"  # no duplicate: dense stays

    # factory wires the flag for GAT / SAG configs on non-flat layouts
    import point_cloud_classifier_tpu.factory as factory_mod
    seen = {}

    class _SpyDS:
        def __init__(self, **kwargs):
            seen.update(kwargs)

    import tempfile
    monkey_orig = factory_mod.Step2PointGraph
    factory_mod.Step2PointGraph = _SpyDS
    try:
        with tempfile.TemporaryDirectory() as td:
            factory_mod.get_dataloader(
                "s2pg",
                {"dataset": {"data_dir": td}, "model": {"use_gat": True}},
            )
            assert seen["flat_if_multigraph"] is True
            seen.clear()
            factory_mod.get_dataloader(
                "s2pg",
                {"dataset": {"data_dir": td}, "model": {"sag_pool": True}},
            )
            assert seen["flat_if_multigraph"] is True
            seen.clear()
            factory_mod.get_dataloader(
                "s2pg",
                {"dataset": {"data_dir": td, "graph_layout": "flat"},
                 "model": {"use_gat": True}},
            )
            assert "flat_if_multigraph" not in seen
    finally:
        factory_mod.Step2PointGraph = monkey_orig
