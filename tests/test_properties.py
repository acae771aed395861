"""Property-based tests (hypothesis): loaders and segment ops.

Invariants the static-shape batching redesign must hold for ANY event-size
distribution — not just the fixture sizes the example-based tests use.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from point_cloud_classifier_tpu.data.batching import (
    GraphLoader,
    PointCloudLoader,
    pow2_bucket,
)

settings.register_profile("ci", deadline=None, max_examples=30)
settings.load_profile("ci")


# -- pow2 bucketing -----------------------------------------------------------


@given(st.integers(min_value=0, max_value=10**6), st.sampled_from([8, 64, 256]))
def test_pow2_bucket_properties(n, min_size):
    b = pow2_bucket(n, min_size)
    assert b >= n and b >= min_size and b % 8 == 0
    assert b & (b - 1) == 0  # power of two at the default factor
    assert b == min_size or b // 2 < max(n, min_size)  # tight


# -- point-cloud loader ---------------------------------------------------------

event_sizes = st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=40)


@given(event_sizes, st.integers(min_value=1, max_value=16), st.booleans())
def test_pointcloud_loader_roundtrip(sizes, batch_size, counts_enc):
    """Every point appears exactly once, in its event's segment."""
    rng = np.random.default_rng(0)
    events = [rng.normal(size=(n, 3)).astype(np.float64) for n in sizes]
    labels = rng.integers(0, 2, size=len(sizes))
    loader = PointCloudLoader(
        events,
        labels,
        batch_size=batch_size,
        shuffle=False,
        seg_encoding="counts" if counts_enc else "ids",
    )

    seen_events = 0
    for batch in loader:
        b = batch["y"].shape[0]
        if "seg" in batch:
            seg = batch["seg"].astype(np.int64)
        else:
            assert batch["seg_counts"].sum() == batch["points"].shape[0]
            seg = np.repeat(np.arange(b + 1), batch["seg_counts"])
        mask = batch["y_mask"].astype(bool)
        # padding slots hold no points
        for slot in range(b):
            if not mask[slot]:
                assert len(batch["points"][seg == slot]) == 0
        k = int(mask.sum())
        for slot in range(k):
            ev_idx = seen_events + slot
            rows = batch["points"][seg == slot]
            np.testing.assert_allclose(
                rows, events[ev_idx].astype(np.float32), rtol=1e-6
            )
            assert batch["y"][slot, 0] == labels[ev_idx]
        # padding points land in segment b
        assert np.all(batch["points"][seg == b] == 0.0)
        seen_events += k
    assert seen_events == len(sizes)


@given(event_sizes, st.integers(min_value=1, max_value=8))
def test_length_sorted_covers_all_events(sizes, batch_size):
    """Length-sorted batching yields every event exactly once, less padding."""
    rng = np.random.default_rng(2)
    events = [rng.normal(size=(n, 3)) for n in sizes]
    labels = np.arange(len(sizes)) % 2

    def totals(length_sorted):
        loader = PointCloudLoader(
            events, labels, batch_size=batch_size, shuffle=True, seed=3,
            min_bucket=8, length_sorted=length_sorted,
        )
        n_events, padded = 0, 0
        for batch in loader:
            n_events += int(batch["y_mask"].sum())
            padded += batch["points"].shape[0]
        return n_events, padded

    n_plain, pad_plain = totals(False)
    n_sorted, pad_sorted = totals(True)
    # the hard invariant is coverage; padding reduction is the typical but
    # not pointwise-guaranteed effect (bucket rounding can interleave)
    assert n_plain == n_sorted == len(sizes)


@given(st.integers(min_value=0, max_value=100000))
def test_bucket_factor_ladder(n):
    # a finer geometric ladder is still valid (covers n, multiple of 8) and
    # is tight on ITS ladder; it does not pointwise-dominate the pow2 ladder
    b125 = pow2_bucket(n, 256, 1.25)
    assert b125 >= n and b125 % 8 == 0
    assert n <= 256 or b125 <= int(round(max(n, 256) * 1.25)) + 8  # tight


# -- graph loader ---------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=5),
)
def test_graph_loader_edge_offsets(sizes, batch_size):
    """Edges reference exactly their own graph's node block, remapped."""
    rng = np.random.default_rng(1)
    graphs = []
    for g_i, n in enumerate(sizes):
        e = max(1, int(rng.integers(1, 3 * n)))
        edges = rng.integers(0, n, size=(2, e)).astype(np.int64)
        graphs.append(
            {
                "features": rng.normal(size=(n, 4)),
                "edges": edges,
                "weights": rng.uniform(0.1, 1.0, size=e),
                "label": float(g_i % 2),
            }
        )
    loader = GraphLoader(graphs, batch_size=batch_size, shuffle=False)

    g_cursor = 0
    for batch in loader:
        b = batch["y"].shape[0]
        node_seg = batch["node_seg"].astype(np.int64)
        src, dst = batch["src"].astype(np.int64), batch["dst"].astype(np.int64)
        emask = batch["edge_mask"].astype(bool)
        k = int(batch["y_mask"].sum())

        # real edges connect nodes of the SAME real graph
        assert np.all(node_seg[src[emask]] == node_seg[dst[emask]])
        assert np.all(node_seg[src[emask]] < b)
        # padded edges self-loop on the reserved padding node
        assert np.all(src[~emask] == dst[~emask])
        assert np.all(node_seg[src[~emask]] == b)

        # per-graph edge counts survive batching
        for slot in range(k):
            expected = graphs[g_cursor + slot]["edges"].shape[1]
            assert int(np.sum(emask & (node_seg[src] == slot))) == expected
        g_cursor += k
    assert g_cursor == len(sizes)


# -- segment ops ------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_segment_sum_matmul_equals_scatter(n_rows, n_segments, seed):
    import jax.numpy as jnp

    from point_cloud_classifier_tpu.ops.segment import segment_sum

    rng = np.random.default_rng(seed)
    data = jnp.asarray(rng.normal(size=(n_rows, 4)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, n_segments, size=n_rows).astype(np.int32))
    a = segment_sum(data, seg, n_segments, method="scatter")
    b = segment_sum(data, seg, n_segments, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@given(st.integers(min_value=2, max_value=40), st.integers(min_value=1, max_value=6))
def test_segment_softmax_normalizes(n_rows, n_segments):
    import jax.numpy as jnp

    from point_cloud_classifier_tpu.ops.segment import segment_softmax, segment_sum

    rng = np.random.default_rng(n_rows * 7 + n_segments)
    logits = jnp.asarray(rng.normal(size=n_rows).astype(np.float32) * 3)
    seg = jnp.asarray(np.sort(rng.integers(0, n_segments, size=n_rows)).astype(np.int32))
    p = segment_softmax(logits, seg, n_segments)
    sums = np.asarray(segment_sum(np.asarray(p), seg, n_segments, method="scatter"))
    present = np.bincount(np.asarray(seg), minlength=n_segments) > 0
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


@given(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=5))
def test_segment_rank_is_valid_ranking(n_rows, n_segments):
    import jax.numpy as jnp

    from point_cloud_classifier_tpu.ops.segment import segment_rank_desc

    rng = np.random.default_rng(n_rows * 13 + n_segments)
    score = jnp.asarray(rng.normal(size=n_rows).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, n_segments, size=n_rows)).astype(np.int32))
    valid = jnp.ones(n_rows, jnp.float32)
    ranks = np.asarray(segment_rank_desc(score, seg, n_segments, valid))

    seg_np, score_np = np.asarray(seg), np.asarray(score)
    for s in range(n_segments):
        idx = np.where(seg_np == s)[0]
        if len(idx) == 0:
            continue
        r = ranks[idx]
        assert sorted(r) == list(range(len(idx)))  # permutation 0..m-1
        # rank order respects descending score
        order = idx[np.argsort(r)]
        assert np.all(np.diff(score_np[order]) <= 1e-7)


def test_counts_to_segment_ids_matches_repeat():
    import numpy as np
    import jax.numpy as jnp

    from point_cloud_classifier_tpu.ops.segment import counts_to_segment_ids

    rng = np.random.default_rng(0)
    for _ in range(5):
        s = int(rng.integers(1, 40))
        counts = rng.multinomial(200, np.ones(s) / s)
        want = np.repeat(np.arange(s), counts)
        got = np.asarray(counts_to_segment_ids(jnp.asarray(counts), 200))
        np.testing.assert_array_equal(want, got)


def test_spread_by_segment_matches_gather():
    import numpy as np
    import jax.numpy as jnp

    from point_cloud_classifier_tpu.ops.segment import spread_by_segment

    rng = np.random.default_rng(1)
    vals = rng.normal(size=(17, 3)).astype(np.float32)
    seg = np.sort(rng.integers(0, 17, size=(123,))).astype(np.int32)
    got = np.asarray(spread_by_segment(jnp.asarray(vals), jnp.asarray(seg)))
    np.testing.assert_array_equal(vals[seg], got)


# -- slot-softmax GAT kernel ----------------------------------------------------


@given(
    st.integers(min_value=1, max_value=4),     # graphs
    # pow2 AND rung-ladder shapes: the loader buckets M on a k*2^j rung
    # (8-aligned but usually NOT pow2 — 24/40/72 model production 288/320/
    # 576), and the kernels accept any 8-aligned M since the rung
    # relaxation (ops/gat_pallas._shapes_ok) — so the property sweep must
    # cover the non-pow2 class too
    st.sampled_from([16, 24, 32, 40, 64, 72]),  # m (pow2 + rungs)
    st.sampled_from([4, 8]),                   # slots D
    st.sampled_from([(2, 8), (4, 4)]),         # (heads, dh)
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_slot_gat_matches_oracle_any_wire(b, m, d, hd, seed):
    """The slot-softmax kernel must match the masked-matrix oracle for ANY
    in-row wire — including duplicate sources (drawn from a tiny id pool),
    explicit self-edges, empty rows, and w=0 padding slots (interpret
    mode; forward).  Guards the dedupe / self-collapse / validity chain
    across shapes the example tests don't enumerate."""
    import os

    import jax.numpy as jnp

    from point_cloud_classifier_tpu.ops.gat_pallas import (
        gat_attention_fused,
        gat_attention_xla,
    )

    h, dh = hd
    rng = np.random.default_rng(seed)
    s_dst = jnp.asarray(rng.normal(size=(b, m, h)).astype(np.float32))
    s_src = jnp.asarray(rng.normal(size=(b, m, h)).astype(np.float32))
    # tiny id pool -> heavy duplicates and self-edges
    in_src = jnp.asarray(
        rng.integers(0, max(2, m // 4), size=(b, m, d)).astype(np.int32)
    )
    in_w = jnp.asarray(
        (rng.random((b, m, d)) * (rng.random((b, m, d)) < 0.6)).astype(
            np.float32
        )
    )
    xw = jnp.asarray(rng.normal(size=(b, m, h * dh)).astype(np.float32))
    os.environ["PCC_GAT_KERNEL"] = "slot"
    try:
        got = gat_attention_fused(s_dst, s_src, in_src, in_w, xw, 0.2, True)
    finally:
        os.environ.pop("PCC_GAT_KERNEL", None)
    want = gat_attention_xla(s_dst, s_src, in_src, in_w, xw, 0.2)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )


@given(event_sizes, st.integers(min_value=1, max_value=16))
@settings(max_examples=20, deadline=None)
def test_dense_pointcloud_roundtrip(sizes, batch_size):
    """layout='dense': every point lands exactly once in its cloud's row
    prefix, rows pad with zeros, counts are exact — for ANY size mix."""
    rng = np.random.default_rng(0)
    events = [rng.normal(size=(n, 3)).astype(np.float32) for n in sizes]
    labels = np.zeros(len(sizes), dtype=np.float32)
    loader = PointCloudLoader(
        events, labels, batch_size=batch_size, shuffle=False, layout="dense"
    )
    got = []
    for b in loader:
        assert b["points"].ndim == 3
        counts = b["seg_counts"]
        m = b["points"].shape[1]
        k = int(b["y_mask"].sum())
        for row in range(k):
            got.append(b["points"][row, : counts[row]])
        valid = np.arange(m)[None, :] < counts[: b["points"].shape[0], None]
        assert (b["points"][~valid] == 0).all()
        assert int(counts[:k].sum()) == sum(len(g) for g in got[-k:])
    assert len(got) == len(events)
    for want, have in zip(events, got):
        np.testing.assert_array_equal(want, have)
