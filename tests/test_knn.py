"""On-device kNN graph construction: correctness + GraphNet integration."""

import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_classifier_tpu.ops.knn import knn_edges


def _brute_knn(pos, seg, k, num_graphs):
    """Numpy oracle: per node, indices of its k nearest same-graph nodes."""
    n = len(pos)
    out = {}
    for i in range(n):
        if seg[i] >= num_graphs:
            out[i] = []
            continue
        cand = [
            (np.sum((pos[i] - pos[j]) ** 2), j)
            for j in range(n)
            if j != i and seg[j] == seg[i]
        ]
        cand.sort()
        out[i] = [j for _, j in cand[:k]]
    return out


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(24, 3)).astype(np.float32)
    seg = np.repeat(np.arange(3), 8).astype(np.int32)  # 3 graphs x 8 nodes
    k = 3
    src, dst, mask = knn_edges(jnp.asarray(pos), jnp.asarray(seg), k, 3)
    src, dst, mask = map(np.asarray, (src, dst, mask))

    oracle = _brute_knn(pos, seg, k, 3)
    for i in range(24):
        mine = sorted(src[(dst == i) & (mask > 0)])
        assert mine == sorted(oracle[i]), f"node {i}"


def test_knn_masks_padding_and_small_graphs():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(8, 3)).astype(np.float32)
    # graph 0 has 2 nodes (fewer than k=3); rest padding (seg=1 means padding
    # since num_graphs=1)
    seg = np.array([0, 0, 1, 1, 1, 1, 1, 1], dtype=np.int32)
    src, dst, mask = knn_edges(jnp.asarray(pos), jnp.asarray(seg), 3, 1)
    src, dst, mask = map(np.asarray, (src, dst, mask))

    # node 0 and 1: exactly one valid neighbour each (each other)
    for i in (0, 1):
        valid = src[(dst == i) & (mask > 0)]
        assert list(valid) == [1 - i]
    # padding nodes emit no valid edges
    for i in range(2, 8):
        assert mask[(dst == i)].sum() == 0
    # masked edges self-loop (in-bounds, harmless)
    assert np.all(src[mask == 0] == dst[mask == 0])


def test_graphnet_knn_mode_trains():
    from point_cloud_classifier_tpu.models import GraphNet, ModelWrapper
    from tests.test_parallel import _graph_batch

    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="relu", knn_k=4
    )
    batches = [_graph_batch(seed=s) for s in range(2)]
    w = ModelWrapper(model, learning_rate=1e-3, epochs=2, seed=0)
    w.fit(batches)
    _, probs = w.predict([_graph_batch(seed=9)], return_prob=True)
    assert np.all(np.isfinite(probs)) and probs.shape[1] == 1


def test_knn_aggregate_matches_edge_list():
    """Dense adjacency matmul == gather/scatter over the explicit edge list."""
    from point_cloud_classifier_tpu.ops.knn import knn_aggregate
    from point_cloud_classifier_tpu.ops.segment import segment_sum

    rng = np.random.default_rng(3)
    n, k = 32, 4
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    seg = jnp.asarray(np.sort(rng.integers(0, 3, size=n)), jnp.int32)
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)

    src, dst, mask = knn_edges(pos, seg, k, 3)
    msg = x[src] * mask[:, None]
    ref_add = segment_sum(msg, dst, n)
    deg = segment_sum(mask[:, None], dst, n)
    ref_mean = ref_add / jnp.maximum(deg, 1.0)

    np.testing.assert_allclose(
        np.asarray(knn_aggregate(x, pos, seg, k, 3, "add")),
        np.asarray(ref_add),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(knn_aggregate(x, pos, seg, k, 3, "mean")),
        np.asarray(ref_mean),
        rtol=1e-5,
        atol=1e-5,
    )


def test_graphnet_dense_knn_path_trains():
    from point_cloud_classifier_tpu.models import GraphNet, ModelWrapper
    from tests.test_parallel import _graph_batch

    # add local pooling + no GAT/SAG → the dense adjacency path
    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="relu",
        knn_k=4, local_pooling="mean",
    )
    w = ModelWrapper(model, learning_rate=1e-3, epochs=2, seed=0)
    w.fit([_graph_batch(seed=s) for s in range(2)])
    _, probs = w.predict([_graph_batch(seed=9)], return_prob=True)
    assert np.all(np.isfinite(probs))


def test_graphnet_knn_gat_trains():
    """kNN edge-list path composes with GAT attention."""
    from point_cloud_classifier_tpu.models import GraphNet, ModelWrapper
    from tests.test_parallel import _graph_batch

    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="relu",
        knn_k=4, use_gat=True, gat_heads=4,
    )
    w = ModelWrapper(model, learning_rate=1e-3, epochs=1, seed=0)
    w.fit([_graph_batch(seed=s) for s in range(2)])
    _, probs = w.predict([_graph_batch(seed=9)], return_prob=True)
    assert np.all(np.isfinite(probs))


def test_graphnet_knn_sag_trains():
    """kNN edge-list path composes with SAG pooling."""
    from point_cloud_classifier_tpu.models import GraphNet, ModelWrapper
    from tests.test_parallel import _graph_batch

    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="tanh",
        knn_k=4, sag_pool=True, pool_ratio=0.5,
    )
    w = ModelWrapper(model, learning_rate=1e-3, epochs=1, seed=0)
    w.fit([_graph_batch(seed=s) for s in range(2)])
    _, probs = w.predict([_graph_batch(seed=9)], return_prob=True)
    assert np.all(np.isfinite(probs))


def test_knn_jit_compatible():
    pos = jnp.asarray(np.random.default_rng(2).normal(size=(16, 3)), jnp.float32)
    seg = jnp.asarray(np.repeat([0, 1], 8), jnp.int32)
    f = jax.jit(lambda p, s: knn_edges(p, s, 2, 2))
    src, dst, mask = f(pos, seg)
    assert src.shape == (32,) and dst.shape == (32,) and mask.shape == (32,)
