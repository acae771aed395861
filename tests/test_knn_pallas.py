"""Fused kNN+aggregate Pallas kernel: parity with the XLA dense formulation.

Interpreter mode (CPU tests); the compiled path runs on TPU via bench/driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.ops.knn import knn_aggregate
from point_cloud_classifier_tpu.ops.knn_pallas import knn_aggregate_pallas


def _inputs(n=64, h=16, graphs=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    seg = np.sort(rng.integers(0, graphs, size=n)).astype(np.int32)
    seg[-4:] = graphs  # padding nodes
    return x, pos, jnp.asarray(seg), graphs


@pytest.mark.parametrize("aggr", ["add", "mean"])
@pytest.mark.parametrize("k", [1, 4, 9])
def test_pallas_matches_xla(aggr, k):
    x, pos, seg, graphs = _inputs()
    ref = knn_aggregate(x, pos, seg, k, graphs, aggr)
    out = knn_aggregate_pallas(x, pos, seg, k, graphs, aggr, 32, True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


def test_pallas_tie_semantics():
    """Duplicate distances at the k-th neighbour admit all tied candidates."""
    # 4 nodes on a line: node 0 at origin; nodes 1,2 equidistant; node 3 far
    pos = jnp.asarray(
        [[0.0, 0, 0], [1.0, 0, 0], [-1.0, 0, 0], [5.0, 0, 0]], jnp.float32
    )
    x = jnp.eye(4, dtype=jnp.float32)
    seg = jnp.zeros(4, jnp.int32)
    ref = knn_aggregate(x, pos, seg, 1, 1, "add")
    out = knn_aggregate_pallas(x, pos, seg, 1, 1, "add", 4, True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)
    # node 0's single-nearest query admits BOTH tied neighbours
    assert np.asarray(out)[0, 1] == 1.0 and np.asarray(out)[0, 2] == 1.0


def test_pallas_fewer_than_k_candidates():
    x, pos, seg, graphs = _inputs(n=32, graphs=8)  # tiny graphs, k larger
    ref = knn_aggregate(x, pos, seg, 6, graphs, "add")
    out = knn_aggregate_pallas(x, pos, seg, 6, graphs, "add", 32, True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


def test_pallas_vjp_matches_xla():
    x, pos, seg, graphs = _inputs()

    def loss_p(x):
        return jnp.sum(knn_aggregate_pallas(x, pos, seg, 4, graphs, "mean", 32, True) ** 2)

    def loss_x(x):
        return jnp.sum(knn_aggregate(x, pos, seg, 4, graphs, "mean") ** 2)

    v1, g1 = jax.value_and_grad(loss_p)(x)
    v2, g2 = jax.value_and_grad(loss_x)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
