"""bf16 compute path: same predictions as f32 within bf16 tolerance.

Mixed precision is the TPU deployment mode (MXU runs bf16 at full rate);
params, pooling reductions, and normalization stats stay f32, so the paths
must agree closely on identical params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_classifier_tpu.models import DeepSets, FullyConnectedNet, GraphNet
from tests.test_parallel import _graph_batch, _pointcloud_batch, _tabular_batch


@pytest.mark.parametrize(
    "make_model,batch_fn",
    [
        (
            lambda dt: FullyConnectedNet(
                input_dim=9,
                hidden_layers=[32, 32],
                batch_normalization=True,
                output_dim=1,
                compute_dtype=dt,
            ),
            _tabular_batch,
        ),
        (
            lambda dt: DeepSets(
                input_dim=6,
                phi_layers=[64, 64],
                rho_layers=[64],
                output_dim=1,
                activation="gelu",
                residual_block=True,
                pooling="mean",
                compute_dtype=dt,
            ),
            _pointcloud_batch,
        ),
        (
            lambda dt: GraphNet(
                input_dim=4,
                hidden_dim=32,
                output_dim=1,
                activation="tanh",
                use_gat=True,
                compute_dtype=dt,
            ),
            _graph_batch,
        ),
    ],
    ids=["fcn", "deep_sets", "graph_net_gat"],
)
def test_bf16_forward_close_to_f32(make_model, batch_fn):
    batch = batch_fn()
    f32 = make_model("float32")
    bf16 = make_model("bfloat16")
    variables = f32.init(jax.random.PRNGKey(0), batch, train=False)

    out_f32 = f32.apply(variables, batch, train=False)
    out_bf16 = bf16.apply(variables, batch, train=False)

    assert out_f32.dtype == jnp.float32 and out_bf16.dtype == jnp.float32
    np.testing.assert_allclose(out_f32, out_bf16, rtol=0.05, atol=0.05)
    # predictions (the parity contract) should be nearly identical
    agree = np.mean((out_f32 >= 0) == (out_bf16 >= 0))
    assert agree >= 0.95


def test_fp16_wire_format_matches_f32():
    """Loaders' float16 transfer format yields near-identical predictions."""
    from point_cloud_classifier_tpu.data.batching import PointCloudLoader

    rng = np.random.default_rng(0)
    events = [rng.normal(size=(rng.integers(5, 40), 6)).astype(np.float64) for _ in range(16)]
    labels = rng.integers(0, 2, size=16)

    model = DeepSets(
        input_dim=6,
        phi_layers=[32],
        rho_layers=[32],
        output_dim=1,
        activation="gelu",
        pooling="mean",
        compute_dtype="bfloat16",
    )

    def run(dtype):
        loader = PointCloudLoader(
            events, labels, batch_size=8, shuffle=False, transfer_dtype=dtype
        )
        batches = list(loader)
        variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
        return np.concatenate(
            [np.asarray(model.apply(variables, b, train=False)) for b in batches]
        )

    f32, f16 = run("float32"), run("float16")
    np.testing.assert_allclose(f32, f16, rtol=0.05, atol=0.05)


def test_counts_seg_encoding_matches_ids():
    """seg_encoding='counts' wire format == explicit per-point ids."""
    from point_cloud_classifier_tpu.data.batching import PointCloudLoader

    rng = np.random.default_rng(4)
    events = [rng.normal(size=(rng.integers(3, 30), 6)) for _ in range(12)]
    labels = rng.integers(0, 2, size=12)

    model = DeepSets(
        input_dim=6, phi_layers=[16], rho_layers=[16], output_dim=1,
        activation="relu", layer_norm=False, pooling="mean",
    )

    def run(enc):
        loader = PointCloudLoader(
            events, labels, batch_size=6, shuffle=False, seg_encoding=enc
        )
        batches = list(loader)
        variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
        return np.concatenate(
            [np.asarray(model.apply(variables, b, train=False)) for b in batches]
        )

    np.testing.assert_allclose(run("ids"), run("counts"), rtol=1e-5, atol=1e-6)


def test_counts_encoding_wire_size():
    from point_cloud_classifier_tpu.data.batching import PointCloudLoader

    rng = np.random.default_rng(5)
    events = [rng.normal(size=(50, 6)) for _ in range(8)]
    loader = PointCloudLoader(
        events, np.zeros(8), batch_size=8, shuffle=False,
        transfer_dtype="float16", seg_encoding="counts",
    )
    batch = next(iter(loader))
    assert "seg" not in batch
    assert batch["seg_counts"].shape == (9,)
    assert batch["seg_counts"].sum() == batch["points"].shape[0]


def test_factored_event_columns_match_full():
    """factor_event_cols wire format == full per-point replication."""
    from point_cloud_classifier_tpu.data.batching import PointCloudLoader

    rng = np.random.default_rng(7)
    events = []
    for _ in range(12):
        n = int(rng.integers(4, 25))
        ev = rng.normal(size=(n, 6))
        ev[:, 1] = rng.normal()  # column 1 constant per event (energy_total)
        events.append(ev)
    labels = rng.integers(0, 2, size=12)

    def run(factored):
        model = DeepSets(
            input_dim=6, phi_layers=[16], rho_layers=[16], output_dim=1,
            activation="relu", layer_norm=False, pooling="mean",
            factored_cols=(1,) if factored else (),
        )
        loader = PointCloudLoader(
            events, labels, batch_size=6, shuffle=False,
            factor_event_cols=(1,) if factored else (),
        )
        batches = list(loader)
        variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
        return np.concatenate(
            [np.asarray(model.apply(variables, b, train=False)) for b in batches]
        )

    np.testing.assert_allclose(run(False), run(True), rtol=1e-5, atol=1e-6)


def test_graph_counts_encoding_matches_ids():
    """GraphLoader seg_encoding='counts' == explicit per-node ids."""
    from point_cloud_classifier_tpu.data.batching import GraphLoader
    from point_cloud_classifier_tpu.models import GraphNet

    rng = np.random.default_rng(6)
    graphs = []
    for g_i in range(10):
        n = int(rng.integers(3, 15))
        e = int(rng.integers(2, 3 * n))
        graphs.append(
            {
                "features": rng.normal(size=(n, 4)),
                "edges": rng.integers(0, n, size=(2, e)),
                "weights": rng.uniform(0.1, 1, size=e),
                "label": float(g_i % 2),
            }
        )
    model = GraphNet(input_dim=4, hidden_dim=8, output_dim=1, activation="tanh")

    def run(enc):
        loader = GraphLoader(graphs, batch_size=5, shuffle=False, seg_encoding=enc)
        batches = list(loader)
        variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
        return np.concatenate(
            [np.asarray(model.apply(variables, b, train=False)) for b in batches]
        )

    np.testing.assert_allclose(run("ids"), run("counts"), rtol=1e-5, atol=1e-6)


def test_fp16_loader_dtypes():
    from point_cloud_classifier_tpu.data.batching import PointCloudLoader

    rng = np.random.default_rng(0)
    events = [rng.normal(size=(10, 6)) for _ in range(4)]
    loader = PointCloudLoader(
        events, np.zeros(4), batch_size=4, shuffle=False, transfer_dtype="float16"
    )
    batch = next(iter(loader))
    assert batch["points"].dtype == np.float16
    assert batch["seg"].dtype == np.int16


def test_bf16_gradients_finite():
    batch = _pointcloud_batch()
    model = DeepSets(
        input_dim=6,
        phi_layers=[64],
        rho_layers=[64],
        output_dim=1,
        activation="gelu",
        pooling="sum",
        compute_dtype="bfloat16",
    )
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss(params):
        logits = model.apply({"params": params}, batch, train=False)
        return jnp.mean(logits**2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    # params (and hence grads) stay f32
    assert all(g.dtype == jnp.float32 for g in leaves)
