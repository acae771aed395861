"""Mesh / sharding tests on the 8-device virtual CPU mesh (see conftest.py).

Validates the SPMD design from SURVEY §2's parallelism table: batches shard
over the ``data`` axis, wide weights over ``model``, and the numerics match
the single-device path exactly (XLA collectives are a layout detail, not a
math change).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from point_cloud_classifier_tpu.models import DeepSets, FullyConnectedNet, GraphNet, ModelWrapper
from point_cloud_classifier_tpu.parallel import (
    batch_shardings,
    make_mesh,
    param_shardings,
    shard_batch,
)


def _tabular_batch(b=32, f=9, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.normal(size=(b, f)).astype(np.float32),
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }


def _pointcloud_dense_batch(b=8, m=32, f=6, seed=0):
    """DENSE point-cloud wire: per-cloud rows, padding inside rows."""
    rng = np.random.default_rng(seed)
    counts = rng.integers(1, m + 1, size=(b,)).astype(np.int32)
    pts = np.zeros((b, m, f), dtype=np.float32)
    valid = np.arange(m)[None, :] < counts[:, None]
    pts[valid] = rng.normal(size=(int(counts.sum()), f)).astype(np.float32)
    return {
        "points": pts,
        "seg_counts": np.concatenate([counts, [0]]).astype(np.int32),
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }


def _pointcloud_batch(b=8, p=256, f=6, seed=0):
    rng = np.random.default_rng(seed)
    seg = np.sort(rng.integers(0, b, size=(p - 16,))).astype(np.int32)
    seg = np.concatenate([seg, np.full((16,), b, dtype=np.int32)])
    return {
        "points": rng.normal(size=(p, f)).astype(np.float32),
        "seg": seg,
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }


def _graph_batch(b=8, n=256, e=512, f=4, seed=0):
    rng = np.random.default_rng(seed)
    node_seg = np.sort(rng.integers(0, b, size=(n - 8,))).astype(np.int32)
    node_seg = np.concatenate([node_seg, np.full((8,), b, dtype=np.int32)])
    src = rng.integers(0, n - 8, size=(e,)).astype(np.int32)
    dst = rng.integers(0, n - 8, size=(e,)).astype(np.int32)
    return {
        "nodes": rng.normal(size=(n, f)).astype(np.float32),
        "node_seg": node_seg,
        "src": src,
        "dst": dst,
        "edge_w": np.ones((e,), dtype=np.float32),
        "edge_mask": np.ones((e,), dtype=np.float32),
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(n_model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(n_data=8, n_model=2)


def test_batch_shardings_lead_dim():
    mesh = make_mesh()
    batch = _pointcloud_batch()
    sh = batch_shardings(mesh, batch)
    assert sh["points"].spec == P("data", None)
    assert sh["seg"].spec == P("data")
    assert sh["y"].spec == P("data", None)
    # non-divisible leading dim stays replicated
    odd = {"weird": np.zeros((3, 2), dtype=np.float32)}
    assert batch_shardings(mesh, odd)["weird"].spec == P()


def test_param_shardings_model_axis():
    mesh = make_mesh(n_model=2)
    params = {
        "dense": {"kernel": np.zeros((6, 256)), "bias": np.zeros((256,))},
        "tiny": {"kernel": np.zeros((4, 1))},
    }
    sh = param_shardings(mesh, params)
    assert sh["dense"]["kernel"].spec == P(None, "model")
    assert sh["dense"]["bias"].spec == P()
    assert sh["tiny"]["kernel"].spec == P()


@pytest.mark.parametrize(
    "model,batch_fn",
    [
        (
            FullyConnectedNet(
                input_dim=9, hidden_layers=[32, 32], batch_normalization=True, output_dim=1
            ),
            _tabular_batch,
        ),
        (
            DeepSets(
                input_dim=6,
                phi_layers=[64, 64],
                rho_layers=[64],
                output_dim=1,
                activation="gelu",
                residual_block=True,
                pooling="mean",
            ),
            _pointcloud_batch,
        ),
        (
            DeepSets(
                input_dim=6,
                phi_layers=[64, 64],
                rho_layers=[64],
                output_dim=1,
                activation="gelu",
                residual_block=True,
                pooling="mean",
            ),
            _pointcloud_dense_batch,
        ),
        (
            GraphNet(input_dim=4, hidden_dim=32, output_dim=1, activation="tanh"),
            _graph_batch,
        ),
    ],
    ids=["fcn", "deep_sets", "deep_sets_dense_wire", "graph_net"],
)
def test_data_parallel_matches_single_device(model, batch_fn):
    """One train epoch sharded over 8 devices == the single-device run."""

    def run(mesh):
        wrapper = ModelWrapper(model, learning_rate=1e-3, epochs=1, seed=0, mesh=mesh)
        batches = [batch_fn(seed=s) for s in range(3)]
        wrapper.fit(batches)
        _, probs = wrapper.predict([batch_fn(seed=9)], return_prob=True)
        return probs

    single = run(None)
    sharded = run(make_mesh())
    np.testing.assert_allclose(single, sharded, rtol=5e-4, atol=5e-5)


def test_tensor_parallel_matches_single_device():
    """data=4 x model=2 mesh (sharded phi/rho weights) matches single device."""
    model = DeepSets(
        input_dim=6,
        phi_layers=[128, 128],
        rho_layers=[128],
        output_dim=1,
        activation="gelu",
        pooling="mean",
    )

    def run(mesh):
        wrapper = ModelWrapper(model, learning_rate=1e-3, epochs=1, seed=0, mesh=mesh)
        wrapper.fit([_pointcloud_batch(seed=s) for s in range(2)])
        _, probs = wrapper.predict([_pointcloud_batch(seed=9)], return_prob=True)
        return probs

    single = run(None)
    tp = run(make_mesh(n_model=2))
    np.testing.assert_allclose(single, tp, rtol=5e-4, atol=5e-5)


def test_shard_batch_places_arrays():
    mesh = make_mesh()
    placed = shard_batch(mesh, _tabular_batch())
    assert placed["x"].sharding.spec == P("data", None)
    committed = jax.device_get(placed["x"])
    np.testing.assert_array_equal(committed, _tabular_batch()["x"])


def _giant_event_batch(p=1024, f=6, seed=0):
    """ONE event owns every valid point — the 'sequence parallel' analogue.

    The flattened point buffer shards over ``data`` (SURVEY §2's long-context
    row), so a single event larger than any one shard spans all devices and
    its segment-sum pooling crosses every shard boundary (XLA emits the
    psum).  B=2 keeps a second (empty-ish) event so masking stays exercised.
    """
    rng = np.random.default_rng(seed)
    seg = np.zeros((p,), dtype=np.int32)
    seg[-8:] = 1  # a tiny second event
    seg[-4:] = 2  # padding slots (B == 2)
    return {
        "points": rng.normal(size=(p, f)).astype(np.float32),
        "seg": seg,
        "y": np.array([[1.0], [0.0]], dtype=np.float32),
        "y_mask": np.ones((2,), dtype=np.float32),
    }


def test_giant_event_spans_all_shards():
    """An event bigger than any single shard trains/predicts exactly like
    single-device: point-axis sharding is how very large events scale."""
    model = DeepSets(
        input_dim=6,
        phi_layers=[64, 64],
        rho_layers=[64],
        output_dim=1,
        activation="gelu",
        residual_block=True,
        pooling="mean",
    )

    def run(mesh):
        wrapper = ModelWrapper(model, learning_rate=1e-3, epochs=1, seed=0, mesh=mesh)
        wrapper.fit([_giant_event_batch(seed=s) for s in range(2)])
        _, probs = wrapper.predict([_giant_event_batch(seed=9)], return_prob=True)
        return probs

    single = run(None)
    sharded = run(make_mesh())  # 8-way: the giant event spans all 8 shards
    np.testing.assert_allclose(single, sharded, rtol=5e-4, atol=5e-5)

def test_fused_steps_under_mesh_match_single_device():
    """fuse_steps > 1 under a mesh == the unfused single-device run.

    Round 2 locked fused+mesh out (the stacked [K, ...] window carried no
    declared shardings); round 3 supports it — _stack_in_jit constrains
    the window to the data-parallel layout
    (parallel.mesh.stacked_batch_sharding), so the scanned program is the
    same SPMD computation as K unfused steps.  Covers train (fit) AND the
    fused eval dispatch (predict runs through _eval_dispatch with
    fuse_steps > 1)."""
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=(8,), batch_normalization=True, output_dim=1
    )

    def run(mesh, fuse):
        wrapper = ModelWrapper(
            model, learning_rate=1e-3, epochs=2, seed=0, mesh=mesh,
            fuse_steps=fuse,
        )
        batches = [_tabular_batch(seed=s) for s in range(5)]
        wrapper.fit(batches)
        _, probs = wrapper.predict(
            [_tabular_batch(seed=9), _tabular_batch(seed=10)], return_prob=True
        )
        return probs

    single = run(None, 1)
    fused_mesh = run(make_mesh(), 4)
    np.testing.assert_allclose(single, fused_mesh, rtol=5e-4, atol=5e-5)
    assert ModelWrapper(
        model, learning_rate=1e-3, epochs=1, seed=0,
        mesh=make_mesh(), fuse_steps=16,
    ).fuse_steps == 16  # no clamp: fused+mesh is supported now


def test_fused_window_sharding_rule():
    """stacked_batch_sharding mirrors batch_shardings one axis over: the
    per-batch leading dim (axis 1) shards over ``data``, the fuse axis
    never does, indivisible leaves replicate."""
    from point_cloud_classifier_tpu.parallel.mesh import stacked_batch_sharding

    mesh = make_mesh()  # data=8
    x = np.zeros((4, 32, 6), dtype=np.float32)  # [K, B, F], B % 8 == 0
    spec = stacked_batch_sharding(mesh, x).spec
    assert spec == P(None, "data", None)
    odd = np.zeros((4, 3), dtype=np.float32)  # axis-1 not divisible
    assert stacked_batch_sharding(mesh, odd).spec == P()
    scalar = np.zeros((4,), dtype=np.float32)  # rank-1: fuse axis only
    assert stacked_batch_sharding(mesh, scalar).spec == P()


def test_fuse_steps_env_override(monkeypatch):
    """PCC_FUSE_STEPS force-overrides the constructor arg (mirrors
    PCC_RESIDENT) so CLI runs can enable step fusion without touching the
    byte-compat configs — with or without a mesh."""
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=(8,), batch_normalization=False, output_dim=1
    )
    monkeypatch.setenv("PCC_FUSE_STEPS", "8")
    w = ModelWrapper(model, learning_rate=1e-3, epochs=1, seed=0)
    assert w.fuse_steps == 8
    monkeypatch.setenv("PCC_FUSE_STEPS", "1")
    w2 = ModelWrapper(
        model, learning_rate=1e-3, epochs=1, seed=0, fuse_steps=16
    )
    assert w2.fuse_steps == 1
    monkeypatch.setenv("PCC_FUSE_STEPS", "8")
    w3 = ModelWrapper(
        model, learning_rate=1e-3, epochs=1, seed=0, mesh=make_mesh()
    )
    assert w3.fuse_steps == 8  # no mesh clamp: fused+mesh is supported


def test_make_mesh_rejects_oversized_model_axis():
    """n_model > device count used to floor-divide n_data to 0 and slip
    past the product guard (0 > N is false), building a zero-device mesh
    that died in a ZeroDivisionError at the first sharding call — now a
    loud ValueError at construction (round-5 review finding)."""
    with pytest.raises(ValueError):
        make_mesh(n_model=16)
    with pytest.raises(ValueError):
        make_mesh(n_data=0, n_model=1)
