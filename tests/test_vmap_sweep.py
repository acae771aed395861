"""Vmapped multi-config sweep: parity with sequential training + artifacts."""

import json
import os

import jax
import numpy as np
import pytest

from point_cloud_classifier_tpu.models import FullyConnectedNet, ModelWrapper
from point_cloud_classifier_tpu.parallel.vmap_sweep import train_configs_vmapped
from tests.test_parallel import _tabular_batch


def _loaders():
    train = [_tabular_batch(seed=s) for s in range(4)]
    val = [_tabular_batch(seed=99)]
    return train, val


def test_vmapped_matches_sequential():
    """K vmapped arms == K independent ModelWrapper runs (same seeds/lrs)."""
    train, val = _loaders()
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[16, 16], batch_normalization=True, output_dim=1
    )
    lrs = [1e-2, 1e-3]
    result = train_configs_vmapped(
        model, lrs, "adam", epochs=3, train_loader=train, val_loader=val,
        seeds=[0, 1],
    )
    val_accs, n_params = result["val_accs"], result["n_params"]

    for lr, seed, va in zip(lrs, [0, 1], val_accs):
        w = ModelWrapper(model, learning_rate=lr, epochs=3, seed=seed)
        w.fit(train)
        _, preds = w.predict(val)
        y = np.concatenate([b["y"][b["y_mask"].astype(bool)] for b in val])
        acc = float((preds == (y >= 0.5)).mean())
        assert va == pytest.approx(acc, abs=1e-6), f"lr={lr}"
    assert n_params == w.get_trainable_parameters()


def test_vmapped_adamw_runs():
    train, val = _loaders()
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
    )
    result = train_configs_vmapped(
        model, [1e-2, 3e-3, 1e-3], "adamw", epochs=2, train_loader=train, val_loader=val
    )
    val_accs, train_accs = result["val_accs"], result["train_accs"]
    assert len(val_accs) == 3 and len(train_accs) == 3
    assert all(0.0 <= a <= 1.0 for a in val_accs)
    # per-arm weight states come back in ModelWrapper checkpoint format
    assert len(result["final_state"]) == 3 and len(result["best_state"]) == 3
    for st in result["final_state"]:
        assert set(st) == {"params", "batch_stats"}


def test_vmapped_pointcloud_arms():
    """Vmapped arms handle bucket-shape polymorphism (point-cloud loaders)."""
    from point_cloud_classifier_tpu.data.batching import PointCloudLoader
    from point_cloud_classifier_tpu.models import DeepSets

    rng = np.random.default_rng(0)
    events = [rng.normal(size=(rng.integers(5, 80), 6)) for _ in range(24)]
    labels = rng.integers(0, 2, size=24)
    train = PointCloudLoader(events[:16], labels[:16], batch_size=8, shuffle=False, min_bucket=64)
    val = PointCloudLoader(events[16:], labels[16:], batch_size=8, shuffle=False, min_bucket=64)

    model = DeepSets(
        input_dim=6, phi_layers=[16], rho_layers=[16], output_dim=1,
        activation="gelu", layer_norm=False, pooling="mean",
    )
    result = train_configs_vmapped(
        model, [1e-2, 1e-3], "adamw", epochs=2, train_loader=train, val_loader=val
    )
    assert len(result["val_accs"]) == 2
    assert all(0.0 <= a <= 1.0 for a in result["val_accs"])


def test_run_search_vmapped_deep_sets(tmp_path):
    import sweep as sweep_mod
    from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
    from point_cloud_classifier_tpu.utils.config import load_config
    from train import get_dataloader

    data_dir = str(tmp_path / "data")
    write_synthetic_dataset(data_dir, n_events_per_file=25, seed=4)
    config = load_config("configs/base.yaml", "configs/deep_sets.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["create_dataset"] = True
    get_dataloader("s2ppc", config)

    np.random.seed(1)
    top = sweep_mod.run_search_vmapped(
        "deep_sets", "s2ppc", search_dir=str(tmp_path / "s"),
        max_runs=2, epochs=1, force=True, data_dir=data_dir,
    )
    assert len(top) == 2


def test_arm_sharded_matches_unsharded():
    """Arms sharded over the 8-device mesh == unsharded vmapped training."""
    from point_cloud_classifier_tpu.parallel import make_mesh

    train, val = _loaders()
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[16], batch_normalization=False, output_dim=1
    )
    lrs = [10 ** (-2 - 0.1 * i) for i in range(8)]
    plain = train_configs_vmapped(
        model, lrs, "adam", epochs=3, train_loader=train, val_loader=val
    )
    sharded = train_configs_vmapped(
        model, lrs, "adam", epochs=3, train_loader=train, val_loader=val,
        mesh=make_mesh(),
    )
    np.testing.assert_allclose(plain["val_accs"], sharded["val_accs"], atol=1e-6)
    for a, b in zip(plain["final_state"], sharded["final_state"]):
        for la, lb in zip(
            jax.tree.leaves(a["params"]), jax.tree.leaves(b["params"])
        ):
            np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-6)


def test_arm_sharding_requires_divisibility():
    """K not divisible by the data axis → silently falls back to replication."""
    from point_cloud_classifier_tpu.parallel import make_mesh

    train, val = _loaders()
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
    )
    result = train_configs_vmapped(
        model, [1e-2, 1e-3, 3e-3], "adam", epochs=1,
        train_loader=train, val_loader=val, mesh=make_mesh(),
    )
    assert len(result["val_accs"]) == 3


def test_run_search_vmapped_artifacts(tmp_path):
    """--vmap sweep writes the same artifact contract as the sequential one."""
    import sweep as sweep_mod
    from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
    from train import get_dataloader
    from point_cloud_classifier_tpu.utils.config import load_config

    data_dir = str(tmp_path / "data")
    write_synthetic_dataset(data_dir, n_events_per_file=30, seed=3)
    config = load_config("configs/base.yaml", "configs/fully_connected_net.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["create_dataset"] = True
    get_dataloader("s2pt", config)

    search_dir = str(tmp_path / "search")
    np.random.seed(0)
    top = sweep_mod.run_search_vmapped(
        "fully_connected_net",
        "s2pt",
        search_dir=search_dir,
        max_runs=3,
        epochs=1,
        force=True,
        data_dir=data_dir,
    )
    assert len(top) == 3
    accs = [r["val_acc"] for r in top]
    assert accs == sorted(accs, reverse=True)

    with open(os.path.join(search_dir, "search_results.json")) as f:
        persisted = json.load(f)
    assert persisted == top
    for i in range(3):
        vdir = os.path.join(search_dir, f"version_{i}")
        assert os.path.exists(os.path.join(vdir, "config.yaml"))
        with open(os.path.join(vdir, "meta.json")) as f:
            meta = json.load(f)
        assert {"accuracy/train", "accuracy/val", "parameters"} <= set(
            meta["metrics"]
        )
        # trained weights persisted → evaluate/infer work on sweep winners
        assert os.path.exists(os.path.join(vdir, "model.pt"))
        assert os.path.exists(os.path.join(vdir, "best_model.pt"))

    # the winning run restores through the normal get_model path
    import train as train_mod
    from point_cloud_classifier_tpu.utils.config import load_config as _lc

    win = os.path.join(search_dir, f"version_{top[0]['version']}")
    cfg = _lc(os.path.join(win, "config.yaml"))
    model = train_mod.get_model("fully_connected_net", cfg, model_dir=win)
    loader = train_mod.get_dataloader("s2pt", cfg).get_val_loader()
    y_true, y_pred = model.predict(loader)
    acc = float((y_pred.reshape(-1) == y_true.reshape(-1)).mean())
    assert acc == pytest.approx(top[0]["val_acc"], abs=0.2)


def test_vmapped_graph_arms_dense_layout():
    """Vmapped arms train over dense in-row graph batches (the production
    wire for GraphConv add/mean) — dict batches with [B, M, D] arrays must
    trace through the shared-batch vmap cleanly."""
    from point_cloud_classifier_tpu.data.batching import GraphLoader
    from point_cloud_classifier_tpu.models import GraphNet

    rng = np.random.default_rng(5)
    graphs = []
    for i in range(16):
        n = int(rng.integers(3, 10))
        pairs = sorted(
            {(int(a), int(b)) for a, b in rng.integers(0, n, size=(2 * n, 2)) if a != b}
        )
        edges = np.array(pairs, dtype=np.int32).T.reshape(2, -1)
        graphs.append(
            {
                "features": rng.normal(size=(n, 4)).astype(np.float32),
                "edges": edges,
                "weights": rng.uniform(0.1, 1.0, size=(edges.shape[1],)).astype(np.float32),
                "label": float(i % 2),
            }
        )
    train = GraphLoader(graphs[:12], batch_size=4, shuffle=False, layout="dense")
    val = GraphLoader(graphs[12:], batch_size=4, shuffle=False, layout="dense")
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="tanh",
        local_pooling="add", deepchem_style=True,
    )
    result = train_configs_vmapped(
        model, [1e-2, 1e-3], "adam", epochs=2, train_loader=train, val_loader=val
    )
    assert len(result["val_accs"]) == 2
    assert all(0.0 <= a <= 1.0 for a in result["val_accs"])


def test_vmapped_sag_max_flat_arms():
    """SAG + max rides the FLAT layout, whose SAGPool calls
    segment_rank_desc — regression for a TracerArrayConversionError under
    the vmapped init (numpy host segment_ids fancy-indexed by a vmap
    tracer inside the un-jitted model.init; found by a 24-run vmapped
    sweep soak, 2026-08-19)."""
    from point_cloud_classifier_tpu.data.batching import GraphLoader
    from point_cloud_classifier_tpu.models import GraphNet

    rng = np.random.default_rng(7)
    graphs = []
    for i in range(16):
        n = int(rng.integers(3, 10))
        pairs = sorted(
            {(int(a), int(b)) for a, b in rng.integers(0, n, size=(2 * n, 2)) if a != b}
        )
        edges = np.array(pairs, dtype=np.int32).T.reshape(2, -1)
        graphs.append(
            {
                "features": rng.normal(size=(n, 4)).astype(np.float32),
                "edges": edges,
                "weights": np.ones((edges.shape[1],), np.float32),
                "label": float(i % 2),
            }
        )
    train = GraphLoader(graphs[:12], batch_size=4, shuffle=False, layout="flat",
                        use_weights=False)
    val = GraphLoader(graphs[12:], batch_size=4, shuffle=False, layout="flat",
                      use_weights=False)
    model = GraphNet(
        input_dim=4, hidden_dim=8, output_dim=1, activation="relu",
        sag_pool=True, local_pooling="max", deepchem_style=False,
    )
    result = train_configs_vmapped(
        model, [1e-2, 1e-3], "adamw", epochs=2, train_loader=train, val_loader=val
    )
    assert len(result["val_accs"]) == 2
    assert all(0.0 <= a <= 1.0 for a in result["val_accs"])


def test_run_search_vmapped_graph_net(tmp_path):
    """End-to-end vmapped search over graph_net arms: samplers may draw
    GAT/max/dense-eligible configs — every group must build a loader whose
    layout its model can actually consume (regression: the sweep once
    dropped the model section, feeding dense batches to max-aggregation)."""
    import sweep as sweep_mod
    from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
    from point_cloud_classifier_tpu.utils.config import load_config
    from train import get_dataloader

    data_dir = str(tmp_path / "data")
    write_synthetic_dataset(data_dir, n_events_per_file=20, seed=6)
    config = load_config("configs/base.yaml", "configs/graph_net.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["create_dataset"] = True
    get_dataloader("s2pg", config)

    np.random.seed(3)
    top = sweep_mod.run_search_vmapped(
        "graph_net", "s2pg", search_dir=str(tmp_path / "s"),
        max_runs=3, epochs=1, force=True, data_dir=data_dir,
    )
    status = tmp_path / "s" / "status_log.txt"
    assert len(top) == 3, (top, status.read_text() if status.exists() else "")


def test_vmapped_nan_arm_reports_no_best_improvement():
    """An arm that diverges to NaN val loss from epoch 1 never improves,
    so its best_state is the random init — best_improved flags it and
    run_search_vmapped skips writing best_model.pt for it, matching the
    sequential path (which writes no best checkpoint either).  Healthy
    arms in the same group keep their flag (round-5 review finding)."""
    train, val = _loaders()
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
    )
    # lr=1e6 diverges immediately; lr=1e-2 trains fine
    result = train_configs_vmapped(
        model, [1e6, 1e-2], "adam", epochs=3, train_loader=train, val_loader=val
    )
    flags = result["best_improved"]
    assert flags[1] is True  # healthy arm improved
    if not flags[0]:
        # divergence reached NaN (expected at lr=1e6): the init params
        # must NOT masquerade as a best checkpoint
        assert flags[0] is False
