"""Torch-checkpoint conversion (convert.py): forward-output equivalence.

For each supported model the test builds the actual reference torch module
(or the reference-semantics oracle where torch_geometric is required),
converts its randomly-initialized ``state_dict`` with
``convert_torch_state_dict``, and asserts the logits of the torch eval
forward and our converted-params eval forward match — the property a
migrating user needs from `docs/migration.md`'s checkpoint section.
"""

import os
import sys

import numpy as np
import pytest

from point_cloud_classifier_tpu.convert import convert_torch_state_dict

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


def _ref_class(module: str, name: str):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        for m in list(sys.modules):
            if m == "models" or m.startswith("models."):
                del sys.modules[m]
        cls = getattr(importlib.import_module(module), name)
    finally:
        sys.path.remove(REFERENCE)
        for m in list(sys.modules):
            if m == "models" or m.startswith("models."):
                del sys.modules[m]
    return cls


def _ours(model, params, stats, batch):
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = model.apply(variables, batch, train=False)
    return np.asarray(out, dtype=np.float32)


@needs_reference
@pytest.mark.parametrize("bn", [True, False], ids=["bn", "nobn"])
def test_fcn_forward_equivalence(bn):
    from point_cloud_classifier_tpu.models import FullyConnectedNet

    RefFCN = _ref_class("models.fully_connected_net", "FullyConnectedNet")
    torch.manual_seed(0)
    cfg = {
        "input_dim": 9,
        "hidden_layers": [24, 24],
        "batch_normalization": bn,
        "output_dim": 1,
    }
    ref = RefFCN(**cfg).eval()
    params, stats = convert_torch_state_dict(
        "fully_connected_net", {"model": cfg}, ref.state_dict()
    )

    x = np.random.default_rng(1).normal(size=(16, 9)).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy()
    got = _ours(
        FullyConnectedNet(**cfg),
        params,
        stats,
        {"x": x, "y_mask": np.ones((16,), np.float32)},
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_reference
@pytest.mark.parametrize(
    "ln,residual",
    [(True, True), (True, False), (False, True), (False, False)],
    ids=["ln+res", "ln", "res", "plain"],
)
def test_deep_sets_forward_equivalence(ln, residual, monkeypatch):
    from point_cloud_classifier_tpu.models import DeepSets

    # our "gelu" resolves to QuickGELU by default (whole-step A/B'd, a
    # ~3e-4 logit change); equivalence testing wants the reference's
    # exact-erf form
    monkeypatch.setenv("PCC_GELU", "exact")
    RefDS = _ref_class("models.deep_sets", "DeepSets")
    torch.manual_seed(0)
    cfg = {
        "input_dim": 6,
        "phi_layers": [24, 24],
        "rho_layers": [24],
        "output_dim": 1,
        "activation": "gelu",
        "layer_norm": ln,
        "residual_block": residual,
        "pooling": "mean",
    }
    ref = RefDS(**cfg, sparse_batching=True).eval()
    params, stats = convert_torch_state_dict("deep_sets", {"model": cfg}, ref.state_dict())

    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 6)).astype(np.float32)
    idx = np.sort(rng.integers(0, 4, size=(40,))).astype(np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(idx)).numpy()
    got = _ours(
        DeepSets(**cfg),
        params,
        stats,
        {
            "points": x,
            "seg": idx.astype(np.int32),
            "y": np.zeros((4, 1), np.float32),
            "y_mask": np.ones((4,), np.float32),
        },
    )
    # atol 1e-4: stacked f32 LayerNorms differ by accumulation order
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_graph_net_forward_equivalence():
    """Oracle with torch_geometric's GraphConv key layout (lin_rel/lin_root)
    and the reference's deepchem readout (`models/graph_net.py:86-92`)."""
    import torch.nn as nn

    from point_cloud_classifier_tpu.models import GraphNet

    class RefGraphConv(nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.lin_rel = nn.Linear(dim_in, dim_out)
            self.lin_root = nn.Linear(dim_in, dim_out, bias=False)

        def forward(self, x, src, dst):
            agg = torch.zeros(x.shape[0], self.lin_rel.in_features)
            agg.index_add_(0, dst, x[src])
            return self.lin_rel(agg) + self.lin_root(x)

    class RefGraphNet(nn.Module):
        def __init__(self, hidden=24):
            super().__init__()
            self.conv1 = RefGraphConv(4, hidden)
            self.bn1 = nn.BatchNorm1d(hidden)
            self.conv2 = RefGraphConv(hidden, hidden)
            self.bn2 = nn.BatchNorm1d(hidden)
            self.fc1 = nn.Linear(hidden, 256)
            self.bn3 = nn.BatchNorm1d(256)
            self.fc2 = nn.Linear(256, 1)

        def forward(self, x, membership, src, dst, batch_size):
            x = self.bn1(torch.tanh(self.conv1(x, src, dst)))
            x = self.bn2(torch.tanh(self.conv2(x, src, dst)))
            x = self.bn3(torch.tanh(self.fc1(x)))  # deepchem_style
            pooled = torch.zeros(batch_size, x.shape[1])
            pooled.index_add_(0, membership, x)
            counts = torch.bincount(membership, minlength=batch_size).clamp(min=1)
            return self.fc2(pooled / counts[:, None].float())

    torch.manual_seed(0)
    ref = RefGraphNet().eval()
    cfg = {
        "input_dim": 4,
        "hidden_dim": 24,
        "output_dim": 1,
        "activation": "tanh",
        "deepchem_style": True,
    }
    params, stats = convert_torch_state_dict("graph_net", {"model": cfg}, ref.state_dict())

    rng = np.random.default_rng(3)
    n, e, b = 20, 40, 3
    x = rng.normal(size=(n, 4)).astype(np.float32)
    node_seg = np.sort(rng.integers(0, b, size=(n,))).astype(np.int32)
    src = rng.integers(0, n, size=(e,)).astype(np.int32)
    dst = rng.integers(0, n, size=(e,)).astype(np.int32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x),
            torch.from_numpy(node_seg.astype(np.int64)),
            torch.from_numpy(src.astype(np.int64)),
            torch.from_numpy(dst.astype(np.int64)),
            b,
        ).numpy()
    got = _ours(
        GraphNet(**cfg),
        params,
        stats,
        {
            "nodes": x,
            "node_seg": node_seg,
            "src": src,
            "dst": dst,
            "edge_w": np.ones((e,), np.float32),
            "edge_mask": np.ones((e,), np.float32),
            "y": np.zeros((b, 1), np.float32),
            "y_mask": np.ones((b,), np.float32),
        },
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rejects_unsupported_and_leftovers():
    cfg = {"model": {"use_gat": True}}
    with pytest.raises(NotImplementedError):
        convert_torch_state_dict("graph_net", cfg, {})
    with pytest.raises(ValueError):
        convert_torch_state_dict("logistic_regression", {"model": {}}, {})
    # a leftover (unmapped) key must be a hard error, not silence
    fcn_cfg = {
        "model": {
            "input_dim": 2,
            "hidden_layers": [],
            "batch_normalization": False,
            "output_dim": 1,
        }
    }
    state = {
        "network.0.weight": np.zeros((1, 2)),
        "network.0.bias": np.zeros((1,)),
        "network.9.weight": np.zeros((1, 1)),
    }
    with pytest.raises(ValueError, match="unconverted"):
        convert_torch_state_dict("fully_connected_net", fcn_cfg, state)


def test_logreg_loads_reference_sklearn_pickle(tmp_path):
    """The reference pickles the sklearn estimator itself; our load()
    accepts it natively (same affine decision function)."""
    import pickle

    import pandas as pd
    from sklearn.linear_model import LogisticRegression as SkLR

    from point_cloud_classifier_tpu.models import LogRegression

    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 5))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    sk = SkLR().fit(X, y)
    path = str(tmp_path / "model.pkl")
    with open(path, "wb") as f:
        pickle.dump(sk, f)

    ours = LogRegression().load(path)
    df = pd.DataFrame(X, columns=[f"f{i}" for i in range(5)])
    df["label"] = y
    _, prob = ours.predict(df, return_prob=True)
    np.testing.assert_allclose(prob, sk.predict_proba(X)[:, 1], rtol=1e-10, atol=1e-12)


@needs_reference
def test_round_trip_ours_to_torch_and_back():
    """ours -> torch (strict load_state_dict on the real reference module)
    -> ours again: arrays survive both directions exactly."""
    from point_cloud_classifier_tpu.convert import to_torch_state_dict

    RefFCN = _ref_class("models.fully_connected_net", "FullyConnectedNet")
    torch.manual_seed(1)
    cfg = {
        "input_dim": 9,
        "hidden_layers": [16, 16],
        "batch_normalization": True,
        "output_dim": 1,
    }
    ref = RefFCN(**cfg)
    params, stats = convert_torch_state_dict(
        "fully_connected_net", {"model": cfg}, ref.state_dict()
    )
    sd = to_torch_state_dict("fully_connected_net", {"model": cfg}, params, stats)
    ref2 = RefFCN(**cfg)
    ref2.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})
    for k, v in ref.state_dict().items():
        np.testing.assert_array_equal(
            v.numpy(), ref2.state_dict()[k].numpy(), err_msg=k
        )
    # and back again through the forward converter
    params2, stats2 = convert_torch_state_dict(
        "fully_connected_net", {"model": cfg}, ref2.state_dict()
    )
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(stats2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_reference
def test_migration_lifecycle_reference_run_dir(tmp_path):
    """The full switching-user path: a reference-style run dir (byte-compat
    config.yaml + torch state_dict checkpoint) converts and then evaluates
    through our evaluate_model, producing the standard artifacts."""
    import json

    import train as train_mod
    from point_cloud_classifier_tpu.convert import convert_checkpoint
    from point_cloud_classifier_tpu.data import Step2PointTabular
    from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
    from point_cloud_classifier_tpu.utils.config import load_config

    data_dir = str(tmp_path / "data")
    write_synthetic_dataset(data_dir, n_events_per_file=30, seed=5)
    Step2PointTabular(data_dir, create_dataset=True)

    # the reference run dir: resolved config.yaml (same schema) + torch ckpt
    run_dir = tmp_path / "version_0"
    run_dir.mkdir()
    config = load_config("configs/base.yaml", "configs/fully_connected_net.yaml")
    config["meta"] = {
        "model_name": "fully_connected_net",
        "dataset_name": "s2pt",
    }
    config["dataset"]["data_dir"] = data_dir
    import yaml

    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    RefFCN = _ref_class("models.fully_connected_net", "FullyConnectedNet")
    torch.manual_seed(2)
    ref = RefFCN(**{k: config["model"][k] for k in (
        "input_dim", "hidden_layers", "batch_normalization", "output_dim")})
    torch.save(ref.state_dict(), str(run_dir / "ref_model.pt"))

    convert_checkpoint(
        "fully_connected_net", config, str(run_dir / "ref_model.pt"),
        str(run_dir / "best_model.pt"),
    )

    save_dir = tmp_path / "eval"
    save_dir.mkdir()
    metrics = train_mod.evaluate_model(str(run_dir), str(save_dir))
    assert set(metrics) == {"accuracy_train", "accuracy_val", "accuracy_test"}
    with open(save_dir / "metrics.json") as f:
        assert json.load(f) == metrics
    assert (save_dir / "classification_report.txt").exists()
