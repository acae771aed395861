"""End-to-end orchestration tests: train.py / sweep.py against synthetic data.

Covers the full run lifecycle the reference wires together in
`train.py:143-186` and `sweep.py:13-68`: versioned run dirs, resolved
config.yaml, meta.json metrics, checkpoint save/restore via evaluate_model,
plot artifacts, and the sweep leaderboard/status-log behavior.
"""

import json
import os

import numpy as np
import pytest
import yaml

from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
from point_cloud_classifier_tpu.utils.config import load_config
import sweep as sweep_mod
import train as train_mod


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("orch_data")
    write_synthetic_dataset(str(d), n_events_per_file=30, seed=7)
    return str(d)


def _base_config(model_name, data_dir, log_dir, epochs):
    config = load_config("configs/base.yaml", f"configs/{model_name}.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["logging"]["log_dir"] = log_dir
    if "trainer" in config:
        config["trainer"]["epochs"] = epochs
    return config


def _create_cache(model_name, dataset_name, data_dir):
    config = load_config("configs/base.yaml", f"configs/{model_name}.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["create_dataset"] = True
    train_mod.get_dataloader(dataset_name, config)


@pytest.fixture(scope="module")
def caches(data_dir):
    _create_cache("fully_connected_net", "s2pt", data_dir)
    _create_cache("deep_sets", "s2ppc", data_dir)
    _create_cache("graph_net", "s2pg", data_dir)
    return data_dir


@pytest.mark.parametrize(
    "model_name,dataset_name",
    [
        ("logistic_regression", "s2pt"),
        ("fully_connected_net", "s2pt"),
        ("deep_sets", "s2ppc"),
        ("graph_net", "s2pg"),
    ],
)
def test_train_model_lifecycle(model_name, dataset_name, caches, tmp_path):
    log_root = str(tmp_path / "log")
    config = _base_config(model_name, caches, log_root, epochs=2)
    log_dir = train_mod.train_model(
        model_name, dataset_name, config, plots=True, return_log_dir=True
    )

    assert log_dir == os.path.join(log_root, "version_0")
    # resolved config written with meta filled in
    with open(os.path.join(log_dir, "config.yaml")) as f:
        saved = yaml.safe_load(f)
    assert saved["meta"]["model_name"] == model_name
    assert saved["meta"]["dataset_name"] == dataset_name
    assert saved["logging"]["log_dir"] == log_dir

    # meta.json metrics in the reference's schema
    with open(os.path.join(log_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["model"] == model_name and meta["dataset"] == dataset_name
    for key in ("accuracy/train", "accuracy/val", "parameters"):
        assert key in meta["metrics"]
    assert 0.0 <= meta["metrics"]["accuracy/val"] <= 1.0

    # plot artifacts
    for png in ("confusion_matrix_test.png", "roc_curve_test.png", "precision_recall_test.png"):
        assert os.path.exists(os.path.join(log_dir, png)), png

    # final weights artifact
    artifact = "model.pkl" if model_name == "logistic_regression" else "model.pt"
    assert os.path.exists(os.path.join(log_dir, artifact))
    if model_name != "logistic_regression":
        assert os.path.exists(os.path.join(log_dir, "best_model.pt"))

    # evaluate_model round-trips the run dir
    eval_dir = str(tmp_path / "eval")
    os.makedirs(eval_dir)
    metrics = train_mod.evaluate_model(model_dir=log_dir, save_dir=eval_dir)
    assert set(metrics) == {"accuracy_train", "accuracy_val", "accuracy_test"}
    assert os.path.exists(os.path.join(eval_dir, "metrics.json"))
    assert os.path.exists(os.path.join(eval_dir, "classification_report.txt"))
    assert os.path.exists(os.path.join(eval_dir, "confusion_matrix_test.png"))

    # --quant auto resolves BEFORE the save-dir choice: every test config
    # sits below the int8 crossover (or off deep_sets entirely), so auto
    # runs the float path, writes the plain eval/ default dir — never an
    # eval_auto/ — and leaves no "quant" marker in metrics.json.  The
    # plumbing is model-independent, so only the cheapest case pays the
    # extra full evaluation
    if model_name == "logistic_regression":
        metrics_auto = train_mod.evaluate_model(model_dir=log_dir, quant="auto")
        assert "quant" not in metrics_auto
        assert os.path.exists(os.path.join(log_dir, "eval", "metrics.json"))
        assert not os.path.exists(os.path.join(log_dir, "eval_auto"))


def test_train_model_versions_increment(caches, tmp_path):
    log_root = str(tmp_path / "log")
    for expect in ("version_0", "version_1"):
        config = _base_config("logistic_regression", caches, log_root, epochs=1)
        log_dir = train_mod.train_model(
            "logistic_regression", "s2pt", config, return_log_dir=True
        )
        assert log_dir.endswith(expect)


def test_checkpoint_restore_predictions_match(caches, tmp_path):
    """get_model(model_dir=...) restores best_model.pt exactly."""
    config = _base_config("fully_connected_net", caches, str(tmp_path / "log"), epochs=2)
    log_dir = train_mod.train_model(
        "fully_connected_net", "s2pt", config, return_log_dir=True
    )
    saved = load_config(os.path.join(log_dir, "config.yaml"))
    loader = train_mod.get_dataloader("s2pt", saved).get_val_loader()
    model = train_mod.get_model("fully_connected_net", saved, model_dir=log_dir)
    _, prob1 = model.predict(loader, return_prob=True)
    model2 = train_mod.get_model("fully_connected_net", saved, model_dir=log_dir)
    _, prob2 = model2.predict(loader, return_prob=True)
    np.testing.assert_allclose(prob1, prob2, rtol=1e-6)


def test_sweep_leaderboard_and_status_log(caches, tmp_path, monkeypatch):
    search_dir = str(tmp_path / "search")
    np.random.seed(0)
    top = sweep_mod.run_search(
        "fully_connected_net",
        "s2pt",
        search_dir=search_dir,
        max_runs=2,
        epochs=1,
        force=True,
        data_dir=caches,
    )
    assert len(top) == 2
    accs = [r["val_acc"] for r in top]
    assert accs == sorted(accs, reverse=True)

    with open(os.path.join(search_dir, "search_results.json")) as f:
        persisted = json.load(f)
    assert persisted == top
    assert all(set(r) == {"version", "val_acc", "parameters"} for r in persisted)


def test_sweep_failure_goes_to_status_log(caches, tmp_path, monkeypatch):
    search_dir = str(tmp_path / "search_fail")

    def boom(**kwargs):
        raise RuntimeError("injected failure")

    monkeypatch.setattr(sweep_mod, "train_model", boom)
    np.random.seed(0)
    top = sweep_mod.run_search(
        "deep_sets", "s2ppc", search_dir=search_dir, max_runs=1, epochs=1, force=True
    )
    assert top == []
    with open(os.path.join(search_dir, "status_log.txt")) as f:
        log = f.read()
    assert "Run 0 FAILED" in log and "injected failure" in log
    with open(os.path.join(search_dir, "search_results.json")) as f:
        assert json.load(f) == []


def test_cli_train_and_evaluate(caches, tmp_path):
    log_root = str(tmp_path / "cli_log")
    train_mod.main(
        [
            "train",
            "logistic_regression",
            "--data-dir",
            caches,
            "--log-dir",
            log_root,
            "--epochs",
            "1",
        ]
    )
    run_dir = os.path.join(log_root, "version_0")
    assert os.path.exists(os.path.join(run_dir, "meta.json"))
    train_mod.main(["evaluate", run_dir])
    assert os.path.exists(os.path.join(run_dir, "eval", "metrics.json"))


def test_cli_infer(caches, tmp_path):
    log_root = str(tmp_path / "infer_log")
    config = _base_config("fully_connected_net", caches, log_root, epochs=1)
    run_dir = train_mod.train_model(
        "fully_connected_net", "s2pt", config, return_log_dir=True
    )
    out = train_mod.infer(run_dir, split="val")
    with open(out) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "index,y_true,probability,prediction"
    assert len(lines) > 1
    idx, y, prob, pred = lines[1].split(",")
    assert y in ("0", "1") and 0.0 <= float(prob) <= 1.0


def test_cli_infer_quant_int8(caches, tmp_path):
    """--quant int8 serves a trained deep_sets run through the s8 MXU path
    (ops/quant.py) with near-identical probabilities to the float path."""
    log_root = str(tmp_path / "quant_log")
    config = _base_config("deep_sets", caches, log_root, epochs=1)
    run_dir = train_mod.train_model("deep_sets", "s2ppc", config, return_log_dir=True)
    out_f = train_mod.infer(run_dir, split="val", output=str(tmp_path / "f.csv"))
    out_q = train_mod.infer(
        run_dir, split="val", output=str(tmp_path / "q.csv"), quant="int8"
    )
    probs_f = np.loadtxt(out_f, delimiter=",", skiprows=1, usecols=2)
    probs_q = np.loadtxt(out_q, delimiter=",", skiprows=1, usecols=2)
    np.testing.assert_allclose(probs_q, probs_f, atol=0.05)
    # quant is eval-only plumbing: rejected for models without the path
    with pytest.raises(ValueError):
        train_mod._apply_quant(
            {"model": {}}, "fully_connected_net", "int8"
        )


def test_graph_layout_eligibility_sees_model_config(caches):
    """get_dataloader must see the model section to route layouts (the
    vmapped sweep passes it through — a mis-routed group would crash every
    arm into status_log).  Since round 3 max ALSO rides dense (one-hot
    einsum aggregation, 5.3× flat) with the in-row fallback gate, and
    since round 4 SAG+max does too (keep-masked in-row weights); knn_k
    is the remaining flat-locked knob."""
    from train import get_dataloader

    base = {"data_dir": caches, "batch_size": 4}
    sag_max = get_dataloader(
        "s2pg",
        {
            "dataset": dict(base),
            "model": {"local_pooling": "max", "sag_pool": True},
        },
    )
    assert sag_max.graph_layout == "auto"
    flat = get_dataloader(
        "s2pg",
        {"dataset": dict(base), "model": {"knn_k": 4}},
    )
    assert flat.graph_layout == "flat"
    max_dense = get_dataloader(
        "s2pg", {"dataset": dict(base), "model": {"local_pooling": "max"}}
    )
    assert max_dense.graph_layout == "auto"
    dense = get_dataloader(
        "s2pg", {"dataset": dict(base), "model": {"local_pooling": "add"}}
    )
    assert dense.graph_layout == "auto"
    gat = get_dataloader(
        "s2pg",
        {
            "dataset": dict(base, use_weights=False),
            "model": {"use_gat": True, "local_pooling": "max"},
        },
    )
    assert gat.graph_layout == "auto"  # local_pooling vacuous under GAT
    gat_w = get_dataloader(
        "s2pg",
        {
            "dataset": dict(base, use_weights=True),
            "model": {"use_gat": True},
        },
    )
    # weighted GAT rides dense too now — the LOADER demotes itself to flat
    # only if an exact-zero wire weight exists (dense existence is w != 0;
    # tests/test_dense_graph.py pins both demotion and no-demotion cases)
    assert gat_w.graph_layout == "auto"
    assert gat_w.dense_w_is_existence


def test_pointcloud_layout_defaults_to_auto(caches):
    """s2ppc defaults to the per-batch auto layout (dense per-cloud rows
    whenever padding allows — the BASELINE.md headline wire), like s2pg's
    graph_layout; an explicit dataset.layout must win."""
    from train import get_dataloader

    base = {"data_dir": caches, "batch_size": 4}
    auto = get_dataloader("s2ppc", {"dataset": dict(base)})
    assert auto.layout == "auto"
    flat = get_dataloader("s2ppc", {"dataset": dict(base, layout="flat")})
    assert flat.layout == "flat"
