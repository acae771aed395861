"""Golden tests for the config overlay system and run logger.

These two modules are the byte-compat contract with the reference
(`utils/config.py`, `utils/log.py`): merge semantics, version_N probing, and
the meta.json schema consumed by the sweep leaderboard.
"""

import json
import os

import yaml

from point_cloud_classifier_tpu.utils.config import load_config, merge_dicts, save_config
from point_cloud_classifier_tpu.utils.log import TrainingLogger


def test_merge_dicts_specific_wins_on_leaves():
    base = {"a": 1, "b": {"c": 2, "d": 3}, "e": [1, 2]}
    specific = {"b": {"c": 99}, "e": [5], "f": "new"}
    merged = merge_dicts(base, specific)
    assert merged == {"a": 1, "b": {"c": 99, "d": 3}, "e": [5], "f": "new"}
    assert merged is base  # in-place, reference semantics


def test_merge_dicts_nested_dict_replaces_scalar():
    base = {"x": 1}
    specific = {"x": {"y": 2}}
    assert merge_dicts(base, specific) == {"x": {"y": 2}}


def test_load_config_overlay(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("meta:\n  model_name: ''\ndataset:\n  data_dir: d\nlogging:\n  log_dir: log\n")
    spec = tmp_path / "model.yaml"
    spec.write_text("model:\n  input_dim: 9\ndataset:\n  batch_size: 32\n")
    cfg = load_config(str(base), str(spec))
    assert cfg["dataset"] == {"data_dir": "d", "batch_size": 32}
    assert cfg["model"]["input_dim"] == 9
    assert cfg["logging"]["log_dir"] == "log"


def test_load_config_empty_specific(tmp_path):
    # configs/logistic_regression.yaml is empty in the reference; an empty
    # overlay must leave the base untouched (reference utils/config.py:11-15).
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\n")
    spec = tmp_path / "empty.yaml"
    spec.write_text("")
    assert load_config(str(base), str(spec)) == {"a": 1}


def test_repo_configs_resolve():
    root = os.path.join(os.path.dirname(__file__), "..")
    for model in ["fully_connected_net", "deep_sets", "graph_net", "logistic_regression"]:
        cfg = load_config(
            os.path.join(root, "configs", "base.yaml"),
            os.path.join(root, "configs", f"{model}.yaml"),
        )
        assert set(cfg) >= {"meta", "dataset", "logging"}
    # graph_net YAML anchor keeps model.input_dim == dataset.n_features
    cfg = load_config(
        os.path.join(root, "configs", "base.yaml"),
        os.path.join(root, "configs", "graph_net.yaml"),
    )
    assert cfg["model"]["input_dim"] == cfg["dataset"]["n_features"] == 4


def test_save_config_roundtrip(tmp_path):
    cfg = {"meta": {"model_name": "m"}, "trainer": {"epochs": 3}}
    path = save_config(cfg, str(tmp_path / "run"))
    with open(path) as f:
        assert yaml.safe_load(f) == cfg


def test_logger_version_probing_and_meta_format(tmp_path):
    log_dir = str(tmp_path / "log")
    l0 = TrainingLogger("deep_sets", "s2ppc", log_dir)
    assert l0.get_version() == "0"
    l1 = TrainingLogger("deep_sets", "s2ppc", log_dir)
    assert l1.get_version() == "1"

    meta_path = os.path.join(log_dir, "version_0", "meta.json")
    with open(meta_path) as f:
        raw = f.read()
    # byte-format: json with indent=4, dataset key first
    assert raw == json.dumps({"dataset": "s2ppc", "model": "deep_sets"}, indent=4)

    l0.log_metric("accuracy/val", 0.91)
    l0.log_metric("parameters", 123)
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["metrics"] == {"accuracy/val": 0.91, "parameters": 123}
    # sweep leaderboard reads exactly these keys (reference sweep.py:151-153)
    assert meta["metrics"].get("accuracy/val") == 0.91
