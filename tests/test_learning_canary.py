"""Slow canaries: the models actually LEARN on separable synthetic data.

Run with ``pytest -m slow``.  These catch regressions that shape/parity
tests cannot — e.g. a sign error that keeps everything finite but destroys
the learning signal.
"""

import numpy as np
import pytest

import train as train_mod
from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
from point_cloud_classifier_tpu.utils.config import load_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("canary"))
    write_synthetic_dataset(d, n_events_per_file=150, seed=9)
    for model, ds in [
        ("fully_connected_net", "s2pt"),
        ("deep_sets", "s2ppc"),
        ("graph_net", "s2pg"),
    ]:
        config = load_config("configs/base.yaml", f"configs/{model}.yaml")
        config["dataset"]["data_dir"] = d
        config["dataset"]["create_dataset"] = True
        train_mod.get_dataloader(ds, config)
    return d


@pytest.mark.parametrize(
    "model_name,dataset_name,epochs,floor",
    [
        ("logistic_regression", "s2pt", None, 0.8),
        ("fully_connected_net", "s2pt", 40, 0.8),
        ("deep_sets", "s2ppc", 15, 0.75),
        ("graph_net", "s2pg", 30, 0.6),
    ],
)
def test_model_learns(model_name, dataset_name, epochs, floor, data_dir, tmp_path):
    import json, os

    config = load_config("configs/base.yaml", f"configs/{model_name}.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["logging"]["log_dir"] = str(tmp_path / "log")
    if epochs and "trainer" in config:
        config["trainer"]["epochs"] = epochs
    run_dir = train_mod.train_model(
        model_name, dataset_name, config, return_log_dir=True
    )
    with open(os.path.join(run_dir, "meta.json")) as f:
        acc = json.load(f)["metrics"]["accuracy/val"]
    assert acc >= floor, f"{model_name} val accuracy {acc} below canary floor {floor}"
