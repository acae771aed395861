"""Accuracy-parity measurement: this framework vs the upstream reference.

BASELINE.md's north-star requires val-accuracy within ±0.5% of the reference
on its model configs.  This script trains BOTH implementations on identical
synthetic data (the offline caches are bit-identical — tests/
test_reference_parity.py — so both read the same .npz artifacts) and reports
val accuracy per model over several seeds.

Reference graph_net needs torch_geometric, which is not installed in this
image; parity for s2pg is therefore covered at the preprocessing level
(bit-identical graphs) + model-semantics unit tests, and the trainable
comparison runs for logistic_regression / fully_connected_net / deep_sets.

Usage:  python scripts/measure_parity.py [--events 200] [--repeats 3]
        [--epochs N]  (run from the repo root)
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402


@contextlib.contextmanager
def _quiet():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        yield


def _prepare_data(data_dir: str, events: int, seed: int) -> None:
    write_synthetic_dataset(data_dir, n_events_per_file=events, seed=seed)
    # build all three caches with OUR pipeline (bit-identical to reference's)
    from point_cloud_classifier_tpu.data import (
        Step2PointPointCloud,
        Step2PointTabular,
    )

    with _quiet():
        Step2PointTabular(data_dir, create_dataset=True)
        Step2PointPointCloud(data_dir, create_dataset=True)


def _val_acc(log_dir: str) -> float:
    with open(os.path.join(log_dir, "meta.json")) as f:
        return json.load(f)["metrics"]["accuracy/val"]


def train_ours(model_name: str, data_dir: str, run_root: str, seed: int, epochs):
    from point_cloud_classifier_tpu.utils.config import load_config
    from train import MODEL_DATASETS, train_model

    config = load_config(
        os.path.join(REPO, "configs", "base.yaml"),
        os.path.join(REPO, "configs", f"{model_name}.yaml"),
    )
    config["dataset"]["data_dir"] = data_dir
    config["logging"]["log_dir"] = os.path.join(run_root, f"ours_{model_name}_{seed}")
    if epochs and "trainer" in config:
        config["trainer"]["epochs"] = epochs
    if "trainer" in config:
        config["trainer"]["seed"] = seed
    with _quiet():
        log_dir = train_model(
            model_name, MODEL_DATASETS[model_name], config, return_log_dir=True
        )
    return _val_acc(log_dir)


def train_reference(model_name: str, data_dir: str, run_root: str, seed: int, epochs):
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)

    # torch_geometric is absent in this image; the reference imports it at
    # module scope for graph_net, which this comparison does not run — stub it
    if "torch_geometric" not in sys.modules:
        import types

        tg = types.ModuleType("torch_geometric")
        tg_nn = types.ModuleType("torch_geometric.nn")
        for name in (
            "GraphConv",
            "GATConv",
            "SAGPooling",
            "global_mean_pool",
            "global_add_pool",
            "global_max_pool",
        ):
            setattr(tg_nn, name, object)
        tg.nn = tg_nn
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.nn"] = tg_nn

    sys.path.insert(0, REFERENCE)
    old_cwd = os.getcwd()
    os.chdir(REFERENCE)  # reference resolves configs/ relative to cwd
    try:
        for mod in list(sys.modules):
            if mod in ("train", "sweep") or mod.startswith(("utils", "models")):
                del sys.modules[mod]
        from train import train_model as ref_train_model  # reference's
        from utils.config import load_config as ref_load_config

        config = ref_load_config("configs/base.yaml", f"configs/{model_name}.yaml")
        config["dataset"]["data_dir"] = data_dir
        config["logging"]["log_dir"] = os.path.join(
            run_root, f"ref_{model_name}_{seed}"
        )
        if epochs and "trainer" in config:
            config["trainer"]["epochs"] = epochs
        with _quiet():
            log_dir = ref_train_model(
                model_name,
                {"logistic_regression": "s2pt", "fully_connected_net": "s2pt", "deep_sets": "s2ppc"}[model_name],
                config,
                return_log_dir=True,
            )
        return _val_acc(log_dir)
    finally:
        os.chdir(old_cwd)
        sys.path.remove(REFERENCE)
        for mod in list(sys.modules):
            if mod in ("train", "sweep") or mod.startswith(("utils", "models")):
                del sys.modules[mod]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--events", type=int, default=200, help="events per particle file")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=None, help="override epochs (default: reference configs)")
    parser.add_argument(
        "--models",
        nargs="+",
        default=["logistic_regression", "fully_connected_net", "deep_sets"],
    )
    parser.add_argument("--keep", action="store_true", help="keep the work dir")
    args = parser.parse_args()

    work = tempfile.mkdtemp(prefix="parity_")
    data_dir = os.path.join(work, "data")
    run_root = os.path.join(work, "runs")
    print(f"work dir: {work}")
    _prepare_data(data_dir, args.events, seed=0)

    results = {}
    for model in args.models:
        ours, ref = [], []
        for r in range(args.repeats):
            ref.append(train_reference(model, data_dir, run_root, seed=r, epochs=args.epochs))
            ours.append(train_ours(model, data_dir, run_root, seed=r, epochs=args.epochs))
            print(f"  {model} seed {r}: ref={ref[-1]:.4f} ours={ours[-1]:.4f}")
        results[model] = {
            "reference_val_acc": float(np.mean(ref)),
            "ours_val_acc": float(np.mean(ours)),
            "reference_runs": ref,
            "ours_runs": ours,
            "delta": float(np.mean(ours) - np.mean(ref)),
        }
        print(
            f"{model}: reference {np.mean(ref):.4f} ± {np.std(ref):.4f}  "
            f"ours {np.mean(ours):.4f} ± {np.std(ours):.4f}  "
            f"Δ {np.mean(ours) - np.mean(ref):+.4f}"
        )

    print(json.dumps(results, indent=2))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
