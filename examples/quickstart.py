"""End-to-end walkthrough: data → train → evaluate → serve.

Runs on anything (CPU included); on a TPU host the same code uses the chip.

    python examples/quickstart.py [--workdir /tmp/pcc_demo]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from point_cloud_classifier_tpu.data.synthetic import (  # noqa: E402
    write_shower_file,
    write_synthetic_dataset,
)
from point_cloud_classifier_tpu.utils.config import load_config  # noqa: E402
import train as train_cli  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/pcc_quickstart")
    parser.add_argument("--epochs", type=int, default=5)
    args = parser.parse_args()

    data_dir = os.path.join(args.workdir, "data")
    log_dir = os.path.join(args.workdir, "runs")

    print("== 1. synthetic shower data (or point data_dir at real HDF5) ==")
    write_synthetic_dataset(data_dir, n_events_per_file=100, seed=0)

    print("== 2. offline preprocessing (cached .npz artifacts + scalers) ==")
    config = load_config(
        os.path.join(REPO, "configs", "base.yaml"),
        os.path.join(REPO, "configs", "deep_sets.yaml"),
    )
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["create_dataset"] = True
    train_cli.get_dataloader("s2ppc", config)
    config["dataset"]["create_dataset"] = False

    print("== 3. train (jit'd step, early stopping, checkpoints) ==")
    config["logging"]["log_dir"] = log_dir
    config["trainer"]["epochs"] = args.epochs
    run_dir = train_cli.train_model("deep_sets", "s2ppc", config, return_log_dir=True)

    print("== 4. evaluate (metrics.json, classification report, plots) ==")
    eval_dir = os.path.join(run_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    train_cli.evaluate_model(model_dir=run_dir, save_dir=eval_dir)

    print("== 5. serve a raw, unlabeled shower file ==")
    unseen = os.path.join(args.workdir, "unseen.h5")
    write_shower_file(unseen, "piM", n_events=10, seed=123)
    csv = train_cli.infer_raw(run_dir, unseen)

    print(f"\nDone. Run dir: {run_dir}\nPredictions: {csv}")


if __name__ == "__main__":
    main()
