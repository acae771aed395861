"""Offline-preprocessing benchmark: reference vs this framework (py + C++).

The S2PG per-event lineage-graph build is the reference's slowest stage
(tqdm'd loop, SURVEY §3.2).  This script times full dataset creation for a
representation on identical synthetic data across three implementations:

- the upstream reference pipeline (pure pandas/numpy — runs without torch)
- this framework with the Python edge builder (PCC_NATIVE=0)
- this framework with the C++ edge builder (default)

Usage: python scripts/bench_preprocessing.py [--events 1000] [--dataset s2pg]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402

OURS = {
    "s2pt": ("point_cloud_classifier_tpu.data", "Step2PointTabular"),
    "s2ppc": ("point_cloud_classifier_tpu.data", "Step2PointPointCloud"),
    "s2pg": ("point_cloud_classifier_tpu.data", "Step2PointGraph"),
}
REF_CLASSES = {
    "s2pt": "Step2PointTabular",
    "s2ppc": "Step2PointPointCloud",
    "s2pg": "Step2PointGraph",
}


def _ours(dataset: str, data_dir: str) -> float:
    import importlib

    mod_name, cls_name = OURS[dataset]
    cls = getattr(importlib.import_module(mod_name), cls_name)
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        cls(data_dir, create_dataset=True)
    return time.time() - t0


def _reference(dataset: str, data_dir: str) -> float:
    sys.path.insert(0, REFERENCE)
    old = os.getcwd()
    os.chdir(REFERENCE)
    try:
        for m in list(sys.modules):
            if m.startswith("utils"):
                del sys.modules[m]
        from utils.data import (  # noqa: F401
            Step2PointGraph,
            Step2PointPointCloud,
            Step2PointTabular,
        )

        cls = {"s2pt": Step2PointTabular, "s2ppc": Step2PointPointCloud, "s2pg": Step2PointGraph}[dataset]
        t0 = time.time()
        with contextlib.redirect_stdout(io.StringIO()):
            cls(data_dir, create_dataset=True)
        return time.time() - t0
    finally:
        os.chdir(old)
        sys.path.remove(REFERENCE)
        for m in list(sys.modules):
            if m.startswith("utils"):
                del sys.modules[m]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--events", type=int, default=1000, help="events per particle")
    parser.add_argument("--dataset", default="s2pg", choices=sorted(OURS))
    parser.add_argument("--skip-reference", action="store_true")
    args = parser.parse_args()

    results = {}

    def fresh_data() -> str:
        d = tempfile.mkdtemp(prefix="prep_bench_")
        write_synthetic_dataset(d, n_events_per_file=args.events, seed=0)
        return d

    if not args.skip_reference:
        d = fresh_data()
        results["reference"] = _reference(args.dataset, d)
        shutil.rmtree(d, ignore_errors=True)

    d = fresh_data()
    os.environ["PCC_NATIVE"] = "0"
    results["ours_python"] = _ours(args.dataset, d)
    shutil.rmtree(d, ignore_errors=True)

    d = fresh_data()
    os.environ.pop("PCC_NATIVE", None)
    # reset the native loader state poisoned by PCC_NATIVE=0
    import point_cloud_classifier_tpu.native as native

    native._build_failed = False
    results["ours_native"] = _ours(args.dataset, d)
    shutil.rmtree(d, ignore_errors=True)

    print(f"dataset={args.dataset} events={2 * args.events}")
    base = results.get("reference")
    for name, t in results.items():
        speed = f"  ({base / t:.1f}x vs reference)" if base and name != "reference" else ""
        print(f"  {name:12s}: {t:.1f}s{speed}")


if __name__ == "__main__":
    main()
