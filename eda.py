"""Exploratory data analysis — script equivalent of the reference notebook.

The reference ships a 29-cell ``exploratory_data_analysis.ipynb`` that
re-implements its own loaders (SURVEY §2 row 16).  This CLI produces the
same analysis artifacts headlessly, on top of the framework's ingestion
layer instead of duplicated code:

- ``summary_stats.json``       event-level stats (overall + per particle)
- ``missing_values.json``      NaN / missing-value audit of raw steps
- ``energy_distribution.png``  per-class distribution of step energies
- ``shower_3d.png``            3-D scatter of a single shower, energy-colored
- ``correlation_matrix.png``   correlation heatmap of event-level features
- ``pairplot.png``             scatter matrix over the 9 tabular features
                               (when an S2PT cache exists)

Usage: python eda.py --data-dir DATA [--out-dir eda_out] [--sample 1000]
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from point_cloud_classifier_tpu.data.hdf5 import find_shower_files, load_shower_file

PARTICLES = ("proton", "piM")
EVENT_COLS = ["total_energy", "n_steps", "n_particles", "elapsed_time"]


def _event_level(raw: dict, particle: str) -> pd.DataFrame:
    df = pd.DataFrame(
        {
            "event_id": raw["event_id"],
            "energy": raw["energy"],
            "time": raw["time"],
            "mcparticle_id": raw["mcparticle_id"],
        }
    )
    g = df.groupby("event_id")
    out = pd.DataFrame(
        {
            "total_energy": g["energy"].sum(),
            "n_steps": g.size(),
            "n_particles": g["mcparticle_id"].nunique(),
            "elapsed_time": g["time"].quantile(0.99),
        }
    ).reset_index()
    out["particle"] = particle
    return out


def load_all(data_dir: str):
    events, raws, first_raws = [], {}, {}
    for particle in PARTICLES:
        per_file = []
        for path in find_shower_files(data_dir, particle):
            raw = load_shower_file(path)
            per_file.append(raw)
            events.append(_event_level(raw, particle))
        if per_file:
            # the single-shower 3D plot needs ONE file's id space — event
            # ids restart at 0 per raw file, so selecting by id on the
            # concatenation would overlay one event from every file
            first_raws[particle] = per_file[0]
            # concatenate ALL files per particle so the missing-value audit
            # and distribution plots cover the same data as summary_stats
            raws[particle] = {
                k: np.concatenate([r[k] for r in per_file])
                for k, v in per_file[0].items()
                if isinstance(v, np.ndarray)
            }
    if not events:
        # a wrong --data-dir otherwise surfaces as pandas' cryptic
        # "No objects to concatenate"
        raise FileNotFoundError(
            f"no shower HDF5 files found under {data_dir!r} "
            f"(expected filenames containing one of {PARTICLES})"
        )
    return pd.concat(events, ignore_index=True), raws, first_raws


def summary_stats(events: pd.DataFrame, out_dir: str) -> dict:
    stats = {
        "overall": events[EVENT_COLS].agg(["mean", "median", "std", "min", "max"]).to_dict(),
        "by_particle": {
            p: sub[EVENT_COLS].agg(["mean", "median", "std"]).to_dict()
            for p, sub in events.groupby("particle")
        },
        "n_events": {p: int(n) for p, n in events["particle"].value_counts().items()},
    }
    with open(os.path.join(out_dir, "summary_stats.json"), "w") as f:
        json.dump(stats, f, indent=4, default=float)
    return stats


def missing_values(raws: dict, out_dir: str) -> dict:
    audit = {}
    for particle, raw in raws.items():
        audit[particle] = {
            k: int(np.isnan(v).sum()) if np.issubdtype(v.dtype, np.floating) else 0
            for k, v in raw.items()
            if isinstance(v, np.ndarray)
        }
    with open(os.path.join(out_dir, "missing_values.json"), "w") as f:
        json.dump(audit, f, indent=4)
    return audit


def plot_energy_distribution(raws: dict, out_dir: str) -> None:
    fig, ax = plt.subplots(figsize=(8, 5))
    all_e = np.concatenate([r["energy"] for r in raws.values()])
    bins = np.linspace(0, np.percentile(all_e, 99), 60)
    for particle, raw in raws.items():
        ax.hist(raw["energy"], bins=bins, alpha=0.55, density=True, label=particle)
    ax.set_xlabel("Step energy (MeV)")
    ax.set_ylabel("Density")
    ax.set_title("Step energy distribution (≤ p99)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "energy_distribution.png"))
    plt.close(fig)


def plot_shower_3d(raws: dict, out_dir: str) -> None:
    fig = plt.figure(figsize=(12, 5))
    for i, (particle, raw) in enumerate(sorted(raws.items())):
        first_event = raw["event_id"][0]
        sel = raw["event_id"] == first_event
        pos, energy = raw["position"][sel], raw["energy"][sel]
        ax = fig.add_subplot(1, len(raws), i + 1, projection="3d")
        sc = ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c=energy, cmap="viridis", s=14)
        ax.set_title(f"{particle} shower (event {first_event})")
        fig.colorbar(sc, ax=ax, shrink=0.6, label="energy")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "shower_3d.png"))
    plt.close(fig)


def plot_correlation(events: pd.DataFrame, out_dir: str) -> None:
    corr = events[EVENT_COLS].corr()
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(corr.to_numpy(), cmap="coolwarm", vmin=-1, vmax=1)
    ax.set_xticks(range(len(EVENT_COLS)), EVENT_COLS, rotation=45, ha="right")
    ax.set_yticks(range(len(EVENT_COLS)), EVENT_COLS)
    for (i, j), v in np.ndenumerate(corr.to_numpy()):
        ax.text(j, i, f"{v:.2f}", ha="center", va="center")
    fig.colorbar(im)
    ax.set_title("Event-level feature correlation")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "correlation_matrix.png"))
    plt.close(fig)


def plot_energy_vs_hits(data_dir: str, out_dir: str) -> bool:
    """Reference `utils/plots.py:6-34` scatter over the cached S2PT frame."""
    cache = os.path.join(data_dir, "S2PT", "train", "S2PT_train.npz")
    if not os.path.exists(cache):
        return False
    from point_cloud_classifier_tpu.utils.plots import plot_data

    data = np.load(cache)
    df = pd.DataFrame(
        {
            "energy_total": data["energy_total"],
            "hits_total": data["hits_total"],
            "label": data["label"],
        }
    )
    plot_data(df, save_dir=out_dir)
    return True


def plot_pairplot(data_dir: str, out_dir: str, sample: int) -> bool:
    """Scatter matrix over the 9 engineered tabular features (S2PT cache)."""
    cache = os.path.join(data_dir, "S2PT", "train", "S2PT_train.npz")
    if not os.path.exists(cache):
        return False
    data = np.load(cache)
    cols = [k for k in data.files if k not in ("event_id", "label")]
    df = pd.DataFrame({k: data[k] for k in cols})
    labels = data["label"]
    if len(df) > sample:
        idx = np.random.default_rng(42).choice(len(df), sample, replace=False)
        df, labels = df.iloc[idx], labels[idx]
    axes = pd.plotting.scatter_matrix(
        df, figsize=(16, 16), diagonal="hist",
        c=np.where(labels == 0, "tab:blue", "tab:orange"), alpha=0.5, s=8,
    )
    for ax in axes.ravel():
        ax.xaxis.label.set_rotation(30)
        ax.yaxis.label.set_rotation(60)
        ax.yaxis.label.set_ha("right")
    plt.suptitle("S2PT feature pairplot (blue=proton, orange=piM)")
    plt.savefig(os.path.join(out_dir, "pairplot.png"))
    plt.close("all")
    return True


def run_eda(data_dir: str, out_dir: str, sample: int = 1000) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    events, raws, first_raws = load_all(data_dir)
    stats = summary_stats(events, out_dir)
    audit = missing_values(raws, out_dir)
    plot_energy_distribution(raws, out_dir)
    plot_shower_3d(first_raws, out_dir)
    plot_correlation(events, out_dir)
    plot_energy_vs_hits(data_dir, out_dir)
    plot_pairplot(data_dir, out_dir, sample)
    print(f"EDA artifacts written to {out_dir}")
    return {"stats": stats, "missing": audit}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="exploratory data analysis")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--out-dir", default="eda_out")
    parser.add_argument("--sample", type=int, default=1000)
    args = parser.parse_args(argv)
    run_eda(args.data_dir, args.out_dir, args.sample)


if __name__ == "__main__":
    main()
