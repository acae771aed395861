"""Tabular representation (S2PT): 9 engineered event-level features.

Reference semantics (`utils/data.py:191-408`):

- subdetector → {HCal, ECal, Other}; Other rows dropped (`:227-238`)
- per-event aggregates: ``n_particles`` (distinct MC pids), ``elapsed_time``
  (99th percentile of step times), energy-weighted x/y/z centroid (`:241-247`)
- HCal/ECal energy and hit-count sums, combined into the 9-feature vector
  energy_total, hits_total, energy_hcal_frac, hits_hcal_frac, n_particles,
  elapsed_time, energy_weighted_{x,y,z} (`:276-295`)
- label: proton → 0, piM → 1
- row-stratified 60/20/20 split at seed 42 (`:390-408` — note: *row*-level,
  unlike the event-level split of the other representations)
- one ``.npz`` per split; loaders return a DataFrame, or a fixed-shape batch
  iterator when ``convert_to_tensor=True``

The aggregation here is vectorized numpy (np.unique + bincount) rather than
pandas groupby-apply — same math, orders of magnitude faster on large files.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from point_cloud_classifier_tpu.data.batching import TabularLoader
from point_cloud_classifier_tpu.data.hdf5 import decode_subdetectors, detector_category
from point_cloud_classifier_tpu.data.npz_io import load_npz, save_npz
from point_cloud_classifier_tpu.data.module import LABEL_MAP, SPLITS, DataModule

FEATURE_ORDER = [
    "energy_total",
    "hits_total",
    "energy_hcal_frac",
    "hits_hcal_frac",
    "energy_weighted_x",
    "energy_weighted_y",
    "energy_weighted_z",
    "n_particles",
    "elapsed_time",
]

# Canonical column order = the reference's *loaded-from-cache* frame
# (utils/data.py:341-353), which is what training always consumes.  (The
# reference's create-path frame orders n_particles/elapsed_time before the
# centroids — an internal inconsistency that never reaches training; we use
# one order for both paths.  Split membership is unaffected: sklearn's
# stratified shuffle depends only on row count and labels.)
COLUMN_ORDER = [
    "event_id",
    "energy_total",
    "hits_total",
    "energy_hcal_frac",
    "hits_hcal_frac",
    "energy_weighted_x",
    "energy_weighted_y",
    "energy_weighted_z",
    "n_particles",
    "elapsed_time",
    "label",
]


class Step2PointTabular(DataModule):
    name = "S2PT"

    def __init__(
        self,
        data_dir: str,
        convert_to_tensor: bool = False,
        load_cache: bool = True,
        **kwargs,
    ):
        super().__init__(data_dir=data_dir, **kwargs)
        self.convert_to_tensor = convert_to_tensor
        if self.create_dataset:
            print("Creating Step2PointTabular (S2PT) dataset")
            self._create_dataset()
        elif load_cache:
            self._load_dataset()
        # load_cache=False: preprocessing-only instance (raw inference path)

    # -- preprocessing -------------------------------------------------------

    def _preprocess_data(self, raw: Dict[str, np.ndarray], particle: str) -> pd.DataFrame:
        names = decode_subdetectors(raw["subdetector"])
        category = detector_category(names)
        keep = category != "Other"
        n_other = int((~keep).sum())
        if n_other:
            print(f"Unknown detector part encountered. Count: {n_other}")

        event_id = raw["event_id"][keep]
        energy = raw["energy"][keep].astype(np.float64)
        time = raw["time"][keep].astype(np.float64)
        pos = raw["position"][keep].astype(np.float64)
        pid = raw["mcparticle_id"][keep]
        is_hcal = category[keep] == "HCal"

        # group rows by event (sorted unique ids — the reference's groupby +
        # outer-merge pipeline also yields event-id-sorted rows)
        uniq_events, inv = np.unique(event_id, return_inverse=True)
        n_ev = len(uniq_events)

        energy_hcal = np.bincount(inv, weights=np.where(is_hcal, energy, 0.0), minlength=n_ev)
        energy_ecal = np.bincount(inv, weights=np.where(is_hcal, 0.0, energy), minlength=n_ev)
        hits_hcal = np.bincount(inv, weights=is_hcal.astype(np.float64), minlength=n_ev)
        hits_ecal = np.bincount(inv, weights=(~is_hcal).astype(np.float64), minlength=n_ev)
        energy_total = energy_hcal + energy_ecal
        hits_total = hits_hcal + hits_ecal

        # energy-weighted centroid
        w_sum = np.bincount(inv, weights=energy, minlength=n_ev)
        cx = np.bincount(inv, weights=energy * pos[:, 0], minlength=n_ev) / w_sum
        cy = np.bincount(inv, weights=energy * pos[:, 1], minlength=n_ev) / w_sum
        cz = np.bincount(inv, weights=energy * pos[:, 2], minlength=n_ev) / w_sum

        # distinct MC particles per event
        ev_pid = np.unique(np.stack([event_id, pid], axis=1), axis=0)
        n_particles = np.bincount(
            np.searchsorted(uniq_events, ev_pid[:, 0]), minlength=n_ev
        ).astype(np.int64)

        # 99th percentile of step time per event (linear interpolation,
        # matching np.percentile defaults used at utils/data.py:243)
        order = np.argsort(inv, kind="stable")
        sorted_time_by_event = time[order]
        boundaries = np.concatenate([[0], np.cumsum(np.bincount(inv, minlength=n_ev))])
        elapsed = np.empty(n_ev)
        for e in range(n_ev):
            elapsed[e] = np.percentile(
                sorted_time_by_event[boundaries[e] : boundaries[e + 1]], 99
            )

        df = pd.DataFrame(
            {
                "event_id": uniq_events,
                "energy_total": energy_total,
                "hits_total": hits_total,
                "energy_hcal_frac": energy_hcal / energy_total,
                "hits_hcal_frac": hits_hcal / hits_total,
                "n_particles": n_particles,
                "elapsed_time": elapsed,
                "energy_weighted_x": cx,
                "energy_weighted_y": cy,
                "energy_weighted_z": cz,
                "label": LABEL_MAP[particle],
            }
        )[COLUMN_ORDER]

        if getattr(self, "remap_event_ids", True):
            df = self._remap_event_ids(df)
        if df.isna().any().any():
            print("There are NaN values in the dataset!")
        else:
            print("No NaN values detected.")
        return df

    # -- split (row-level for tabular, reference utils/data.py:390-408) ------

    def _split_dataset(self, dataset: pd.DataFrame):
        train_frac, val_frac, test_frac = self.data_split
        train_df, test_df = train_test_split(
            dataset, test_size=test_frac, stratify=dataset["label"], random_state=42
        )
        train_df, val_df = train_test_split(
            train_df,
            test_size=val_frac / (train_frac + val_frac),
            stratify=train_df["label"],
            random_state=42,
        )
        return train_df, val_df, test_df

    # -- cache ---------------------------------------------------------------

    def _split_path(self, split: str) -> str:
        return os.path.join(self.data_dir, self.name, split, f"{self.name}_{split}.npz")

    def _save_datasets(self) -> None:
        for split in SPLITS:
            df = self.datasets[split]
            print(f"Saving {split} dataset")
            path = self._split_path(split)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # data/npz_io: one-syscall STORED-zip write, np.load-interop
            # pinned by tests/test_npz_io.py (same helper data/graph.py
            # uses — round-5 review: keep the cache IO on one code path)
            save_npz(
                path,
                event_id=df["event_id"].to_numpy(),
                label=df["label"].to_numpy(),
                **{k: df[k].to_numpy() for k in FEATURE_ORDER},
            )
        print("Finished saving data")

    def _load_dataset(self) -> None:
        for split in SPLITS:
            path = self._split_path(split)
            if not os.path.exists(path):
                raise FileNotFoundError(f"Required file is missing: {path}")
            print(f"Loading {split} dataset from {path}")
            data = load_npz(path)
            # column layout matches the reference's loaded frame
            # (utils/data.py:341-353): features then label
            self.datasets[split] = pd.DataFrame(
                {
                    "event_id": data["event_id"],
                    "energy_total": data["energy_total"],
                    "hits_total": data["hits_total"],
                    "energy_hcal_frac": data["energy_hcal_frac"],
                    "hits_hcal_frac": data["hits_hcal_frac"],
                    "energy_weighted_x": data["energy_weighted_x"],
                    "energy_weighted_y": data["energy_weighted_y"],
                    "energy_weighted_z": data["energy_weighted_z"],
                    "n_particles": data["n_particles"],
                    "elapsed_time": data["elapsed_time"],
                    "label": data["label"],
                }
            )
        print("Finished loading datasets")

    # -- loaders ---------------------------------------------------------------

    def _get_loader(self, split: str):
        df = self.datasets[split]
        if "event_id" in df.columns:
            df = df.drop(columns=["event_id"])
            self.datasets[split] = df
        if not self.convert_to_tensor:
            return df
        X = df.drop(columns=["label"]).to_numpy()
        y = df["label"].to_numpy()
        return TabularLoader(X, y, self.batch_size, shuffle=(split == "train"))

    def get_train_loader(self):
        return self._get_loader("train")

    def get_val_loader(self):
        return self._get_loader("val")

    def get_test_loader(self):
        return self._get_loader("test")
