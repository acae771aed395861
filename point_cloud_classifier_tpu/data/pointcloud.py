"""Point-cloud representation (S2PPC): per-hit features, per-event normalized.

Reference semantics (`utils/data.py:411-690`):

- per-hit columns: energy, position x/y/z, time
- optional ``energy_cutoff`` filter (hits with energy below cutoff dropped,
  `:505-507`) applied *before* any normalization
- per-event normalization: energy → fraction of event total (`:510-516`),
  time → min-max per event with +1e-8 (`:519-521`), positions standardized
  per event with **energy-fraction-weighted** mean/std (`:524-535`)
- a global train-fit StandardScaler on the energy column only (`:550-576`)
- feature vector fed to DeepSets (canonical loaded-cache order,
  `utils/data.py:633-642`): [energy, energy_total, position_x, position_y,
  position_z, time] — input_dim 6 (configs/deep_sets.yaml)
- sharded ``.npz`` cache keyed by source-file part number; ``parts`` limits
  how many shards are loaded
- event-level stratified split (base class)

Normalization math is vectorized numpy; the ragged sparse collate is replaced
by the static-shape :class:`~point_cloud_classifier_tpu.data.batching.PointCloudLoader`.
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np
import pandas as pd

from point_cloud_classifier_tpu.data.batching import PointCloudLoader
from point_cloud_classifier_tpu.data.hdf5 import parse_part_number
from point_cloud_classifier_tpu.data.module import LABEL_MAP, SPLITS, DataModule

FEATURE_COLS = ["energy", "energy_total", "position_x", "position_y", "position_z", "time"]


def frame_to_point_loader(
    df,
    batch_size: int,
    shuffle: bool,
    transfer_dtype: str = "float32",
    seg_encoding: str = "ids",
    factor_event_cols=(),
    bucket_factor: float = 2.0,
    length_sorted: bool = False,
    layout: str = "flat",
):
    """Per-hit frame → (PointCloudLoader, event ids in loader order).

    Rows group by event in order of first appearance (the reference wrapper
    iterates ``df["event_id"].unique()``, `utils/data.py:452`).  Shared by
    the cached-split loaders and the raw-inference path.
    """
    feature_cols = [c for c in df.columns if c not in ("label", "event_id")]
    event_ids = df["event_id"].to_numpy()
    uniq, first_idx, inv = np.unique(event_ids, return_index=True, return_inverse=True)
    appearance_order = np.argsort(first_idx, kind="stable")

    feats_all = df[feature_cols].to_numpy(dtype=np.float32)
    labels_all = df["label"].to_numpy()
    order = np.argsort(inv, kind="stable")
    boundaries = np.concatenate([[0], np.cumsum(np.bincount(inv, minlength=len(uniq)))])

    event_features, labels, ordered_ids = [], [], []
    for e in appearance_order:
        rows = order[boundaries[e] : boundaries[e + 1]]
        event_features.append(feats_all[rows])
        labels.append(labels_all[rows[0]])
        ordered_ids.append(uniq[e])
    loader = PointCloudLoader(
        event_features,
        np.asarray(labels),
        batch_size=batch_size,
        shuffle=shuffle,
        transfer_dtype=transfer_dtype,
        seg_encoding=seg_encoding,
        factor_event_cols=factor_event_cols,
        bucket_factor=bucket_factor,
        length_sorted=length_sorted,
        layout=layout,
    )
    return loader, np.asarray(ordered_ids)


def _segment_stats(values: np.ndarray, inv: np.ndarray, n_seg: int):
    """(sum, count) per segment."""
    return (
        np.bincount(inv, weights=values, minlength=n_seg),
        np.bincount(inv, minlength=n_seg),
    )


class Step2PointPointCloud(DataModule):
    name = "S2PPC"

    def __init__(
        self,
        data_dir: str,
        parts: int = None,
        sparse_batching: bool = True,
        energy_cutoff: float = None,
        transfer_dtype: str = "float32",
        seg_encoding: str = "ids",
        factor_event_cols=(),
        bucket_factor: float = 2.0,
        length_sorted: bool = False,
        layout: str = "flat",
        load_cache: bool = True,
        **kwargs,
    ):
        super().__init__(data_dir=data_dir, **kwargs)
        self.transfer_dtype = transfer_dtype
        self.seg_encoding = seg_encoding
        self.factor_event_cols = tuple(factor_event_cols)
        self.bucket_factor = bucket_factor
        self.length_sorted = length_sorted
        # "dense"/"auto": per-cloud-row wire (see PointCloudLoader.layout);
        # config key dataset.layout
        self.layout = layout
        self.parts = parts
        self.sparse_batching = sparse_batching  # kept for config compat; the
        # static-shape flattened layout subsumes both reference collates
        self.energy_cutoff = energy_cutoff
        if self.create_dataset:
            print("Creating Step2PointPointCloud (S2PPC) dataset")
            self._create_dataset()
        elif load_cache:
            self._load_dataset()
        # load_cache=False: preprocessing-only instance (raw inference path)

    # -- preprocessing -------------------------------------------------------

    def _preprocess_data(self, raw: Dict[str, np.ndarray], particle: str) -> pd.DataFrame:
        energy = raw["energy"].astype(np.float64)
        time = raw["time"].astype(np.float64)
        pos = raw["position"].astype(np.float64)
        event_id = raw["event_id"]

        print("Length before:", len(energy))
        if self.energy_cutoff:
            keep = energy >= self.energy_cutoff
            energy, time, pos, event_id = energy[keep], time[keep], pos[keep], event_id[keep]
        print("Length after:", len(energy))

        uniq, inv = np.unique(event_id, return_inverse=True)
        n_ev = len(uniq)

        # energy → fraction of (post-cutoff) event total; the raw total is
        # kept as its own feature
        etot_sum, _ = _segment_stats(energy, inv, n_ev)
        energy_total = etot_sum[inv]
        energy_frac = energy / energy_total

        # per-event min-max time
        tmin = np.full(n_ev, np.inf)
        tmax = np.full(n_ev, -np.inf)
        np.minimum.at(tmin, inv, time)
        np.maximum.at(tmax, inv, time)
        time_norm = (time - tmin[inv]) / (tmax[inv] - tmin[inv] + 1e-8)

        # energy-fraction-weighted standardization of each coordinate
        # (reference weights with the already-normalized energy column,
        # utils/data.py:527-533)
        w = energy_frac
        w_sum, _ = _segment_stats(w, inv, n_ev)
        pos_norm = np.empty_like(pos)
        for c in range(3):
            mean_c = np.bincount(inv, weights=w * pos[:, c], minlength=n_ev) / w_sum
            var_c = (
                np.bincount(inv, weights=w * (pos[:, c] - mean_c[inv]) ** 2, minlength=n_ev)
                / w_sum
            )
            std_c = np.sqrt(var_c)
            pos_norm[:, c] = (pos[:, c] - mean_c[inv]) / (std_c[inv] + 1e-8)

        df = pd.DataFrame(
            {
                "event_id": event_id,
                "energy": energy_frac,
                "energy_total": energy_total,
                "position_x": pos_norm[:, 0],
                "position_y": pos_norm[:, 1],
                "position_z": pos_norm[:, 2],
                "time": time_norm,
                "label": LABEL_MAP[particle],
            }
        )
        if getattr(self, "remap_event_ids", True):
            df = self._remap_event_ids(df)
        if df.isna().any().any():
            print("There are NaN values in the dataset!")
        else:
            print("No NaN values detected.")
        return df

    # -- scaling: global StandardScaler on energy only ------------------------

    def _scale_features(self) -> None:
        super()._scale_features(feature_cols=["energy"])

    # -- sharded cache --------------------------------------------------------

    def _split_dir(self, split: str) -> str:
        return os.path.join(self.data_dir, self.name, split)

    def _save_datasets(self) -> None:
        for split in SPLITS:
            df = self.datasets[split]
            save_dir = self._split_dir(split)
            os.makedirs(save_dir, exist_ok=True)
            print(f"Saving {split} dataset")
            # parse each filename once — re-applying the parser per part
            # would be O(parts x rows) string parsing
            part_col = df["source_file"].map(parse_part_number)
            by_part = {
                part: df[part_col == part] for part in sorted(part_col.unique())
            }
            for part, sel in by_part.items():
                np.savez(
                    os.path.join(save_dir, f"{self.name}_{split}_{part}.npz"),
                    event_id=sel["event_id"].to_numpy(),
                    energy=sel["energy"].to_numpy(),
                    energy_total=sel["energy_total"].to_numpy(),
                    position_x=sel["position_x"].to_numpy(),
                    position_y=sel["position_y"].to_numpy(),
                    position_z=sel["position_z"].to_numpy(),
                    time=sel["time"].to_numpy(),
                    label=sel["label"].to_numpy(),
                )
            print("Finished saving data")

    def _load_dataset(self) -> None:
        for split in SPLITS:
            pattern = os.path.join(self._split_dir(split), f"{self.name}_{split}_*.npz")
            paths = sorted(glob.glob(pattern))
            if self.parts:
                paths = paths[: self.parts]
            if not paths:
                raise FileNotFoundError(f"No files found for pattern: {pattern}")
            print(f"Loading {split} dataset from {len(paths)} files")
            frames = []
            for path in paths:
                data = np.load(path)
                frames.append(
                    pd.DataFrame(
                        {
                            "event_id": data["event_id"],
                            "energy": data["energy"],
                            "energy_total": data["energy_total"],
                            "position_x": data["position_x"],
                            "position_y": data["position_y"],
                            "position_z": data["position_z"],
                            "time": data["time"],
                            "label": data["label"],
                        }
                    )
                )
            self.datasets[split] = pd.concat(frames, ignore_index=True)
        print("Finished loading datasets")

    # -- loaders ----------------------------------------------------------------

    def _make_loader(self, split: str) -> PointCloudLoader:
        loader, _ = frame_to_point_loader(
            self.datasets[split],
            batch_size=self.batch_size,
            shuffle=(split == "train"),
            transfer_dtype=self.transfer_dtype,
            seg_encoding=self.seg_encoding,
            factor_event_cols=self.factor_event_cols,
            bucket_factor=self.bucket_factor,
            length_sorted=self.length_sorted and split == "train",
            layout=self.layout,
        )
        return loader

    def get_train_loader(self) -> PointCloudLoader:
        return self._make_loader("train")

    def get_val_loader(self) -> PointCloudLoader:
        return self._make_loader("val")

    def get_test_loader(self) -> PointCloudLoader:
        return self._make_loader("test")
