"""Raw-file inference pipeline: HDF5 in, batched loader out.

The reference has no serving path — its closest surface scores the cached
test split (`train.py:88-139`).  This module runs the full preprocessing of
any representation on a *raw* shower file at inference time, applying the
scalers persisted during dataset creation (``{data_dir}/{NAME}/
{NAME}_scaler.pkl``, reference `utils/data.py:143,566,1086`) instead of
refitting, and returns a label-free loader plus the event ids in loader
order.  Used by ``train.py infer-raw``.
"""

from __future__ import annotations

import os
from typing import Tuple

import joblib
import numpy as np

from point_cloud_classifier_tpu.data.batching import GraphLoader
from point_cloud_classifier_tpu.data.graph import (
    Step2PointGraph,
    scale_positions_inplace,
)
from point_cloud_classifier_tpu.data.hdf5 import load_shower_file
from point_cloud_classifier_tpu.data.pointcloud import (
    Step2PointPointCloud,
    frame_to_point_loader,
)
from point_cloud_classifier_tpu.data.tabular import FEATURE_ORDER, Step2PointTabular


def _load_scaler(data_dir: str, name: str):
    path = os.path.join(data_dir, name, f"{name}_scaler.pkl")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Fitted scaler not found at {path}; run dataset creation first"
        )
    return joblib.load(path)


def _ds_kwargs(config: dict) -> dict:
    kwargs = dict(config["dataset"])
    kwargs.pop("create_dataset", None)
    return kwargs


def inference_loader(dataset_name: str, config: dict, raw_path: str) -> Tuple[object, np.ndarray]:
    """(loader-or-frame, event_ids) for a raw shower file.

    The first element matches what the corresponding model consumes: a
    DataFrame for ``s2pt`` with ``convert_to_tensor: false`` (sklearn-style
    LogRegression), a batched loader otherwise.  Labels are dummy zeros.
    """
    raw = load_shower_file(raw_path)
    dataset_name = dataset_name.lower()

    if dataset_name == "s2pt":
        module = Step2PointTabular(load_cache=False, **_ds_kwargs(config))
        module.remap_event_ids = False  # keep the input file's event ids
        df = module._preprocess_data(raw, particle="proton")  # dummy label
        df = df.copy()
        if module.feature_scaling:
            scaler = _load_scaler(module.data_dir, module.name)
            df[FEATURE_ORDER] = scaler.transform(df[FEATURE_ORDER])
        event_ids = df["event_id"].to_numpy()
        if not module.convert_to_tensor:
            return df.drop(columns=["event_id"]), event_ids
        from point_cloud_classifier_tpu.data.batching import TabularLoader

        X = df[FEATURE_ORDER].to_numpy()
        loader = TabularLoader(
            X, np.zeros(len(X)), module.batch_size, shuffle=False
        )
        return loader, event_ids

    if dataset_name == "s2ppc":
        module = Step2PointPointCloud(load_cache=False, **_ds_kwargs(config))
        module.remap_event_ids = False
        df = module._preprocess_data(raw, particle="proton")
        df = df.copy()
        if module.feature_scaling:
            scaler = _load_scaler(module.data_dir, module.name)
            df[["energy"]] = scaler.transform(df[["energy"]])
        # forward the full wire contract from the trained config — a model
        # trained with factored event columns requires the 'event_feats'
        # key in every batch (deep_sets.py factored_cols), and the layout/
        # bucket knobs keep serving batches on the same wire the model was
        # validated on (mirrors Step2PointPointCloud._make_loader)
        return frame_to_point_loader(
            df,
            batch_size=module.batch_size,
            shuffle=False,
            transfer_dtype=module.transfer_dtype,
            seg_encoding=module.seg_encoding,
            factor_event_cols=module.factor_event_cols,
            bucket_factor=module.bucket_factor,
            layout=module.layout,
        )

    if dataset_name == "s2pg":
        module = Step2PointGraph(**_ds_kwargs(config))
        module.remap_event_ids = False
        graphs = module._preprocess_data(raw, particle="proton")
        if module.feature_scaling:
            scaler = _load_scaler(module.data_dir, module.name)
            for g in graphs:
                g["features"] = scale_positions_inplace(
                    np.asarray(g["features"], dtype=np.float64)
                )
                g["features"][:, 0:1] = scaler.transform(g["features"][:, 0:1])
        # same wire contract as Step2PointGraph's cached-split loaders:
        # serving batches ride the layout the model was trained/validated
        # on (dense GAT on a flat wire would be correct but ~40x slower,
        # and fused_inrow configs need the out-row wire)
        loader = GraphLoader(
            graphs,
            batch_size=module.batch_size,
            shuffle=False,
            use_weights=module.use_weights,
            n_features=module.n_features,
            transfer_dtype=module.transfer_dtype,
            seg_encoding=module.seg_encoding,
            layout=module.graph_layout,
            emit_out_rows=module.emit_out_rows,
            dense_w_is_existence=module.dense_w_is_existence,
            require_inrow=module.require_inrow,
        )
        return loader, np.asarray([g["event_id"] for g in graphs])

    raise ValueError(f"Unknown dataset: {dataset_name}")
