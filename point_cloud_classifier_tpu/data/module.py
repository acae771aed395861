"""DataModule base: offline preprocessing pipeline shared by all representations.

Semantics match the reference base class (`utils/data.py:16-188`):

- constructor knobs: ``particles`` (default proton+piM), 60/20/20 split,
  ``feature_scaling``, ``batch_size``, ``create_dataset``
- per-file pipeline: load → preprocess → global ``event_id`` offsetting →
  **file-level** stratified split (seed 42) → per-split concatenation
- a train-fit ``StandardScaler`` applied to all splits and persisted to
  ``{data_dir}/{name}/{name}_scaler.pkl`` via joblib
- event-id remapping to order-of-appearance contiguous ids

The offline stage is host-side numpy/pandas by design — it runs once and its
outputs are the accuracy-parity contract; the TPU-side work starts at the
batch iterators (``batching.py``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import joblib
import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import StandardScaler

from point_cloud_classifier_tpu.data.hdf5 import find_shower_files, load_shower_file

LABEL_MAP = {"proton": 0, "piM": 1}
SPLITS = ("train", "val", "test")


class DataModule:
    """Base preprocessing/caching module; subclasses implement representations."""

    name: str = "BASE"

    def __init__(
        self,
        data_dir: str,
        particles: Sequence[str] = ("proton", "piM"),
        create_dataset: bool = False,
        feature_scaling: bool = True,
        batch_size: int = None,
        workers: int = 1,
    ):
        self.data_dir = data_dir
        self.particles = list(particles)
        self.create_dataset = create_dataset
        self.feature_scaling = feature_scaling
        self.batch_size = batch_size
        # dataset creation: per-FILE load+preprocess fan-out across this
        # many forked processes (the files are independent; offset/split/
        # concat stay sequential so outputs are bit-identical to workers=1
        # — pinned by tests/test_data.py).  The reference pipeline is
        # strictly sequential (`utils/data.py:74-123`).
        self.workers = max(1, int(workers))
        self.data_split = (0.6, 0.2, 0.2)
        self.datasets: Dict[str, object] = {s: [] for s in SPLITS}
        # dataset creation renumbers events to contiguous ids (reference
        # `utils/data.py:156-162`); the raw-inference path turns this off so
        # predictions stay joinable to the input file's original event ids
        self.remap_event_ids = True

    # -- ingestion ---------------------------------------------------------

    def _find_files(self, particle: str) -> List[str]:
        return find_shower_files(self.data_dir, particle)

    def _load_h5py_file(self, filepath: str) -> Dict[str, np.ndarray]:
        return load_shower_file(filepath)

    # -- pipeline ----------------------------------------------------------

    def _file_jobs(self) -> List[tuple]:
        """(particle, filepath) work list in the reference's iteration order."""
        return [(p, fp) for p in self.particles for fp in self._find_files(p)]

    def _preprocess_file(self, job: tuple):
        """Load + representation-preprocess ONE file (the parallelizable stage).

        Returns ``(num_events, preprocessed)`` with file-local event ids —
        offsetting/splitting happen sequentially in the parent so the
        pipeline's outputs do not depend on ``workers``.
        """
        particle, filepath = job
        raw = self._load_h5py_file(filepath)
        num_events = len(np.unique(raw["event_id"]))
        return num_events, self._preprocess_data(raw, particle)

    def _map_files(self, jobs: List[tuple]):
        """Yield ``_preprocess_file`` results over ``jobs``, in job order,
        fanned out over ``workers``.

        Fork-based pool (re-importing the interpreter in a spawned child
        would re-run the TPU plugin registration, which can hang when the
        device transport is down; forked children run pure numpy/h5py and
        never touch jax).  Falls back to sequential when fork is
        unavailable or there is nothing to parallelize.  Results stream as
        they complete (in order), so long runs show per-file progress; a
        per-file timeout (PCC_FILE_TIMEOUT seconds, default 3600) turns a
        hung child — fork from a multi-threaded parent can in principle
        deadlock on an inherited lock — into a hard error instead of a
        silent forever-hang.  Failures carry the file they belong to.
        """
        import multiprocessing

        n = min(self.workers, len(jobs))
        if n <= 1 or "fork" not in multiprocessing.get_all_start_methods():
            for job in jobs:
                try:
                    yield self._preprocess_file(job)
                except Exception as e:
                    raise RuntimeError(f"preprocessing failed on {job[1]}") from e
            return
        ctx = multiprocessing.get_context("fork")
        from concurrent.futures import ProcessPoolExecutor

        timeout = float(os.environ.get("PCC_FILE_TIMEOUT", "3600"))
        pool = ProcessPoolExecutor(max_workers=n, mp_context=ctx)
        # NOT a with-block: __exit__ is shutdown(wait=True), which would
        # (a) join the very child whose deadlock the timeout just caught —
        # hanging forever anyway — and (b) on an ordinary failure make the
        # caller wait for every remaining submitted file before seeing the
        # error.  On any failure kill the worker processes outright, then
        # reap without waiting.
        futures = [(job, pool.submit(self._preprocess_file, job)) for job in jobs]
        try:
            for job, fut in futures:
                try:
                    yield fut.result(timeout=timeout)
                except Exception as e:
                    for _, other in futures:
                        other.cancel()
                    for proc in list(getattr(pool, "_processes", {}).values()):
                        proc.kill()
                    pool.shutdown(wait=False)
                    raise RuntimeError(
                        f"preprocessing failed (or timed out after {timeout:.0f}s "
                        f"— a forked worker can deadlock on an inherited lock; "
                        f"retry with workers=1) on {job[1]}"
                    ) from e
        finally:
            pool.shutdown(wait=False)

    def _create_dataset(self) -> None:
        """Generic per-file create→preprocess→split→concat pipeline.

        Reference `utils/data.py:74-123`: event ids are offset by the running
        number of events per file so they stay globally unique, splits happen
        at file level, then splits are concatenated across files.  The
        load+preprocess stage fans out over ``workers`` processes; the
        order-dependent bookkeeping stays sequential.
        """
        self.datasets = {s: [] for s in SPLITS}
        event_id_offset = 0

        jobs = self._file_jobs()
        for (particle, filepath), (num_events, df) in zip(jobs, self._map_files(jobs)):
            print(os.path.basename(filepath))
            df["source_file"] = os.path.basename(filepath)
            df["event_id"] = df["event_id"] + event_id_offset
            event_id_offset += num_events

            train_df, val_df, test_df = self._split_dataset(df)
            self.datasets["train"].append(train_df)
            self.datasets["val"].append(val_df)
            self.datasets["test"].append(test_df)

        for split in SPLITS:
            self.datasets[split] = pd.concat(self.datasets[split], ignore_index=True)

        # nunique() is the vectorized form of len(set(col)) — the Python
        # sets materialized millions of boxed values on large datasets
        total_events = sum(
            int(self.datasets[s]["event_id"].nunique()) for s in SPLITS
        )
        assert event_id_offset == total_events, (
            f"event bookkeeping mismatch: offset={event_id_offset} events={total_events}"
        )

        if self.feature_scaling:
            self._scale_features()
        self._save_datasets()
        for split in SPLITS:
            self.datasets[split] = self.datasets[split].drop(columns=["source_file"])

    # -- scaling -----------------------------------------------------------

    def _feature_columns(self) -> List[str]:
        ignore = {"label", "event_id", "source_file"}
        return [c for c in self.datasets["train"].columns if c not in ignore]

    def _scale_features(self, feature_cols: List[str] = None) -> None:
        """Train-fit StandardScaler over ``feature_cols``, applied to all splits.

        Persisted as joblib pickle exactly where the reference puts it
        (`utils/data.py:126-153`) so cached artifacts interoperate.
        """
        if feature_cols is None:
            feature_cols = self._feature_columns()
        print("Scaling the following columns:", feature_cols)

        scaler = StandardScaler()
        scaled = {
            "train": scaler.fit_transform(self.datasets["train"][feature_cols]),
            "val": scaler.transform(self.datasets["val"][feature_cols]),
            "test": scaler.transform(self.datasets["test"][feature_cols]),
        }
        self.scaler = scaler
        save_dir = os.path.join(self.data_dir, self.name)
        os.makedirs(save_dir, exist_ok=True)
        joblib.dump(scaler, os.path.join(save_dir, f"{self.name}_scaler.pkl"))

        for split in SPLITS:
            df = self.datasets[split].copy()
            df[feature_cols] = scaled[split]
            self.datasets[split] = df

    # -- splitting / id bookkeeping -----------------------------------------

    @staticmethod
    def _remap_event_ids(df: pd.DataFrame) -> pd.DataFrame:
        """Order-of-appearance event ids → 0..n-1 (reference `utils/data.py:156-162`)."""
        df = df.copy()
        unique_ids = df["event_id"].unique()
        mapping = {old: new for new, old in enumerate(unique_ids)}
        df["event_id"] = df["event_id"].map(mapping)
        return df

    def _split_dataset(self, dataset: pd.DataFrame):
        """Event-stratified 60/20/20 split at ``random_state=42``.

        Must call sklearn with arrays constructed exactly as the reference
        does (`utils/data.py:164-188`) so split *membership* is identical:
        first carve off test, then split val out of train with stratify
        labels aligned to the shuffled train-id order.
        """
        train_frac, val_frac, test_frac = self.data_split
        event_ids = dataset["event_id"].unique()
        event_labels = dataset.groupby("event_id")["label"].first()

        train_ids, test_ids = train_test_split(
            event_ids,
            test_size=test_frac,
            stratify=event_labels,
            random_state=42,
        )
        train_ids, val_ids = train_test_split(
            train_ids,
            test_size=val_frac / (val_frac + train_frac),
            stratify=event_labels.loc[train_ids],
            random_state=42,
        )

        train_df = dataset[dataset["event_id"].isin(train_ids)]
        val_df = dataset[dataset["event_id"].isin(val_ids)]
        test_df = dataset[dataset["event_id"].isin(test_ids)]
        return train_df, val_df, test_df

    # -- hooks for subclasses ------------------------------------------------

    def _preprocess_data(self, raw: Dict[str, np.ndarray], particle: str):
        raise NotImplementedError

    def _save_datasets(self) -> None:
        raise NotImplementedError

    def _load_dataset(self) -> None:
        raise NotImplementedError
