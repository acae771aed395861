"""Graph representation (S2PG): one lineage graph per event, built offline.

Reference semantics (`utils/data.py:693-1261`), reproduced exactly because
edge structure gates accuracy parity:

- steps sorted by (event, pid, time); ``step_key`` = rank within event
  (`:731-732`)
- a synthetic "incident particle" node (energy 0, origin, time 0, pid of the
  primary) appended with the highest step_key so the graph is connected
  (`:746-765`)
- **temporal edges**: consecutive time-sorted steps of the same particle
  (`:865-873`)
- **parent edges**: for each particle, BFS to its nearest *recorded*
  ancestors (particles that left steps), connecting all of the child's
  earliest-time steps to all of each ancestor's steps closest in time to that
  minimum (`:876-909`, BFS with memo cache `:932-973` — including its
  cache-seeding side effects, which can produce duplicate ancestor entries
  and therefore duplicate edges; we reproduce that)
- all edges stored bidirectionally; in-degree sanity asserts (`:914-927`)
- node features ``[energy/event_total, x, y, z]`` (`:808-813`)
- Gaussian edge weights with median-distance bandwidth, computed on raw
  positions before scaling (`:835-845`)
- dataset-level scaling: per-graph energy-weighted position standardization +
  global train-fit StandardScaler on the energy column (`:1059-1090`)
- graph-stratified 60/20/20 split at seed 42; one ``.npz`` per graph
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List

import joblib
import numpy as np
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import StandardScaler

from point_cloud_classifier_tpu.data.batching import GraphLoader
from point_cloud_classifier_tpu.data.module import LABEL_MAP, SPLITS, DataModule


def nearest_recorded_ancestors(
    pid: int,
    recorded: frozenset,
    parent_map: Dict[int, List[int]],
    cache: Dict[int, List[int]],
) -> List[int]:
    """Nearest ancestors of ``pid`` that actually left steps.

    BFS upward through the MC-truth tree; a recorded ancestor terminates its
    branch, an unrecorded one expands to its own parents.  The memo ``cache``
    persists across calls within one event.  Reference `utils/data.py:932-973`
    including its two side channels: (a) unrecorded ancestors consult the
    cache, (b) finding a recorded ancestor seeds the cache for every
    single-parent child of it — both can yield duplicate entries in the
    result, which downstream become duplicate edges (reproduced for parity).
    """
    if pid in cache:
        return cache[pid]

    collected: List[int] = []
    visited = set()
    queue = list(parent_map.get(pid, []))

    while queue:
        cur = int(queue.pop(0))
        if cur in visited:
            continue
        visited.add(cur)

        if cur not in recorded:
            if cur in cache:
                collected.extend(cache[cur])
            else:
                queue.extend(parent_map.get(cur, []))
        else:
            collected.append(cur)
            for child, parents in parent_map.items():
                if cur in parents and child not in cache and len(parents) == 1:
                    cache[child] = [cur]

    if collected:
        cache[pid] = collected
    return collected


def build_event_edges(
    pids: np.ndarray,
    times: np.ndarray,
    step_keys: np.ndarray,
    parent_map: Dict[int, List[int]],
) -> np.ndarray:
    """Edge list [2, 2E] (bidirectional) for one event's step arrays.

    Arrays include the synthetic incident node (last row).  Semantics mirror
    the reference's ``_find_edges`` (`utils/data.py:847-929`).
    """
    unique_pids = np.unique(pids)
    recorded = frozenset(int(p) for p in unique_pids)
    # index lists per pid, ascending array position (reference indices_map)
    indices_map = {int(p): np.nonzero(pids == p)[0] for p in unique_pids}

    cache: Dict[int, List[int]] = {}
    edges_time: List[tuple] = []
    edges_parent: List[tuple] = []

    for child_pid in unique_pids:
        child_pid = int(child_pid)
        child_idxs = indices_map[child_pid]
        # temporal chain over this particle's steps (np.argsort default kind,
        # matching the reference's tie behavior)
        child_sorted = child_idxs[np.argsort(times[child_idxs])]
        for a, b in zip(child_sorted[:-1], child_sorted[1:]):
            edges_time.append((step_keys[a], step_keys[b]))

        ancestors = nearest_recorded_ancestors(child_pid, recorded, parent_map, cache)
        if not ancestors:
            if child_pid != 0:
                print(f"No parents exist for particle {child_pid}")
            continue

        child_times = times[child_idxs]
        min_time = child_times.min()
        child_targets = step_keys[child_idxs[np.nonzero(child_times == min_time)[0]]]

        for parent_pid in ancestors:
            cand_idxs = indices_map[int(parent_pid)]
            deltas = np.abs(times[cand_idxs] - min_time)
            parent_sources = step_keys[cand_idxs[np.nonzero(deltas == deltas.min())[0]]]
            for target in child_targets:
                for source in parent_sources:
                    edges_parent.append((source, target))

    directed = edges_time + edges_parent

    incident_key = int(step_keys[-1])
    in_degree = np.zeros(incident_key + 1, dtype=np.int64)
    bidirectional = np.empty((2 * len(directed), 2), dtype=np.int64)
    for i, (s, t) in enumerate(directed):
        bidirectional[2 * i] = (s, t)
        bidirectional[2 * i + 1] = (t, s)
        in_degree[t] += 1

    assert in_degree[incident_key] == 0, "Incident particle has parents, which should not happen"
    unconnected = np.nonzero(in_degree[:-1] == 0)[0]
    assert len(unconnected) == 0, f"{len(unconnected)} nodes with no parents found"

    return bidirectional.T


def gaussian_edge_weights(features: np.ndarray, edges: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """exp(-d²/2σ²) with σ = median endpoint distance + eps (`utils/data.py:835-845`)."""
    positions = features[:, 1:4]
    d = np.linalg.norm(positions[edges[0]] - positions[edges[1]], axis=1)
    sigma = np.median(d) + eps
    return np.exp(-(d**2) / (2 * sigma**2)).astype(np.float32)


def scale_positions_inplace(features: np.ndarray) -> np.ndarray:
    """Per-graph energy-weighted standardization of columns 1:4 (`:1059-1068`)."""
    position = features[:, 1:4]
    energy = features[:, 0:1]
    mean = (position * energy).sum(axis=0) / (energy.sum() + 1e-8)
    std = np.sqrt((energy * (position - mean) ** 2).sum(axis=0) / (energy.sum() + 1e-8))
    features[:, 1:4] = (position - mean) / (std + 1e-8)
    return features


class Step2PointGraph(DataModule):
    name = "S2PG"

    def __init__(
        self,
        data_dir: str,
        n_features: int = 4,
        parts: int = None,
        use_weights: bool = True,
        transfer_dtype: str = "float32",
        seg_encoding: str = "ids",
        graph_layout: str = "flat",
        length_sorted: bool = False,
        emit_out_rows: bool = False,
        dense_w_is_existence: bool = False,
        require_inrow: bool = False,
        flat_if_multigraph: bool = False,
        **kwargs,
    ):
        super().__init__(data_dir=data_dir, **kwargs)
        self.transfer_dtype = transfer_dtype
        self.seg_encoding = seg_encoding
        # similar-size graphs per batch (train split only): quadratic
        # adjacency-size savings for the dense layout
        self.length_sorted = length_sorted
        # out-row wire for GraphNet.fused_inrow's backward (see
        # data/batching.GraphLoader)
        self.emit_out_rows = emit_out_rows
        # "dense"/"auto": batched adjacency-matrix batches (message passing
        # as MXU matmuls, no gather/scatter) — see data/batching.GraphLoader
        self.graph_layout = graph_layout
        # GAT + use_weights: dense edge existence is w != 0, so the loader
        # checks for exact-zero wire weights and demotes to flat only when
        # one exists (data/batching.GraphLoader)
        self.dense_w_is_existence = dense_w_is_existence
        # dense max pooling: only full-in-row dense batches are digestible;
        # degree-outlier batches ship the flat wire (data/batching)
        self.require_inrow = require_inrow
        # GAT/SAG: dense attention/score semantics count a merged
        # duplicate edge once — demote to flat iff a duplicate exists
        # (data/batching.GraphLoader)
        self.flat_if_multigraph = flat_if_multigraph
        self.n_features = n_features
        self.parts = parts
        self.use_weights = use_weights
        if self.create_dataset:
            print("Creating Step2PointGraph (S2PG) dataset")
            self._create_dataset()
        # note: like the reference (`utils/data.py:708-710`), nothing is
        # loaded eagerly otherwise — loaders read the on-disk per-graph cache

    # -- per-event graph construction ----------------------------------------

    def _preprocess_data(self, raw: Dict[str, np.ndarray], particle: str) -> List[Dict]:
        # sort steps by (event, pid, time) — stable lexsort, matching pandas
        # multi-key sort_values (`utils/data.py:731`)
        order = np.lexsort((raw["time"], raw["mcparticle_id"], raw["event_id"]))
        ev = raw["event_id"][order]
        pid = raw["mcparticle_id"][order].astype(np.int64)
        time = raw["time"][order].astype(np.float64)
        energy = raw["energy"][order].astype(np.float64)
        pos = raw["position"][order].astype(np.float64)

        p_ev = raw["particle_event_id"]
        p_id = raw["particle_id"].astype(np.int64)
        p_parent = raw["parent_id"].astype(np.int64)

        uniq_events = np.unique(ev)
        ev_bounds = np.searchsorted(ev, uniq_events)
        ev_bounds = np.append(ev_bounds, len(ev))

        label = LABEL_MAP[particle]
        graphs: List[Dict] = []

        for e_i, event in enumerate(uniq_events):
            lo, hi = ev_bounds[e_i], ev_bounds[e_i + 1]
            n_steps = hi - lo

            # MC-truth rows for this event
            p_sel = p_ev == event
            ev_pids = p_id[p_sel]
            ev_parents = p_parent[p_sel]

            incident = ev_pids[ev_parents == -1]
            assert len(incident) == 1, (
                f"Event {event}: expected 1 primary particle, found {len(incident)}"
            )
            assert incident[0] == 0, f"Event {event}: primary particle ID is not 0"
            incident_pid = int(incident[0])

            # event step arrays + synthetic incident node (last slot)
            pids_e = np.append(pid[lo:hi], incident_pid)
            times_e = np.append(time[lo:hi], 0.0)
            energy_e = np.append(energy[lo:hi], 0.0)
            pos_e = np.vstack([pos[lo:hi], np.zeros(3)])
            step_keys = np.arange(n_steps + 1, dtype=np.int64)

            parent_map: Dict[int, List[int]] = {}
            for child, parent in zip(ev_pids, ev_parents):
                parent_map.setdefault(int(child), [])
                if parent != -1:
                    parent_map[int(child)].append(int(parent))

            # C++ edge builder when available (native/edge_builder.cpp — the
            # preprocessing hot loop, SURVEY §3.2); Python oracle otherwise
            from point_cloud_classifier_tpu.native import build_event_edges_native

            edges = build_event_edges_native(pids_e, times_e, step_keys, parent_map)
            if edges is None:
                edges = build_event_edges(pids_e, times_e, step_keys, parent_map)

            total_energy = energy_e.sum()
            features = np.stack(
                [energy_e / total_energy, pos_e[:, 0], pos_e[:, 1], pos_e[:, 2]], axis=1
            ).astype(np.float32)
            weights = gaussian_edge_weights(features, edges)

            graphs.append(
                {
                    "event_id": int(event),
                    "features": features,
                    "edges": edges,
                    "weights": weights,
                    "label": label,
                }
            )

        if getattr(self, "remap_event_ids", True):
            for new_id, g in enumerate(graphs):
                g["event_id"] = new_id
        return graphs

    # -- pipeline (list-based, overrides the DataFrame pipeline) --------------

    def _create_dataset(self) -> None:
        self.datasets = {s: [] for s in SPLITS}
        event_id_offset = 0

        # per-file load + graph build fans out over `workers` processes
        # (module._map_files); offsetting/splitting stay sequential, so the
        # output is bit-identical to the workers=1 path
        jobs = self._file_jobs()
        for (particle, filepath), (num_events, graphs) in zip(
            jobs, self._map_files(jobs)
        ):
            print(os.path.basename(filepath))
            for g in graphs:
                g["source_file"] = os.path.basename(filepath)
                g["event_id"] += event_id_offset
            event_id_offset += num_events

            train_g, val_g, test_g = self._split_dataset(graphs)
            self.datasets["train"].extend(train_g)
            self.datasets["val"].extend(val_g)
            self.datasets["test"].extend(test_g)

        total = sum(len(self.datasets[s]) for s in SPLITS)
        print("total_events:", total)
        print("event_id_offset:", event_id_offset)

        if self.feature_scaling:
            self._scale_features()
        self._save_datasets()
        for split in SPLITS:
            for g in self.datasets[split]:
                g.pop("source_file", None)

    def _split_dataset(self, graphs: List[Dict]):
        train_frac, val_frac, test_frac = self.data_split
        event_ids = [g["event_id"] for g in graphs]
        labels = [g["label"] for g in graphs]

        train_val_ids, test_ids, train_val_labels, _ = train_test_split(
            event_ids, labels, test_size=test_frac, stratify=labels, random_state=42
        )
        train_ids, val_ids, _, _ = train_test_split(
            train_val_ids,
            train_val_labels,
            test_size=val_frac / (val_frac + train_frac),
            stratify=train_val_labels,
            random_state=42,
        )
        # set membership: list scans would make the split O(G^2) per file
        train_set, val_set, test_set = set(train_ids), set(val_ids), set(test_ids)
        train = [g for g in graphs if g["event_id"] in train_set]
        val = [g for g in graphs if g["event_id"] in val_set]
        test = [g for g in graphs if g["event_id"] in test_set]
        return train, val, test

    def _scale_features(self) -> None:
        print("Scaling features")
        stacked = {
            s: np.vstack([scale_positions_inplace(g["features"]) for g in self.datasets[s]])
            for s in SPLITS
        }
        scaler = StandardScaler()
        stacked["train"][:, 0:1] = scaler.fit_transform(stacked["train"][:, 0:1])
        stacked["val"][:, 0:1] = scaler.transform(stacked["val"][:, 0:1])
        stacked["test"][:, 0:1] = scaler.transform(stacked["test"][:, 0:1])

        self.scaler = scaler
        save_dir = os.path.join(self.data_dir, self.name)
        os.makedirs(save_dir, exist_ok=True)
        joblib.dump(scaler, os.path.join(save_dir, f"{self.name}_scaler.pkl"))

        for s in SPLITS:
            start = 0
            for g in self.datasets[s]:
                n = len(g["features"])
                g["features"] = stacked[s][start : start + n]
                start += n

    def _split_dir(self, split: str) -> str:
        return os.path.join(self.data_dir, self.name, split)

    def _save_datasets(self) -> None:
        # fast path: np.savez spends ~0.7 ms/graph on zipfile bookkeeping —
        # 55% of total dataset-creation time at these tiny per-graph sizes.
        # save_npz writes the same np.load-compatible STORED container
        # (artifact-layout parity with reference `utils/data.py:1101-1122`;
        # tests/test_reference_parity.py loads both sides with np.load).
        from point_cloud_classifier_tpu.data.npz_io import save_npz

        for split in SPLITS:
            save_dir = self._split_dir(split)
            os.makedirs(save_dir, exist_ok=True)
            print(f"Saving {split} dataset")
            for i, g in enumerate(self.datasets[split]):
                save_npz(
                    os.path.join(save_dir, f"graph_{i:05d}.npz"),
                    features=g["features"],
                    edges=g["edges"],
                    weights=g["weights"],
                    label=g["label"],
                    event_id=g["event_id"],
                )
            print("Finished saving data")

    def _load_split_graphs(self, split: str) -> List[Dict]:
        from point_cloud_classifier_tpu.data.npz_io import load_npz

        paths = sorted(glob.glob(os.path.join(self._split_dir(split), "graph_*.npz")))
        if not paths:
            raise FileNotFoundError(f"No .npz files found in {self._split_dir(split)}")
        graphs = []
        for path in paths:
            # load_npz parses the zip directly (one read, frombuffer views);
            # reference-written caches (np.savez) parse on the same path,
            # with np.load as the fallback for anything exotic
            data = load_npz(path)
            graphs.append(
                {
                    "event_id": data["event_id"],
                    "features": data["features"],
                    "edges": data["edges"],
                    "weights": data["weights"],
                    "label": data["label"],
                }
            )
        return graphs

    def _load_dataset(self) -> None:
        for split in SPLITS:
            self.datasets[split] = self._load_split_graphs(split)
        print("Finished loading datasets")

    # -- loaders -----------------------------------------------------------------

    def _make_loader(self, split: str) -> GraphLoader:
        return GraphLoader(
            self._load_split_graphs(split),
            batch_size=self.batch_size,
            shuffle=(split == "train"),
            use_weights=self.use_weights,
            n_features=self.n_features,
            transfer_dtype=self.transfer_dtype,
            seg_encoding=self.seg_encoding,
            layout=self.graph_layout,
            length_sorted=self.length_sorted and split == "train",
            emit_out_rows=self.emit_out_rows,
            dense_w_is_existence=self.dense_w_is_existence,
            require_inrow=self.require_inrow,
            flat_if_multigraph=self.flat_if_multigraph,
        )

    def get_train_loader(self) -> GraphLoader:
        return self._make_loader("train")

    def get_val_loader(self) -> GraphLoader:
        return self._make_loader("val")

    def get_test_loader(self) -> GraphLoader:
        return self._make_loader("test")
