"""Standalone data-layer tests: golden feature math, edge builder, batching.

These don't need the reference mount — expected values are hand-derived from
the documented semantics (SURVEY.md §2 rows 3-5).
"""

import os
import numpy as np
import pytest

from point_cloud_classifier_tpu.data.batching import (
    GraphLoader,
    PointCloudLoader,
    TabularLoader,
    pow2_bucket,
)
from point_cloud_classifier_tpu.data.graph import (
    build_event_edges,
    gaussian_edge_weights,
    nearest_recorded_ancestors,
    scale_positions_inplace,
)
from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
from point_cloud_classifier_tpu.data.hdf5 import load_shower_file, parse_part_number
from point_cloud_classifier_tpu.data import (
    Step2PointGraph,
    Step2PointPointCloud,
    Step2PointTabular,
)


# --- fixtures ---------------------------------------------------------------


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth"))
    write_synthetic_dataset(d, n_events_per_file=30, seed=3)
    return d


# --- hdf5 / synthetic ---------------------------------------------------------


def test_synthetic_schema(data_dir):
    import glob, os

    files = sorted(glob.glob(os.path.join(data_dir, "*.h5")))
    assert len(files) == 2
    data = load_shower_file(files[0])
    n = len(data["energy"])
    assert data["position"].shape == (n, 3)
    assert len(data["event_id"]) == n
    assert data["subdetector"].dtype.kind == "S"  # bytes, decoded downstream
    # exactly one primary (parent -1, pid 0) per event
    for ev in np.unique(data["particle_event_id"]):
        sel = data["particle_event_id"] == ev
        primaries = data["particle_id"][sel][data["parent_id"][sel] == -1]
        assert list(primaries) == [0]
    assert parse_part_number(files[0]) == 0


# --- tabular golden test --------------------------------------------------------


def test_tabular_features_golden():
    # two events, hand-computed features
    raw = {
        "event_id": np.array([0, 0, 0, 1, 1]),
        "energy": np.array([1.0, 3.0, 2.0, 4.0, 1.0], dtype=np.float32),
        "time": np.array([0.1, 0.2, 0.3, 0.5, 0.6], dtype=np.float32),
        "position": np.array(
            [[0, 0, 0], [1, 0, 0], [0, 2, 0], [1, 1, 1], [3, 3, 3]], dtype=np.float32
        ),
        "mcparticle_id": np.array([0, 0, 5, 0, 7]),
        "subdetector": np.array([b"HCalBarrel", b"ECalBarrel", b"HCalEndcap", b"ECalBarrel", b"TrackerBarrel"]),
    }
    mod = Step2PointTabular.__new__(Step2PointTabular)  # skip ctor IO
    df = mod._preprocess_data(raw, "piM")

    # event 0: hcal energy 1+2=3, ecal 3 → totals 6; fracs 0.5
    e0 = df[df.event_id == 0].iloc[0]
    assert e0.energy_total == pytest.approx(6.0)
    assert e0.hits_total == 3
    assert e0.energy_hcal_frac == pytest.approx(0.5)
    assert e0.hits_hcal_frac == pytest.approx(2 / 3)
    assert e0.n_particles == 2
    # energy-weighted centroid: x = (1*0+3*1+2*0)/6 = 0.5 ; y = (2*2)/6 = 2/3
    assert e0.energy_weighted_x == pytest.approx(0.5)
    assert e0.energy_weighted_y == pytest.approx(2 / 3)
    assert e0.elapsed_time == pytest.approx(np.percentile([0.1, 0.2, 0.3], 99), rel=1e-6)
    assert e0.label == 1

    # event 1: the Tracker row is "Other" and must be dropped
    e1 = df[df.event_id == 1].iloc[0]
    assert e1.hits_total == 1
    assert e1.energy_total == pytest.approx(4.0)
    assert e1.n_particles == 1  # pid 7's only hit was dropped with the row


# --- pointcloud normalization ----------------------------------------------------


def test_pointcloud_per_event_normalization():
    raw = {
        "event_id": np.array([0, 0, 0]),
        "energy": np.array([1.0, 1.0, 2.0], dtype=np.float32),
        "time": np.array([1.0, 3.0, 2.0], dtype=np.float32),
        "position": np.array([[0, 0, 0], [4, 0, 0], [2, 0, 0]], dtype=np.float32),
    }
    mod = Step2PointPointCloud.__new__(Step2PointPointCloud)
    mod.energy_cutoff = None
    df = mod._preprocess_data(raw, "proton")

    np.testing.assert_allclose(df["energy"], [0.25, 0.25, 0.5])
    np.testing.assert_allclose(df["energy_total"], [4.0, 4.0, 4.0])
    np.testing.assert_allclose(df["time"], [0.0, 1.0, 0.5], atol=1e-6)
    # weighted mean x = .25*0+.25*4+.5*2 = 2 ; weighted var = .25*4+.25*4+0 = 2
    expect_x = (np.array([0, 4, 2]) - 2.0) / (np.sqrt(2.0) + 1e-8)
    np.testing.assert_allclose(df["position_x"], expect_x, atol=1e-6)
    assert (df["label"] == 0).all()


def test_pointcloud_energy_cutoff():
    raw = {
        "event_id": np.array([0, 0]),
        "energy": np.array([0.01, 1.0], dtype=np.float32),
        "time": np.array([1.0, 2.0], dtype=np.float32),
        "position": np.zeros((2, 3), dtype=np.float32),
    }
    mod = Step2PointPointCloud.__new__(Step2PointPointCloud)
    mod.energy_cutoff = 0.015
    df = mod._preprocess_data(raw, "proton")
    assert len(df) == 1 and df["energy"].iloc[0] == pytest.approx(1.0)


# --- graph edge builder -----------------------------------------------------------


def test_ancestor_bfs_through_unrecorded():
    # tree: 0 -> 1(unrecorded) -> 2 ; nearest recorded ancestor of 2 is 0
    parent_map = {0: [], 1: [0], 2: [1]}
    recorded = frozenset({0, 2})
    cache = {}
    assert nearest_recorded_ancestors(2, recorded, parent_map, cache) == [0]
    assert cache[2] == [0]
    # pid 0 has no parents
    assert nearest_recorded_ancestors(0, recorded, parent_map, {}) == []


def test_build_event_edges_temporal_and_parent():
    # event: pid 0 steps at t=1,2 (keys 0,1); pid 5 step at t=3 (key 2);
    # synthetic incident node pid 0 at t=0 (key 3). pid 5's parent is 0.
    pids = np.array([0, 0, 5, 0])
    times = np.array([1.0, 2.0, 3.0, 0.0])
    keys = np.arange(4)
    parent_map = {0: [], 5: [0]}
    edges = build_event_edges(pids, times, keys, parent_map)
    directed = set(map(tuple, edges.T[::2]))  # every even row is the forward edge
    # temporal chain for pid 0: 3(t=0) -> 0(t=1) -> 1(t=2)
    assert (3, 0) in directed and (0, 1) in directed
    # parent edge: pid 5's min-time step (key 2) from pid 0's closest-in-time
    # step: |1-3|=2, |2-3|=1, |0-3|=3 → source key 1
    assert (1, 2) in directed
    assert len(directed) == 3
    # bidirectional: reverse of each directed edge present
    all_edges = set(map(tuple, edges.T))
    assert all(((t, s) in all_edges) for s, t in directed)


def test_build_event_edges_incident_indegree_assert():
    # a lone pid-1 node with no ancestors triggers the unconnected assert
    pids = np.array([1, 0])
    times = np.array([1.0, 0.0])
    keys = np.arange(2)
    with pytest.raises(AssertionError):
        build_event_edges(pids, times, keys, {0: [], 1: []})


def test_gaussian_weights_and_position_scaling():
    feats = np.array(
        [[0.5, 0.0, 0.0, 0.0], [0.5, 3.0, 4.0, 0.0]], dtype=np.float32
    )
    edges = np.array([[0, 1], [1, 0]])
    w = gaussian_edge_weights(feats, edges)
    # single distance 5 → sigma = 5 + 1e-6 → w = exp(-25/(2*25)) = exp(-0.5)
    np.testing.assert_allclose(w, np.exp(-0.5), rtol=1e-5)

    scaled = scale_positions_inplace(feats.copy())
    # energy-weighted mean = (1.5, 2, 0); std = (1.5, 2, 0)
    np.testing.assert_allclose(scaled[:, 1], [-1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(scaled[:, 3], [0.0, 0.0], atol=1e-5)


# --- batching ----------------------------------------------------------------------


def test_pow2_bucket():
    assert pow2_bucket(1) == 256
    assert pow2_bucket(256) == 256
    assert pow2_bucket(257) == 512
    assert pow2_bucket(5000) == 8192


def test_tabular_loader_padding_and_shuffle():
    X = np.arange(20, dtype=np.float32).reshape(10, 2)
    y = np.arange(10) % 2
    loader = TabularLoader(X, y, batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["y_mask"].sum() == 2  # 10 = 4+4+2
    assert batches[0]["x"].shape == (4, 2)

    shuffled = TabularLoader(X, y, batch_size=4, shuffle=True, seed=1)
    e1 = np.concatenate([b["x"][b["y_mask"] > 0] for b in shuffled])
    e2 = np.concatenate([b["x"][b["y_mask"] > 0] for b in shuffled])
    assert not np.array_equal(e1, e2)  # reshuffles across epochs
    assert np.array_equal(np.sort(e1, axis=0), np.sort(e2, axis=0))


def test_pointcloud_loader_segments():
    events = [np.full((n, 3), i, dtype=np.float32) for i, n in enumerate([5, 2, 7])]
    labels = np.array([0.0, 1.0, 0.0])
    loader = PointCloudLoader(events, labels, batch_size=2, shuffle=False)
    b0, b1 = list(loader)
    # batch 0: events 0,1 → 7 valid points
    assert (b0["seg"] < 2).sum() == 7
    assert b0["points"].shape[0] == 256  # min bucket
    # all points of event 1 carry its feature value
    assert (b0["points"][b0["seg"] == 1] == 1).all()
    np.testing.assert_array_equal(b0["y"][:, 0], [0, 1])
    # batch 1: one event, padded label slot masked out
    np.testing.assert_array_equal(b1["y_mask"], [1, 0])


def test_graph_loader_offsets():
    g1 = {
        "features": np.ones((3, 4), dtype=np.float32),
        "edges": np.array([[0, 1], [1, 2]]),
        "weights": np.array([0.5, 0.7], dtype=np.float32),
        "label": 0,
    }
    g2 = {
        "features": 2 * np.ones((2, 4), dtype=np.float32),
        "edges": np.array([[0], [1]]),
        "weights": np.array([0.9], dtype=np.float32),
        "label": 1,
    }
    loader = GraphLoader([g1, g2], batch_size=2, shuffle=False, use_weights=True)
    (b,) = list(loader)
    valid_e = b["edge_mask"] > 0
    # second graph's edge endpoints offset by 3 nodes
    np.testing.assert_array_equal(b["src"][valid_e], [0, 1, 3])
    np.testing.assert_array_equal(b["dst"][valid_e], [1, 2, 4])
    np.testing.assert_allclose(b["edge_w"][valid_e], [0.5, 0.7, 0.9])
    np.testing.assert_array_equal(b["node_seg"][:5], [0, 0, 0, 1, 1])
    assert (b["node_seg"][5:] == 2).all()  # padding segment
    # padded edges self-loop on the final padding node
    assert (b["src"][~valid_e] == b["nodes"].shape[0] - 1).all()

    unweighted = GraphLoader([g1, g2], batch_size=2, shuffle=False, use_weights=False)
    (b,) = list(unweighted)
    np.testing.assert_allclose(b["edge_w"][b["edge_mask"] > 0], 1.0)


def test_graph_loader_n_features_slice():
    g = {
        "features": np.arange(8, dtype=np.float32).reshape(2, 4),
        "edges": np.array([[0], [1]]),
        "weights": np.array([1.0], dtype=np.float32),
        "label": 0,
    }
    loader = GraphLoader([g], batch_size=1, shuffle=False, n_features=1)
    (b,) = list(loader)
    assert b["nodes"].shape[1] == 1
    np.testing.assert_array_equal(b["nodes"][:2, 0], [0.0, 4.0])


# --- end-to-end create + reload --------------------------------------------------


def test_create_then_reload_roundtrip(data_dir):
    tab = Step2PointTabular(data_dir, create_dataset=True)
    reloaded = Step2PointTabular(data_dir, create_dataset=False)
    for split in ["train", "val", "test"]:
        a = tab.datasets[split].reset_index(drop=True)
        b = reloaded.datasets[split]
        assert set(a.columns) == set(b.columns)
        np.testing.assert_allclose(
            a.drop(columns=["label"]).to_numpy(np.float64),
            b[a.drop(columns=["label"]).columns].to_numpy(np.float64),
            atol=1e-12,
        )

    pc = Step2PointPointCloud(data_dir, create_dataset=True, energy_cutoff=0.015, batch_size=8)
    loader = pc.get_val_loader()
    total = sum(int((b["seg"] < 8).sum()) for b in loader)
    assert total == len(pc.datasets["val"])

    gr = Step2PointGraph(data_dir, create_dataset=True, batch_size=8)
    gl = gr.get_test_loader()
    n_graphs = sum(int(b["y_mask"].sum()) for b in gl)
    assert n_graphs == len(gr.datasets["test"])


def test_split_fractions_and_stratification(data_dir):
    tab = Step2PointTabular(data_dir, create_dataset=False)
    sizes = {s: len(tab.datasets[s]) for s in ["train", "val", "test"]}
    total = sum(sizes.values())
    assert abs(sizes["train"] / total - 0.6) < 0.05
    assert abs(sizes["val"] / total - 0.2) < 0.05
    for s in sizes:
        frac_pim = tab.datasets[s]["label"].mean()
        assert 0.3 < frac_pim < 0.7  # both classes present in every split


class TestParallelCreate:
    """workers>1 dataset creation is bit-identical to sequential.

    Only the per-file load+preprocess stage fans out (module._map_files);
    offsetting, splits, scaling, and cache writes stay sequential — so every
    cached artifact must match the workers=1 run exactly.
    """

    def _two_dirs(self, tmp_path, cls, **kw):
        from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset

        out = []
        for name, workers in (("seq", 1), ("par", 3)):
            d = str(tmp_path / name)
            write_synthetic_dataset(
                d, n_events_per_file=12, n_files_per_particle=2, seed=7
            )
            cls(d, create_dataset=True, workers=workers, **kw)
            out.append(d)
        return out

    def _assert_trees_equal(self, a_dir, b_dir, name):
        import glob as g

        a_files = sorted(
            os.path.relpath(p, a_dir)
            for p in g.glob(os.path.join(a_dir, name, "**", "*.npz"), recursive=True)
        )
        b_files = sorted(
            os.path.relpath(p, b_dir)
            for p in g.glob(os.path.join(b_dir, name, "**", "*.npz"), recursive=True)
        )
        assert a_files == b_files and a_files
        for rel in a_files:
            a = np.load(os.path.join(a_dir, rel))
            b = np.load(os.path.join(b_dir, rel))
            assert set(a.files) == set(b.files)
            for k in a.files:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{rel}:{k}")

    def test_tabular_workers_bitwise(self, tmp_path):
        from point_cloud_classifier_tpu.data import Step2PointTabular

        seq, par = self._two_dirs(tmp_path, Step2PointTabular)
        self._assert_trees_equal(seq, par, "S2PT")

    def test_graph_workers_bitwise(self, tmp_path):
        from point_cloud_classifier_tpu.data import Step2PointGraph

        seq, par = self._two_dirs(tmp_path, Step2PointGraph)
        self._assert_trees_equal(seq, par, "S2PG")

    def test_hung_worker_raises_promptly(self, tmp_path, monkeypatch):
        """A deadlocked forked child must surface as RuntimeError within
        ~PCC_FILE_TIMEOUT — not hang forever in the executor teardown
        joining the stuck process (the with-block shutdown(wait=True)
        regression: the timeout fired but exit re-joined the child)."""
        import time as _time

        from point_cloud_classifier_tpu.data import Step2PointTabular
        from point_cloud_classifier_tpu.data.synthetic import (
            write_synthetic_dataset,
        )

        d = str(tmp_path / "hang")
        write_synthetic_dataset(
            d, n_events_per_file=6, n_files_per_particle=2, seed=7
        )
        monkeypatch.setenv("PCC_FILE_TIMEOUT", "2")

        # bound methods pickle as getattr(obj, func.__name__), so the
        # stand-in must carry the real name for the child to resolve it
        def _preprocess_file(self, job):
            _time.sleep(3600)

        monkeypatch.setattr(
            Step2PointTabular, "_preprocess_file", _preprocess_file
        )
        t0 = _time.monotonic()
        with pytest.raises(RuntimeError, match="timed out|failed"):
            Step2PointTabular(d, create_dataset=True, workers=3)
        assert _time.monotonic() - t0 < 30


class TestDensePointCloudWire:
    """layout='dense': per-cloud rows [B, M, Fw], padding inside rows."""

    def _events(self, sizes, f=4, seed=0):
        rng = np.random.default_rng(seed)
        return [rng.normal(size=(n, f)).astype(np.float32) for n in sizes]

    def test_dense_rung_ladder(self):
        from point_cloud_classifier_tpu.data.batching import _dense_rung

        for n in list(range(1, 70)) + [100, 255, 256, 257, 300, 1000, 5000]:
            r = _dense_rung(n)
            assert r >= max(n, 8)
            # <= 14% waste past the minimum rung
            assert r <= max(8, n + (n + 7) // 8)
            mant = r >> max(r.bit_length() - 4, 0)
            assert 8 <= mant <= 15 or r == 8

    def test_dense_batch_roundtrip(self):
        sizes = [5, 2, 7, 9, 1, 3]
        events = self._events(sizes)
        labels = np.arange(len(sizes)).astype(np.float32) % 2
        loader = PointCloudLoader(
            events, labels, batch_size=4, shuffle=False, layout="dense"
        )
        batches = list(loader)
        assert all(b["points"].ndim == 3 for b in batches)
        got = []
        for b in batches:
            counts = b["seg_counts"]
            for row in range(int(b["y_mask"].sum())):
                got.append(b["points"][row, : counts[row]])
            # padding rows are zero
            m = b["points"].shape[1]
            valid = np.arange(m)[None, :] < counts[: b["points"].shape[0], None]
            assert (b["points"][~valid] == 0).all()
        for want, have in zip(events, got):
            np.testing.assert_array_equal(want.astype(np.float32), have)

    def test_dense_factored_and_fp16(self):
        sizes = [4, 6, 3]
        events = self._events(sizes)
        for e in events:  # column 1 constant per event (factorable)
            e[:, 1] = e[0, 1]
        labels = np.zeros(len(sizes), dtype=np.float32)
        loader = PointCloudLoader(
            events, labels, batch_size=4, shuffle=False, layout="dense",
            transfer_dtype="float16", factor_event_cols=(1,),
        )
        (b,) = list(loader)
        assert b["points"].dtype == np.float16
        assert b["points"].shape[-1] == 3  # column 1 factored off the wire
        for row, e in enumerate(events):
            np.testing.assert_allclose(
                b["event_feats"][row, 0], e[0, 1], rtol=1e-3
            )

    def test_dense_matches_flat_through_model(self):
        import jax

        from point_cloud_classifier_tpu.models.deep_sets import DeepSets

        sizes = [5, 2, 7, 9, 1, 3, 8, 8]
        events = self._events(sizes, f=6, seed=3)
        labels = (np.arange(len(sizes)) % 2).astype(np.float32)
        mk = lambda layout: PointCloudLoader(
            events, labels, batch_size=4, shuffle=False, layout=layout,
            seg_encoding="counts",
        )
        model = DeepSets(
            input_dim=6, phi_layers=[8, 8], rho_layers=[8], output_dim=1,
            activation="gelu", layer_norm=False, residual_block=True,
            pooling="mean",
        )
        fb = list(mk("flat"))
        db = list(mk("dense"))
        v = model.init(jax.random.PRNGKey(0), fb[0], train=False)
        for bf, bd in zip(fb, db):
            of = model.apply(v, bf, train=False)
            od = model.apply(v, bd, train=False)
            np.testing.assert_allclose(
                np.asarray(of), np.asarray(od), rtol=2e-5, atol=2e-5
            )

    def test_auto_prefers_dense_for_uniform_sizes(self):
        # round-5 policy audit: the dense row pooling only pays from
        # b >= 128 (flat measured faster at the sweep's B=16/32/64), so
        # auto needs BOTH near-zero padding AND a large batch
        events = self._events([256] * 128)
        labels = np.zeros(128, dtype=np.float32)
        loader = PointCloudLoader(
            events, labels, batch_size=128, shuffle=False, layout="auto"
        )
        (b,) = list(loader)
        assert b["points"].ndim == 3  # uniform + b>=128: dense wins

    def test_auto_stays_flat_below_min_batch(self):
        # same zero-padding sizes at a sweep-sized batch: the min-B gate
        # keeps the measured-faster flat wire (b=8 << 128); explicit
        # layout="dense" still forces the dense form
        events = self._events([256] * 8)
        labels = np.zeros(8, dtype=np.float32)
        auto = PointCloudLoader(
            events, labels, batch_size=8, shuffle=False, layout="auto"
        )
        (b,) = list(auto)
        assert b["points"].ndim == 2
        forced = PointCloudLoader(
            events, labels, batch_size=8, shuffle=False, layout="dense"
        )
        (b,) = list(forced)
        assert b["points"].ndim == 3

    def test_auto_falls_back_for_skewed_sizes(self):
        # one giant cloud forces M ~ 4096 per row; flat packs far tighter
        events = self._events([4000] + [4] * 7)
        labels = np.zeros(8, dtype=np.float32)
        loader = PointCloudLoader(
            events, labels, batch_size=8, shuffle=False, layout="auto"
        )
        (b,) = list(loader)
        assert b["points"].ndim == 2
