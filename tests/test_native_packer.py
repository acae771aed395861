"""Native C++ batch packer: bit-exact equivalence with the Python loops.

The loaders in ``data/batching.py`` keep their original Python assembly as
the oracle (and the ``PCC_NATIVE=0`` fallback); ``native/batch_packer.cpp``
must reproduce every output array bit-for-bit across layouts, wire dtypes,
and encodings.
"""

import os

import numpy as np
import pytest

import point_cloud_classifier_tpu.native as native
from point_cloud_classifier_tpu.data.batching import GraphLoader, PointCloudLoader

pytestmark = pytest.mark.skipif(
    not native.packer_available(), reason="C++ toolchain unavailable"
)


def _batches_both_paths(make_loader):
    """(native batches, python-fallback batches) for the same loader config."""
    native_batches = list(make_loader())
    os.environ["PCC_NATIVE"] = "0"
    native._packer_lib = None
    try:
        python_batches = list(make_loader())
    finally:
        del os.environ["PCC_NATIVE"]
        native._packer_lib = None
    return native_batches, python_batches


def _assert_identical(a_batches, b_batches):
    assert len(a_batches) == len(b_batches)
    for a, b in zip(a_batches, b_batches):
        assert set(a) == set(b)
        for key in a:
            assert a[key].dtype == b[key].dtype, key
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)


def _random_events(rng, n_events, max_points=96):
    counts = rng.integers(1, max_points, size=n_events)
    feats = [rng.normal(size=(c, 6)).astype(np.float32) for c in counts]
    labels = rng.integers(0, 2, size=n_events).astype(np.float32)
    return feats, labels


def _random_graphs(rng, n_graphs, max_nodes=48):
    graphs = []
    for i in range(n_graphs):
        m = int(rng.integers(2, max_nodes))
        e = int(rng.integers(1, 4 * m))
        graphs.append(
            {
                "features": rng.normal(size=(m, 4)).astype(np.float32),
                "edges": rng.integers(0, m, size=(2, e)).astype(np.int64),
                "weights": rng.random(e).astype(np.float32),
                "label": float(i % 2),
            }
        )
    return graphs


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(transfer_dtype="float32"),
        dict(transfer_dtype="float16"),
        dict(transfer_dtype="float16", seg_encoding="counts"),
        dict(transfer_dtype="float16", seg_encoding="counts", factor_event_cols=(1, 4)),
        dict(transfer_dtype="float32", factor_event_cols=(0,)),
        dict(transfer_dtype="float32", length_sorted=True),
        dict(layout="dense"),
        dict(layout="dense", transfer_dtype="float16"),
        dict(
            layout="dense",
            transfer_dtype="float16",
            factor_event_cols=(1, 4),
            length_sorted=True,
        ),
        dict(layout="auto", transfer_dtype="float16", length_sorted=True),
    ],
)
def test_pointcloud_pack_matches_python(kwargs):
    rng = np.random.default_rng(0)
    feats, labels = _random_events(rng, 200)
    _assert_identical(
        *_batches_both_paths(
            lambda: PointCloudLoader(
                feats, labels, batch_size=32, shuffle=True, seed=7, **kwargs
            )
        )
    )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(layout="flat"),
        dict(layout="flat", transfer_dtype="float16", seg_encoding="counts"),
        dict(layout="flat", use_weights=False, transfer_dtype="float16"),
        dict(layout="flat", n_features=1),
        dict(layout="dense"),
        dict(layout="dense", transfer_dtype="float16"),
        dict(layout="dense", use_weights=False),
        dict(layout="auto", use_weights=False, n_features=1),
    ],
)
def test_graph_pack_matches_python(kwargs):
    rng = np.random.default_rng(1)
    graphs = _random_graphs(rng, 150)
    _assert_identical(
        *_batches_both_paths(
            lambda: GraphLoader(graphs, batch_size=32, shuffle=True, seed=9, **kwargs)
        )
    )


def test_pointcloud_dense_pack_with_empty_events_matches_python():
    """Zero-point events: the dense packer must skip feature/event_feats
    writes but still record seg_counts[slot] = 0, exactly like the numpy
    fallback's nonempty masking."""
    rng = np.random.default_rng(3)
    feats, labels = _random_events(rng, 60)
    for i in (0, 7, 31, 59):
        feats[i] = np.zeros((0, 6), dtype=np.float32)
    _assert_identical(
        *_batches_both_paths(
            lambda: PointCloudLoader(
                feats,
                labels,
                batch_size=16,
                shuffle=True,
                seed=11,
                layout="dense",
                transfer_dtype="float16",
                factor_event_cols=(1,),
            )
        )
    )


def test_dense_fp16_duplicate_edges_accumulate_like_numpy():
    """np.add.at on an f16 array rounds after every add; C++ must match.

    Called on the raw packer (the loader merges duplicates at construction,
    so batches never carry them — but the C++ contract still promises
    numpy-parity accumulation for any input).
    """
    from point_cloud_classifier_tpu.native import pack_graph_dense_native

    rng = np.random.default_rng(2)
    m, e = 8, 30
    feats = rng.normal(size=(m, 4)).astype(np.float32)
    # heavy duplication: every edge repeated several times
    base = rng.integers(0, m, size=(2, 6))
    edges = np.tile(base, 5).astype(np.int32)
    w = rng.random(e).astype(np.float32)

    b, m_pad = 1, 8
    nodes = np.zeros((b, m_pad, 4), np.float16)
    adj = np.zeros((b, m_pad, m_pad), np.float16)
    node_mask = np.zeros((b, m_pad), np.float32)
    ok = pack_graph_dense_native(
        np.ascontiguousarray(feats, dtype=np.float16),
        np.array([0, m], np.int64),
        np.ascontiguousarray(edges[0]),
        np.ascontiguousarray(edges[1]),
        np.array([0, e], np.int64),
        w,
        True,
        np.array([0], np.int64),
        b,
        m_pad,
        nodes,
        adj,
        node_mask,
    )
    assert ok
    oracle = np.zeros((m_pad, m_pad), np.float16)
    np.add.at(oracle, (edges[1], edges[0]), w.astype(np.float16))
    np.testing.assert_array_equal(adj[0], oracle)


def test_partial_final_batch_and_empty_event():
    """k < b final batches and zero-point events pack identically."""
    rng = np.random.default_rng(3)
    feats, labels = _random_events(rng, 13)
    feats[4] = np.zeros((0, 6), np.float32)  # empty event
    _assert_identical(
        *_batches_both_paths(
            lambda: PointCloudLoader(
                feats,
                labels,
                batch_size=8,
                shuffle=False,
                transfer_dtype="float16",
                seg_encoding="counts",
                factor_event_cols=(2,),
            )
        )
    )
