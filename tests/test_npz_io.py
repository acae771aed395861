"""Fast .npz container IO (data/npz_io.py): np.load/np.savez interop.

The per-graph cache contract is "a .npz np.load can read" (reference
`utils/data.py:1101-1122`); these tests pin both directions of interop
plus the fallback behavior for containers the fast parser rejects.
"""

import numpy as np
import pytest

from point_cloud_classifier_tpu.data.npz_io import load_npz, save_npz


def _graph_arrays(rng):
    return dict(
        features=rng.standard_normal((30, 4)),
        edges=rng.integers(0, 30, (2, 60)).astype(np.int64),
        weights=rng.standard_normal(60).astype(np.float32),
        label=1,
        event_id=np.int64(7),
    )


def _assert_equal(got, want):
    want = np.asanyarray(want)
    assert got.shape == want.shape
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_save_npz_is_np_load_compatible(tmp_path):
    arrays = _graph_arrays(np.random.default_rng(0))
    path = str(tmp_path / "g.npz")
    save_npz(path, **arrays)
    data = np.load(path)
    assert set(data.files) == set(arrays)
    for k in arrays:
        _assert_equal(data[k], arrays[k])


def test_load_npz_reads_np_savez_files(tmp_path):
    arrays = _graph_arrays(np.random.default_rng(1))
    path = str(tmp_path / "ref.npz")
    np.savez(path, **arrays)  # what reference-produced caches look like
    out = load_npz(path)
    assert set(out) == set(arrays)
    for k in arrays:
        _assert_equal(out[k], arrays[k])


def test_roundtrip_fast_both_ways(tmp_path):
    arrays = _graph_arrays(np.random.default_rng(2))
    path = str(tmp_path / "g.npz")
    save_npz(path, **arrays)
    out = load_npz(path)
    for k in arrays:
        _assert_equal(out[k], arrays[k])


@pytest.mark.parametrize(
    "value",
    [
        np.float64(3.5),  # 0-d scalar
        np.zeros((0, 4)),  # empty
        np.asfortranarray(np.arange(12.0).reshape(3, 4)),  # F-order input
        np.array([True, False, True]),  # bool
        np.arange(6, dtype=np.int16).reshape(2, 3),
    ],
)
def test_edge_dtypes_and_orders(tmp_path, value):
    path = str(tmp_path / "v.npz")
    save_npz(path, v=value)
    _assert_equal(np.load(path)["v"], value)
    _assert_equal(load_npz(path)["v"], value)


def test_compressed_falls_back_to_np_load(tmp_path):
    arrays = _graph_arrays(np.random.default_rng(3))
    path = str(tmp_path / "c.npz")
    np.savez_compressed(path, **arrays)
    out = load_npz(path)  # fast parse rejects DEFLATE -> np.load fallback
    for k in arrays:
        _assert_equal(out[k], arrays[k])


def test_loaded_arrays_are_writable(tmp_path):
    path = str(tmp_path / "w.npz")
    save_npz(path, x=np.arange(8.0))
    out = load_npz(path)
    out["x"][0] = 99.0  # loaders hand these to packers that expect real arrays
    assert out["x"][0] == 99.0
