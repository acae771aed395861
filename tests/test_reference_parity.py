"""Bit-level parity of the offline preprocessing vs the upstream reference.

Runs the reference's pandas/torch pipelines (if mounted at /root/reference)
and ours on identical synthetic HDF5 inputs and compares every cached ``.npz``
artifact: split membership, row order, engineered features, graph edges,
Gaussian weights, and fitted scalers.  Skipped when the reference tree is not
available (e.g. CI without the mount).
"""

import contextlib
import glob
import io
import os
import sys

import numpy as np
import pytest

from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


def _assert_npz_equal(path_a, path_b, atol=1e-5):
    a, b = np.load(path_a), np.load(path_b)
    assert set(a.files) == set(b.files)
    for k in a.files:
        x, y = a[k], b[k]
        assert x.shape == y.shape, f"{k}: {x.shape} vs {y.shape}"
        if x.dtype.kind in "fc":
            np.testing.assert_allclose(
                x.astype(np.float64), y.astype(np.float64), atol=atol, err_msg=k
            )
        else:
            np.testing.assert_array_equal(x, y, err_msg=k)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    ref_dir = str(tmp_path_factory.mktemp("ref_data"))
    my_dir = str(tmp_path_factory.mktemp("my_data"))
    write_synthetic_dataset(ref_dir, n_events_per_file=30, seed=7)
    write_synthetic_dataset(my_dir, n_events_per_file=30, seed=7)

    sys.path.insert(0, REFERENCE)
    try:
        from utils.data import (  # noqa: F401
            Step2PointGraph as RefGraph,
            Step2PointPointCloud as RefPC,
            Step2PointTabular as RefTab,
        )
    except ImportError:
        pytest.skip("reference dependencies unavailable")
    finally:
        sys.path.remove(REFERENCE)

    sys.path.insert(0, REFERENCE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        RefTab(ref_dir, create_dataset=True)
        RefPC(ref_dir, create_dataset=True, energy_cutoff=0.015)
        RefGraph(ref_dir, create_dataset=True)
    sys.path.remove(REFERENCE)

    from point_cloud_classifier_tpu.data import (
        Step2PointGraph,
        Step2PointPointCloud,
        Step2PointTabular,
    )

    with contextlib.redirect_stdout(buf):
        Step2PointTabular(my_dir, create_dataset=True)
        Step2PointPointCloud(my_dir, create_dataset=True, energy_cutoff=0.015)
        Step2PointGraph(my_dir, create_dataset=True)
    return ref_dir, my_dir


@pytest.mark.parametrize("split", ["train", "val", "test"])
def test_tabular_parity(dirs, split):
    ref_dir, my_dir = dirs
    rel = f"S2PT/{split}/S2PT_{split}.npz"
    _assert_npz_equal(os.path.join(ref_dir, rel), os.path.join(my_dir, rel))


@pytest.mark.parametrize("split", ["train", "val", "test"])
def test_pointcloud_parity(dirs, split):
    ref_dir, my_dir = dirs
    rel = f"S2PPC/{split}/S2PPC_{split}_0.npz"
    _assert_npz_equal(os.path.join(ref_dir, rel), os.path.join(my_dir, rel))


@pytest.mark.parametrize("split", ["train", "val", "test"])
def test_graph_parity(dirs, split):
    ref_dir, my_dir = dirs
    ref_graphs = sorted(glob.glob(os.path.join(ref_dir, f"S2PG/{split}/graph_*.npz")))
    my_graphs = sorted(glob.glob(os.path.join(my_dir, f"S2PG/{split}/graph_*.npz")))
    assert len(ref_graphs) == len(my_graphs) > 0
    for rg, mg in zip(ref_graphs, my_graphs):
        _assert_npz_equal(rg, mg)
