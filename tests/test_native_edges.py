"""Native C++ edge builder: exact equivalence with the Python oracle."""

import numpy as np
import pytest

from point_cloud_classifier_tpu.data.graph import build_event_edges
from point_cloud_classifier_tpu.native import (
    build_event_edges_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="C++ toolchain unavailable"
)


def _random_event(rng, n_particles=8, unrecorded_frac=0.4):
    """A random lineage tree + step arrays shaped like graph.py's inputs."""
    pids_all = list(range(n_particles))
    parents = {0: []}
    for p in pids_all[1:]:
        parents[p] = [int(rng.integers(0, p))]
        if rng.random() < 0.15:  # occasional multi-parent rows
            parents[p].append(int(rng.integers(0, p)))

    recorded = [0] + [p for p in pids_all[1:] if rng.random() > unrecorded_frac]
    steps_pid, steps_time = [], []
    for p in recorded:
        for _ in range(int(rng.integers(1, 5))):
            steps_pid.append(p)
            steps_time.append(float(rng.exponential(1.0)))
    # synthetic incident node appended last (pid 0, time 0), like graph.py
    steps_pid.append(0)
    steps_time.append(0.0)

    pids = np.asarray(steps_pid, dtype=np.int64)
    times = np.asarray(steps_time, dtype=np.float64)
    step_keys = np.arange(len(pids), dtype=np.int64)
    return pids, times, step_keys, parents


@pytest.mark.parametrize("seed", range(20))
def test_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    pids, times, step_keys, parent_map = _random_event(rng)
    ref = build_event_edges(pids, times, step_keys, parent_map)
    out = build_event_edges_native(pids, times, step_keys, parent_map)
    np.testing.assert_array_equal(ref, out)


def test_native_matches_python_large():
    rng = np.random.default_rng(123)
    pids, times, step_keys, parent_map = _random_event(
        rng, n_particles=60, unrecorded_frac=0.5
    )
    ref = build_event_edges(pids, times, step_keys, parent_map)
    out = build_event_edges_native(pids, times, step_keys, parent_map)
    np.testing.assert_array_equal(ref, out)


def test_native_used_in_pipeline(tmp_path):
    """Full S2PG preprocessing through the native path == cached artifacts."""
    from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
    from point_cloud_classifier_tpu.data import Step2PointGraph

    data_dir = str(tmp_path / "data")
    write_synthetic_dataset(data_dir, n_events_per_file=10, seed=11)
    Step2PointGraph(data_dir, create_dataset=True)
    loader = Step2PointGraph(data_dir).get_train_loader()
    batch = next(iter(loader))
    assert batch["nodes"].shape[0] > 0
