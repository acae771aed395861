"""EDA script: artifact generation on synthetic data."""

import json
import os

import numpy as np

from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset


def test_eda_artifacts(tmp_path):
    import eda

    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    write_synthetic_dataset(data_dir, n_events_per_file=20, seed=5)
    result = eda.run_eda(data_dir, out_dir, sample=100)

    for artifact in (
        "summary_stats.json",
        "missing_values.json",
        "energy_distribution.png",
        "shower_3d.png",
        "correlation_matrix.png",
    ):
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact
    # no S2PT cache yet → pairplot skipped gracefully
    assert not os.path.exists(os.path.join(out_dir, "pairplot.png"))

    with open(os.path.join(out_dir, "summary_stats.json")) as f:
        stats = json.load(f)
    assert stats["n_events"] == {"proton": 20, "piM": 20}
    assert set(stats["by_particle"]) == {"proton", "piM"}
    for col in ("total_energy", "n_steps", "n_particles", "elapsed_time"):
        assert np.isfinite(stats["overall"][col]["mean"])

    with open(os.path.join(out_dir, "missing_values.json")) as f:
        audit = json.load(f)
    assert all(v == 0 for vals in audit.values() for v in vals.values())


def test_eda_pairplot_with_cache(tmp_path):
    import eda
    from point_cloud_classifier_tpu.data import Step2PointTabular

    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    write_synthetic_dataset(data_dir, n_events_per_file=20, seed=5)
    Step2PointTabular(data_dir, create_dataset=True)
    eda.run_eda(data_dir, out_dir, sample=30)
    assert os.path.exists(os.path.join(out_dir, "pairplot.png"))
