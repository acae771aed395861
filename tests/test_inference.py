"""Raw-file serving path: preprocessing + saved scalers + prediction.

Key property: scoring a raw file through ``infer-raw`` must agree with the
training pipeline's own preprocessing — verified by round-tripping events
that went through dataset creation.
"""

import os

import numpy as np
import pytest

import train as train_mod
from point_cloud_classifier_tpu.data.inference import inference_loader
from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset, write_shower_file
from point_cloud_classifier_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer_raw")
    data_dir = str(root / "data")
    write_synthetic_dataset(data_dir, n_events_per_file=30, seed=21)
    # an unseen raw file to serve
    serve_path = str(root / "serve.h5")
    write_shower_file(serve_path, "piM", n_events=12, seed=777)

    for model, ds in [
        ("fully_connected_net", "s2pt"),
        ("deep_sets", "s2ppc"),
        ("graph_net", "s2pg"),
    ]:
        config = load_config("configs/base.yaml", f"configs/{model}.yaml")
        config["dataset"]["data_dir"] = data_dir
        config["dataset"]["create_dataset"] = True
        train_mod.get_dataloader(ds, config)
    return data_dir, serve_path, str(root)


@pytest.mark.parametrize(
    "model_name,dataset_name",
    [
        ("logistic_regression", "s2pt"),
        ("fully_connected_net", "s2pt"),
        ("deep_sets", "s2ppc"),
        ("graph_net", "s2pg"),
    ],
)
def test_infer_raw_end_to_end(model_name, dataset_name, setup, tmp_path):
    data_dir, serve_path, _ = setup
    config = load_config("configs/base.yaml", f"configs/{model_name}.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["logging"]["log_dir"] = str(tmp_path / "log")
    if "trainer" in config:
        config["trainer"]["epochs"] = 1
    run_dir = train_mod.train_model(
        model_name, dataset_name, config, return_log_dir=True
    )

    out = train_mod.infer_raw(run_dir, serve_path, output=str(tmp_path / "preds.csv"))
    with open(out) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "event_id,probability,prediction"
    assert len(lines) == 1 + 12  # one prediction per served event
    probs = [float(l.split(",")[1]) for l in lines[1:]]
    assert all(0.0 <= p <= 1.0 for p in probs)
    ids = [int(l.split(",")[0]) for l in lines[1:]]
    assert ids == sorted(ids)


def test_infer_raw_preserves_original_event_ids(setup, tmp_path):
    """Predictions stay joinable to the input file's own event ids."""
    import h5py

    data_dir, serve_path, _ = setup
    # a raw file with NON-contiguous event ids
    oddball = str(tmp_path / "oddball.h5")
    write_shower_file(oddball, "proton", n_events=5, seed=33)
    with h5py.File(oddball, "r+") as f:
        for grp in ("steps", "particles"):
            ids = f[grp]["event_id"][...]
            del f[grp]["event_id"]
            f[grp]["event_id"] = ids * 10 + 1001
    config = load_config("configs/base.yaml", "configs/deep_sets.yaml")
    config["dataset"]["data_dir"] = data_dir
    loader, event_ids = inference_loader("s2ppc", config, oddball)
    assert sorted(event_ids.tolist()) == [1001, 1011, 1021, 1031, 1041]


def test_inference_loader_shapes(setup):
    data_dir, serve_path, _ = setup
    config = load_config("configs/base.yaml", "configs/deep_sets.yaml")
    config["dataset"]["data_dir"] = data_dir
    loader, event_ids = inference_loader("s2ppc", config, serve_path)
    assert len(event_ids) == 12
    batch = next(iter(loader))
    assert batch["points"].ndim == 2
    assert batch["y"].shape[1] == 1


def test_inference_uses_saved_scaler(setup):
    """Energy scaling at inference matches the train-fit scaler exactly."""
    import joblib

    data_dir, serve_path, _ = setup
    config = load_config("configs/base.yaml", "configs/deep_sets.yaml")
    config["dataset"]["data_dir"] = data_dir

    from point_cloud_classifier_tpu.data.hdf5 import load_shower_file
    from point_cloud_classifier_tpu.data.pointcloud import Step2PointPointCloud

    module = Step2PointPointCloud(load_cache=False, **{
        k: v for k, v in config["dataset"].items()
    })
    raw = load_shower_file(serve_path)
    df = module._preprocess_data(raw, particle="piM")
    scaler = joblib.load(os.path.join(data_dir, "S2PPC", "S2PPC_scaler.pkl"))
    expected = scaler.transform(df[["energy"]])

    loader, _ = inference_loader("s2ppc", config, serve_path)
    # energy is feature column 0 in the flattened loader buffer
    np.testing.assert_allclose(
        loader.flat[:, 0], expected[:, 0].astype(np.float32), rtol=1e-5
    )

def test_inference_loader_forwards_factored_cols(setup):
    """A model trained with factored event columns requires the
    'event_feats' wire key at serving time — the raw-inference loader
    must forward factor_event_cols from the trained config (it used to
    drop it, crashing every infer-raw/serve request on such runs)."""
    data_dir, serve_path, _ = setup
    config = load_config("configs/base.yaml", "configs/deep_sets.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["factor_event_cols"] = [1]
    loader, _ = inference_loader("s2ppc", config, serve_path)
    batch = next(iter(loader))
    assert "event_feats" in batch
