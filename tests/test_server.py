"""HTTP scoring endpoint (point_cloud_classifier_tpu/server.py).

Boots the real ThreadingHTTPServer on an ephemeral port and drives it with
urllib: health, raw-HDF5 scoring parity vs train.infer_raw, and error
handling for bad routes/bodies.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from point_cloud_classifier_tpu.data.synthetic import (
    write_shower_file,
    write_synthetic_dataset,
)
from point_cloud_classifier_tpu.server import make_server
from point_cloud_classifier_tpu.utils.config import load_config
import train as train_mod


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("server")
    data_dir = str(root / "data")
    write_synthetic_dataset(data_dir, n_events_per_file=30, seed=31)
    raw_path = str(root / "serve.h5")
    write_shower_file(raw_path, "piM", n_events=10, seed=99)

    config = load_config("configs/base.yaml", "configs/deep_sets.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["create_dataset"] = True
    train_mod.get_dataloader("s2ppc", config)
    config["dataset"]["create_dataset"] = False
    config["logging"]["log_dir"] = str(root / "log")
    config["trainer"]["epochs"] = 1
    run_dir = train_mod.train_model("deep_sets", "s2ppc", config, return_log_dir=True)

    server = make_server(run_dir, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, run_dir, raw_path
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def test_health(served):
    url, _, _ = served
    status, body = _get(url + "/health")
    assert status == 200
    assert body["status"] == "ok" and body["model"] == "deep_sets"


def test_predict_matches_infer_raw(served, tmp_path):
    url, run_dir, raw_path = served
    with open(raw_path, "rb") as f:
        status, body = _post(url + "/predict", f.read())
    assert status == 200
    preds = body["predictions"]
    assert len(preds) == 10

    csv = train_mod.infer_raw(run_dir, raw_path, output=str(tmp_path / "p.csv"))
    rows = open(csv).read().strip().split("\n")[1:]
    ref = {int(r.split(",")[0]): float(r.split(",")[1]) for r in rows}
    for p in preds:
        assert p["prediction"] == int(p["probability"] >= 0.5)
        np.testing.assert_allclose(p["probability"], ref[p["event_id"]], atol=1e-6)


def test_unknown_route_404(served):
    url, _, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(url + "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/score", b"x")
    assert e.value.code == 404


def test_garbage_body_400(served):
    url, _, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/predict", b"this is not an hdf5 file")
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())


def test_server_fault_500(served, monkeypatch):
    """Non-input failures (missing scaler, backend faults) must surface as
    500, not 400 — a 400 sends monitoring after the clients."""
    url, _, _ = served
    from point_cloud_classifier_tpu import server as server_mod

    # patch score_bytes on the Scorer CLASS — the live handler's scorer
    # instance has no override, so the patched method is what runs
    def boom(self, data):
        raise RuntimeError("backend exploded")

    monkeypatch.setattr(server_mod.Scorer, "score_bytes", boom)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/predict", b"whatever")
    assert e.value.code == 500
    assert "RuntimeError" in json.loads(e.value.read())["error"]


def test_missing_scaler_500(served, monkeypatch):
    """FileNotFoundError classifies as server fault even though it is an
    OSError subclass (the 400 branch catches plain OSError for bad h5)."""
    url, _, _ = served
    from point_cloud_classifier_tpu import server as server_mod

    def gone(self, data):
        raise FileNotFoundError("scaler.pkl not on serving host")

    monkeypatch.setattr(server_mod.Scorer, "score_bytes", gone)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/predict", b"whatever")
    assert e.value.code == 500


def test_quant_active_reports_fallback(served):
    """/health must report the EXECUTING quant path: a layer_norm DeepSets
    silently falls back to float inside the model."""
    _, run_dir, _ = served
    from point_cloud_classifier_tpu.server import Scorer

    scorer = Scorer(run_dir, quant="int8")
    assert scorer.quant_active() == "int8"  # flagship config: layer_norm off
    scorer.model.model = scorer.model.model.clone(layer_norm=True)
    assert scorer.quant_active() == "none"
