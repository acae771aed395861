"""StableHLO export/serving (point_cloud_classifier_tpu/serving.py).

A trained run exports to self-contained artifacts (weights baked in, pure
StableHLO — no Pallas custom calls); `ExportedModel` serves them with
NOTHING from the run dir but the export directory, matching
ModelWrapper.predict bit-for-bit on every bucketed batch shape.
"""

import json
import os

import numpy as np
import pytest

from point_cloud_classifier_tpu.data.synthetic import write_synthetic_dataset
from point_cloud_classifier_tpu.serving import ExportedModel, export_run, _shape_key
from point_cloud_classifier_tpu.utils.config import load_config
import train as train_mod


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_data")
    write_synthetic_dataset(str(d), n_events_per_file=30, seed=11)
    config = load_config("configs/base.yaml", "configs/deep_sets.yaml")
    config["dataset"]["data_dir"] = str(d)
    config["dataset"]["create_dataset"] = True
    train_mod.get_dataloader("s2ppc", config)
    config["dataset"]["create_dataset"] = False
    config["logging"]["log_dir"] = str(tmp_path_factory.mktemp("serve_log"))
    config["trainer"]["epochs"] = 1
    return train_mod.train_model("deep_sets", "s2ppc", config, return_log_dir=True), str(d)


def _loaders(run_dir, data_dir):
    config = load_config(os.path.join(run_dir, "config.yaml"))
    config["dataset"]["data_dir"] = data_dir
    return train_mod.get_dataloader("s2ppc", config)


def test_export_and_serve_matches_wrapper(run_dir, tmp_path):
    run, data_dir = run_dir
    out = export_run(run, out_dir=str(tmp_path / "exported"))
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["model"] == "deep_sets" and manifest["artifacts"]

    config = load_config(os.path.join(run, "config.yaml"))
    wrapper = train_mod.get_model("deep_sets", config, model_dir=run)
    served = ExportedModel(out)
    loader = _loaders(run, data_dir).get_test_loader()
    batches = list(loader)
    y_ref, p_ref = wrapper.predict(iter(batches), return_prob=True)
    y_srv, p_srv = served.predict(iter(batches), return_prob=True)
    np.testing.assert_array_equal(y_ref, y_srv)
    # exported program forces the XLA φ path; same math → tight agreement
    np.testing.assert_allclose(p_srv, p_ref, atol=1e-5)


def test_export_is_pure_stablehlo(run_dir, tmp_path):
    run, _ = run_dir
    out = export_run(run, out_dir=str(tmp_path / "exported2"))
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    import jax.export as jex

    for fname in manifest["artifacts"].values():
        exported = jex.deserialize(
            open(os.path.join(out, fname), "rb").read()
        )
        text = exported.mlir_module()
        assert "stablehlo" in text
        assert "tpu_custom_call" not in text  # portable: no Pallas calls


def test_export_int8_quant(run_dir, tmp_path):
    run, data_dir = run_dir
    out = export_run(run, out_dir=str(tmp_path / "exported_q"), quant="int8")
    served = ExportedModel(out)
    batches = list(_loaders(run, data_dir).get_test_loader())
    config = load_config(os.path.join(run, "config.yaml"))
    wrapper = train_mod.get_model("deep_sets", config, model_dir=run)
    _, p_ref = wrapper.predict(iter(batches), return_prob=True)
    _, p_q = served.predict(iter(batches), return_prob=True)
    np.testing.assert_allclose(p_q, p_ref, atol=0.05)
    # the int8 path must actually be in the artifact
    import jax.export as jex

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    fname = next(iter(manifest["artifacts"].values()))
    text = jex.deserialize(
        open(os.path.join(out, fname), "rb").read()
    ).mlir_module()
    assert "i8" in text


def test_exported_model_unknown_shape_errors(run_dir, tmp_path):
    run, data_dir = run_dir
    out = export_run(run, out_dir=str(tmp_path / "exported3"))
    served = ExportedModel(out)
    batch = next(iter(_loaders(run, data_dir).get_test_loader()))
    bad = {k: np.asarray(v)[:1] if np.ndim(v) else v for k, v in batch.items()}
    with pytest.raises(KeyError):
        served(bad)


def test_shape_key_order_independent():
    a = {"x": np.zeros((2, 3)), "y": np.ones((2,), np.int32)}
    b = {"y": np.ones((2,), np.int32), "x": np.zeros((2, 3))}
    assert _shape_key(a) == _shape_key(b)


def test_export_graph_net(run_dir, tmp_path):
    """Graph wires (in-row adjacency lists / flat edge triples) export and
    serve identically — the artifact embeds the on-device wire decode."""
    _, data_dir = run_dir
    config = load_config("configs/base.yaml", "configs/graph_net.yaml")
    config["dataset"]["data_dir"] = data_dir
    config["dataset"]["create_dataset"] = True
    train_mod.get_dataloader("s2pg", config)
    config["dataset"]["create_dataset"] = False
    config["logging"]["log_dir"] = str(tmp_path / "glog")
    config["trainer"]["epochs"] = 1
    run = train_mod.train_model("graph_net", "s2pg", config, return_log_dir=True)

    out = export_run(run, out_dir=str(tmp_path / "g_exported"))
    served = ExportedModel(out)
    gcfg = load_config(os.path.join(run, "config.yaml"))
    gcfg["dataset"]["data_dir"] = data_dir
    batches = list(train_mod.get_dataloader("s2pg", gcfg).get_test_loader())
    wrapper = train_mod.get_model("graph_net", gcfg, model_dir=run)
    _, p_ref = wrapper.predict(iter(batches), return_prob=True)
    _, p_srv = served.predict(iter(batches), return_prob=True)
    np.testing.assert_allclose(p_srv, p_ref, atol=1e-5)


def test_cli_export(run_dir, tmp_path):
    run, _ = run_dir
    out_dir = str(tmp_path / "cli_exported")
    train_mod.main(["export", run, "--out-dir", out_dir])
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))


def test_force_xla_dispatch(monkeypatch):
    """dispatch.use_tpu_kernels() gates on backend AND the force_xla
    context; the flag restores on exit, including via exception."""
    import jax

    from point_cloud_classifier_tpu.ops import dispatch

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert dispatch.use_tpu_kernels()
    with dispatch.force_xla():
        assert not dispatch.use_tpu_kernels()
        with dispatch.force_xla():  # re-entrant
            assert not dispatch.use_tpu_kernels()
        assert not dispatch.use_tpu_kernels()
    assert dispatch.use_tpu_kernels()
    with pytest.raises(RuntimeError):
        with dispatch.force_xla():
            raise RuntimeError("boom")
    assert dispatch.use_tpu_kernels()


def test_force_xla_closes_graphnet_pallas_gate(monkeypatch):
    """On a (simulated) TPU host, force_xla() keeps GraphNet's kNN forward
    on the pure-XLA path — the scenario behind export portability: a
    graph_net artifact traced on the TPU host must embed no Pallas
    tpu_custom_call.  The kernel entry is replaced with a tripwire."""
    import jax

    from point_cloud_classifier_tpu.models import GraphNet
    from point_cloud_classifier_tpu.ops import dispatch, knn_pallas
    from tests.test_parallel import _graph_batch

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def tripwire(*a, **k):
        raise AssertionError("Pallas kernel reached under force_xla()")

    monkeypatch.setattr(knn_pallas, "knn_aggregate_pallas", tripwire)
    model = GraphNet(
        input_dim=4, hidden_dim=16, output_dim=1, activation="relu", knn_k=4
    )
    batch = _graph_batch(seed=0)
    with dispatch.force_xla():
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        probs = model.apply(variables, batch, train=False)
    assert np.all(np.isfinite(np.asarray(probs)))
