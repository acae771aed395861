"""Full-state checkpoint/resume + profiling counters.

The reference's resume granularity is "retrain" (SURVEY §5); here a run can
be continued mid-training: params, optimizer state, epoch index, best-val
loss, and early-stop counter all round-trip through the orbax checkpoint.
"""

import json
import os

import numpy as np
import pytest

from point_cloud_classifier_tpu.models import FullyConnectedNet, ModelWrapper
from point_cloud_classifier_tpu.utils.profiling import StepTimer, maybe_trace
from tests.test_parallel import _tabular_batch


def _model():
    return FullyConnectedNet(
        input_dim=9, hidden_layers=[16, 16], batch_normalization=False, output_dim=1
    )


def _loaders():
    train = [_tabular_batch(seed=s) for s in range(4)]
    val = [_tabular_batch(seed=99)]
    return train, val


def test_resume_continues_exactly(tmp_path):
    """Interrupt at epoch 2 of 4, resume → same result as uninterrupted run."""
    train, val = _loaders()

    full = ModelWrapper(_model(), learning_rate=1e-2, epochs=4, seed=0,
                        log_dir=str(tmp_path / "full"))
    full.fit(train, val)

    part = ModelWrapper(_model(), learning_rate=1e-2, epochs=2, seed=0,
                        log_dir=str(tmp_path / "part"))
    part.fit(train, val)
    # fresh wrapper picks up where the first left off
    cont = ModelWrapper(_model(), learning_rate=1e-2, epochs=4, seed=0,
                        log_dir=str(tmp_path / "part"))
    cont.fit(train, val, resume=True)

    _, p_full = full.predict(val, return_prob=True)
    _, p_cont = cont.predict(val, return_prob=True)
    np.testing.assert_allclose(p_full, p_cont, rtol=1e-5, atol=1e-6)
    assert cont.best_val_loss == pytest.approx(full.best_val_loss, rel=1e-5)


def test_resume_on_mesh_matches_uninterrupted(tmp_path):
    """Mid-training resume under a (data, model) mesh restores shardings."""
    from jax.sharding import PartitionSpec as P

    from point_cloud_classifier_tpu.models import DeepSets
    from point_cloud_classifier_tpu.parallel import make_mesh
    from tests.test_parallel import _pointcloud_batch

    model = DeepSets(
        input_dim=6, phi_layers=[128], rho_layers=[32], output_dim=1,
        activation="gelu", layer_norm=False, pooling="mean",
    )
    train = [_pointcloud_batch(seed=s) for s in range(3)]
    val = [_pointcloud_batch(seed=9)]
    mesh = make_mesh(n_model=2)

    full = ModelWrapper(model, learning_rate=1e-2, epochs=4, seed=0,
                        log_dir=str(tmp_path / "full"), mesh=mesh)
    full.fit(train, val)

    part = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0,
                        log_dir=str(tmp_path / "part"), mesh=mesh)
    part.fit(train, val)
    cont = ModelWrapper(model, learning_rate=1e-2, epochs=4, seed=0,
                        log_dir=str(tmp_path / "part"), mesh=mesh)
    cont.fit(train, val, resume=True)

    # restored weights carry the declared TP sharding (the wide phi kernel
    # shards column-wise over the model axis)
    wide = cont.params["phi_0_kernel"]
    assert wide.sharding.spec == P(None, "model")

    _, p_full = full.predict(val, return_prob=True)
    _, p_cont = cont.predict(val, return_prob=True)
    np.testing.assert_allclose(p_full, p_cont, rtol=1e-4, atol=1e-5)


def test_state_dir_contents(tmp_path):
    train, val = _loaders()
    w = ModelWrapper(_model(), learning_rate=1e-2, epochs=1, seed=0,
                     log_dir=str(tmp_path))
    w.fit(train, val)
    state = tmp_path / "state"
    assert state.is_dir()
    with open(state / "trainer_state.json") as f:
        meta = json.load(f)
    assert meta["epoch"] == 0
    assert "best_val_loss" in meta and "early_stop_counter" in meta


def test_resume_without_checkpoint_starts_fresh(tmp_path):
    train, val = _loaders()
    w = ModelWrapper(_model(), learning_rate=1e-2, epochs=1, seed=0,
                     log_dir=str(tmp_path))
    w.fit(train, val, resume=True)  # no state yet → trains from scratch
    assert w.params is not None


def test_throughput_metrics_logged(tmp_path):
    train, val = _loaders()
    w = ModelWrapper(_model(), learning_rate=1e-2, epochs=1, seed=0,
                     log_dir=str(tmp_path))
    w.fit(train, val)
    tags = set()
    with open(tmp_path / "metrics.jsonl") as f:
        for line in f:
            tags.add(json.loads(line)["tag"])
    assert {"Loss/train", "Throughput/steps_per_sec", "StepTime/p50_ms"} <= tags


def test_fused_steps_match_sequential():
    """fuse_steps=K (scan over stacked batches) == K sequential steps."""
    train, val = _loaders()

    def run(fuse):
        w = ModelWrapper(
            _model(), learning_rate=1e-2, epochs=3, seed=0, fuse_steps=fuse
        )
        w.fit(train, val)
        _, probs = w.predict(val, return_prob=True)
        return probs

    np.testing.assert_allclose(run(1), run(4), rtol=1e-5, atol=1e-6)
    # partial flush path: fuse larger than the batch count per epoch
    np.testing.assert_allclose(run(1), run(16), rtol=1e-5, atol=1e-6)


def test_fused_steps_mixed_shapes():
    """Shape changes force a flush; fused run still equals sequential."""
    rng = np.random.default_rng(0)
    small = {
        "x": rng.normal(size=(16, 9)).astype(np.float32),
        "y": rng.integers(0, 2, size=(16, 1)).astype(np.float32),
        "y_mask": np.ones((16,), np.float32),
    }
    batches = [_tabular_batch(seed=0), _tabular_batch(seed=1), small,
               _tabular_batch(seed=2), _tabular_batch(seed=3)]

    def run(fuse):
        w = ModelWrapper(
            _model(), learning_rate=1e-2, epochs=2, seed=0, fuse_steps=fuse
        )
        w.fit(batches)
        _, probs = w.predict([_tabular_batch(seed=9)], return_prob=True)
        return probs

    np.testing.assert_allclose(run(1), run(3), rtol=1e-5, atol=1e-6)


def test_fused_eval_matches_sequential():
    """_eval_dispatch with fuse_steps=K == per-batch eval, incl. a shape
    change mid-loader (forces a flush) and a trailing partial group."""
    rng = np.random.default_rng(3)
    small = {
        "x": rng.normal(size=(16, 9)).astype(np.float32),
        "y": rng.integers(0, 2, size=(16, 1)).astype(np.float32),
        "y_mask": np.ones((16,), np.float32),
    }
    batches = [_tabular_batch(seed=s) for s in range(3)] + [small] + [
        _tabular_batch(seed=s) for s in range(3, 8)
    ]
    train, _ = _loaders()
    w1 = ModelWrapper(_model(), learning_rate=1e-2, epochs=1, seed=0)
    w1.fit(train)
    wk = ModelWrapper(_model(), learning_rate=1e-2, epochs=1, seed=0,
                      fuse_steps=4)
    wk.params, wk.batch_stats = w1.params, w1.batch_stats  # identical nets

    loss1, acc1 = w1._evaluate(batches)
    lossk, acck = wk._evaluate(batches)
    np.testing.assert_allclose(lossk, loss1, rtol=1e-6)
    assert acck == acc1
    y1, p1 = w1.predict(batches, return_prob=True)
    yk, pk = wk.predict(batches, return_prob=True)
    np.testing.assert_array_equal(y1, yk)
    np.testing.assert_allclose(pk, p1, rtol=1e-6, atol=1e-7)


def test_fused_eval_device_batches():
    """Fused eval over DEVICE-array batches (the resident-pipeline shape):
    the jnp.stack branch of the flush + device_get of device y/y_mask."""
    import jax.numpy as jnp

    batches = [_tabular_batch(seed=s) for s in range(5)]
    dev_batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    train, _ = _loaders()
    w1 = ModelWrapper(_model(), learning_rate=1e-2, epochs=1, seed=0)
    w1.fit(train)
    wk = ModelWrapper(_model(), learning_rate=1e-2, epochs=1, seed=0,
                      fuse_steps=3)
    wk.params, wk.batch_stats = w1.params, w1.batch_stats

    loss1, acc1 = w1._evaluate(batches)
    lossk, acck = wk._evaluate(dev_batches)
    np.testing.assert_allclose(lossk, loss1, rtol=1e-6)
    assert acck == pytest.approx(acc1)
    y1, p1 = w1.predict(batches, return_prob=True)
    yk, pk = wk.predict(dev_batches, return_prob=True)
    np.testing.assert_array_equal(y1, yk)
    np.testing.assert_allclose(pk, p1, rtol=1e-6, atol=1e-7)


def test_nonfinite_loss_watchdog(tmp_path):
    """A NaN loss halts training with a clear error instead of continuing."""
    train, val = _loaders()
    train = [dict(b) for b in train]
    train[0]["x"] = train[0]["x"].copy()
    train[0]["x"][0, 0] = np.nan
    w = ModelWrapper(_model(), learning_rate=1e-2, epochs=2, seed=0,
                     log_dir=str(tmp_path))
    with pytest.raises(FloatingPointError, match="Non-finite training loss"):
        w.fit(train, val)


def test_step_timer_percentiles():
    t = StepTimer(examples_per_step=10)
    for ms in (1, 2, 3, 4, 100):
        t.times.append(ms / 1e3)
    s = t.summary()
    assert s["steps"] == 5
    assert s["p50_ms"] == pytest.approx(3.0)
    assert s["p99_ms"] == pytest.approx(100.0)
    assert s["examples_per_sec"] == pytest.approx(50 / 0.110)


def test_maybe_trace_noop_and_active(tmp_path, monkeypatch):
    with maybe_trace(str(tmp_path)):  # PCC_TRACE unset → no-op
        pass
    assert not (tmp_path / "trace").exists()
    with maybe_trace(str(tmp_path), force=True):
        pass
    assert (tmp_path / "trace").exists()
