"""Observability parity: per-epoch logits + weight/grad histograms.

The reference logs, every epoch, the last batch's logits histogram and one
weight + one grad histogram per named parameter
(`/root/reference/models/wrapper.py:79-84`).  Here the same artifacts are
opt-in (PCC_TENSORBOARD=1 + PCC_TB_HISTOGRAMS=1) because they force
device→host copies of the full gradient tree per epoch.
"""

import numpy as np

from point_cloud_classifier_tpu.models import FullyConnectedNet, ModelWrapper
from tests.test_parallel import _tabular_batch


def test_histogram_parity_writes_one_epoch(tmp_path, monkeypatch):
    monkeypatch.setenv("PCC_TENSORBOARD", "1")
    monkeypatch.setenv("PCC_TB_HISTOGRAMS", "1")
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
    )
    w = ModelWrapper(model, learning_rate=1e-2, epochs=1, log_dir=str(tmp_path))
    w.fit([_tabular_batch(seed=s) for s in range(2)], [_tabular_batch(seed=9)])

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = set(acc.Tags()["histograms"])
    assert "logits" in tags
    weight_tags = {t for t in tags if t.endswith("_weight")}
    grad_tags = {t for t in tags if t.endswith("_grad")}
    # one weight histogram and one grad histogram per parameter leaf
    import jax

    n_leaves = len(jax.tree.leaves(w.params))
    assert len(weight_tags) == n_leaves
    assert len(grad_tags) == n_leaves
    assert {t[: -len("_weight")] for t in weight_tags} == {
        t[: -len("_grad")] for t in grad_tags
    }
    # histograms carry real values (the grad of a trained step is not all-0)
    logits_events = acc.Histograms("logits")
    assert len(logits_events) == 1  # one epoch
    assert np.isfinite(logits_events[0].histogram_value.sum)


def test_histograms_off_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("PCC_TENSORBOARD", raising=False)
    monkeypatch.delenv("PCC_TB_HISTOGRAMS", raising=False)
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
    )
    w = ModelWrapper(model, learning_rate=1e-2, epochs=1, log_dir=str(tmp_path))
    w.fit([_tabular_batch()])
    assert not list(tmp_path.glob("events.out.tfevents*"))
