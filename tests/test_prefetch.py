"""Device-prefetch path (PCC_PREFETCH=1) and the prefetch iterator."""

import numpy as np

from point_cloud_classifier_tpu.data.prefetch import prefetch_to_device
from point_cloud_classifier_tpu.models import FullyConnectedNet, ModelWrapper
from point_cloud_classifier_tpu.parallel import make_mesh
from tests.test_parallel import _tabular_batch


def test_prefetch_yields_all_batches_in_order():
    batches = [_tabular_batch(seed=s) for s in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for host, dev in zip(batches, out):
        np.testing.assert_array_equal(host["x"], np.asarray(dev["x"]))


def test_prefetch_with_mesh_shards():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    out = list(prefetch_to_device(iter([_tabular_batch()]), size=2, mesh=mesh))
    assert out[0]["x"].sharding.spec == P("data", None)


def test_background_iterator_order_and_exceptions():
    from point_cloud_classifier_tpu.data.background import BackgroundIterator

    items = list(range(20))
    assert list(BackgroundIterator(items, prefetch=3)) == items
    # re-iterable (fresh thread per pass)
    bg = BackgroundIterator(items)
    assert list(bg) == items and list(bg) == items

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    out = []
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="producer failed"):
        for x in BackgroundIterator(boom()):
            out.append(x)
    assert out == [1]


def test_wrapper_bg_loader_env_path(monkeypatch):
    monkeypatch.setenv("PCC_BG_LOADER", "1")
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
    )
    w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0)
    w.fit([_tabular_batch(seed=s) for s in range(3)], [_tabular_batch(seed=9)])
    _, probs = w.predict([_tabular_batch(seed=9)], return_prob=True)
    assert np.all(np.isfinite(probs))


def test_wrapper_prefetch_env_path(monkeypatch):
    monkeypatch.setenv("PCC_PREFETCH", "1")
    model = FullyConnectedNet(
        input_dim=9, hidden_layers=[8], batch_normalization=False, output_dim=1
    )
    w = ModelWrapper(model, learning_rate=1e-2, epochs=2, seed=0)
    w.fit([_tabular_batch(seed=s) for s in range(3)], [_tabular_batch(seed=9)])
    _, probs = w.predict([_tabular_batch(seed=9)], return_prob=True)
    assert np.all(np.isfinite(probs))
