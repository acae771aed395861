"""Asynchronous host→device batch prefetch.

The reference moves each batch to the accelerator synchronously inside the
hot loop (`models/wrapper.py:54`), serializing PCIe/tunnel transfer with
compute.  On TPU the jit'd step is so fast (~0.1 ms for the flagship
workload) that an unoverlapped transfer dominates the step time ~10:1.

``prefetch_to_device`` keeps ``size`` batches in flight: ``jax.device_put``
is asynchronous, so issuing the next transfers before the consumer blocks on
the current step overlaps H2D DMA with device compute — the standard
double-buffering pattern, host-side (the device-side variant is what a
Pallas DMA pipeline does within a kernel).
"""

from __future__ import annotations

import collections
from typing import Dict, Iterable, Iterator, Optional

import jax
import numpy as np


def prefetch_to_device(
    iterator: Iterable[Dict[str, np.ndarray]],
    size: int = 2,
    mesh=None,
) -> Iterator[Dict[str, jax.Array]]:
    """Yield device-resident batches, keeping ``size`` transfers in flight.

    With ``mesh`` the batches are placed with their data-parallel shardings
    (see ``parallel/mesh.py``); otherwise on the default device.
    """
    if mesh is not None:
        from point_cloud_classifier_tpu.parallel.mesh import shard_batch

        put = lambda b: shard_batch(mesh, b)
    else:
        put = lambda b: {k: jax.device_put(v) for k, v in b.items()}

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
