"""Device mesh + declarative sharding rules.

The reference is single-device (its whole device policy is cuda-or-cpu at
`models/wrapper.py:22`; no distributed backend exists anywhere — SURVEY §2).
The TPU-native scale-out design is the idiomatic JAX one: declare a
``jax.sharding.Mesh`` over the slice, annotate array shardings, and let XLA
emit the ICI collectives.  No NCCL/MPI-style backend code exists here *by
design* — the mesh + ``NamedSharding`` annotations below are the entire
distribution layer.

Axes:

- ``data``: batch-dimension data parallelism.  Every batch array produced by
  the loaders (``batching.py``) has a leading dim that is either the batch
  size ``B`` or a power-of-two flattened point/edge buffer, both divisible by
  any power-of-two mesh size — so the leading dim is sharded and XLA turns
  the loss/grad reductions into ``psum`` over ICI.
- ``model``: tensor parallelism for wide layers.  Weight matrices whose last
  dim divides the axis size are sharded column-wise; XLA inserts the matching
  all-gathers/reduce-scatters.  For the reference model sizes (≤~1M params)
  this axis is usually 1, but the layouts are declared so the same code runs
  TP>1 unchanged (SURVEY §2 parallelism table).

Batch-norm under data parallelism (SURVEY §7 hard part iv) is handled by
construction: ``MaskedBatchNorm`` computes its batch statistics with global
reductions inside the jit'd step, so when the batch is sharded XLA emits the
cross-replica ``psum`` automatically — statistics are exact global-batch
moments, identical to the single-device run (asserted by
tests/test_parallel.py's DP-equals-single-device tests).  No ``sync_batch_
stats`` plumbing exists because none is needed under SPMD.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over ``devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_model < 1 or n_data * n_model > len(devices):
        # n_data < 1 covers n_model > len(devices): the floor division
        # above yields 0, which would slip past the product check (0 > N
        # is false) and build a zero-device mesh whose first sharding
        # call dies in a ZeroDivisionError far from the misconfiguration
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {max(n_data, 1) * n_model} "
            f"devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def default_mesh() -> Mesh:
    """1-axis-data mesh over every visible device."""
    return make_mesh()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, NamedSharding]:
    """Leading-dim ``data`` sharding for every shardable batch array.

    Arrays whose leading dim does not divide the data-axis size (never happens
    with the power-of-two loaders, but guard anyway) stay replicated.
    """
    n_data = mesh.shape["data"]
    out = {}
    for key, arr in batch.items():
        if arr.ndim >= 1 and arr.shape[0] % n_data == 0 and arr.shape[0] > 0:
            out[key] = NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1))))
        else:
            out[key] = replicated(mesh)
    return out


def stacked_batch_sharding(mesh: Mesh, x) -> NamedSharding:
    """Sharding for one leaf of a ``[K, ...]`` fuse-window stack.

    Step fusion (``ModelWrapper.fuse_steps``) stacks K loader batches on a
    new leading fuse axis; under a mesh each batch was sharded by
    ``batch_shardings`` BEFORE stacking, so the per-batch leading dim now
    sits at axis 1.  The rule here mirrors ``batch_shardings`` one axis
    over: axis 1 shards over ``data`` when divisible, the fuse axis K is
    never sharded (``lax.scan`` consumes it sequentially), everything else
    stays replicated.
    """
    n_data = mesh.shape["data"]
    if getattr(x, "ndim", 0) >= 2 and x.shape[1] % n_data == 0 and x.shape[1] > 0:
        return NamedSharding(mesh, P(None, "data", *([None] * (x.ndim - 2))))
    return replicated(mesh)


def param_shardings(mesh: Mesh, params) -> object:
    """Column-wise ``model`` sharding for big 2-D weights; replicate the rest.

    The rule is declarative: any rank-2 parameter whose output (last) dim is
    divisible by the model-axis size and at least 2x that size gets sharded
    column-wise.  With ``n_model == 1`` this degrades to full replication.
    """
    n_model = mesh.shape["model"]

    def rule(x) -> NamedSharding:
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[-1] % n_model == 0
            and x.shape[-1] >= 2 * n_model
        ):
            return NamedSharding(mesh, P(None, "model"))
        return replicated(mesh)

    return jax.tree.map(rule, params)


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Device-put a host batch with its data-parallel shardings."""
    shardings = batch_shardings(mesh, batch)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
