"""DeepSets over flattened point batches.

Semantics parity with the reference (`models/deep_sets.py:5-160`):

- φ point-encoder: per hidden width, a ResidualBlock when
  ``residual_block`` and the width repeats (``x + act(LN?(Linear(x)))``,
  reference `:149-160`), else ``Linear → LayerNorm? → act``; then one extra
  ``Linear(last, last)`` (`:55`)
- symmetric pooling over each event's points: ``"sum"`` is actually
  sum/√N (the reference's quirk at `:99` — kept), ``"mean"``, or ``"max"``
- ρ set-encoder: ``Linear → LayerNorm? → act`` per width, then the
  classification Linear

The reference's per-event Python chunk loop (`:92-104`) becomes one segment
reduction over the static ``[P_pad, H]`` layout — φ is a single MXU matmul
chain over all points of the batch, pooling is a one-hot matmul / scatter-add
(see ``ops/segment.py``), padding points land in segment ``B`` and are
dropped.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from point_cloud_classifier_tpu.models.common import (
    TorchLayerNorm,
    TorchLinear,
    activation_fn,
    resolve_dtype,
)
from point_cloud_classifier_tpu.ops.segment import (
    segment_count,
    segment_max,
    segment_sum,
)


class ResidualBlock(nn.Module):
    dim: int
    activation: str
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = TorchLinear(self.dim)(x)
        if self.layer_norm:
            out = TorchLayerNorm()(out)
        return x + activation_fn(self.activation)(out)


class _MLPStack(nn.Module):
    widths: Sequence[int]
    activation: str
    layer_norm: bool
    residual_block: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = activation_fn(self.activation)
        last_dim = x.shape[-1]
        for width in self.widths:
            if self.residual_block and last_dim == width:
                x = ResidualBlock(width, self.activation, self.layer_norm)(x)
            else:
                x = TorchLinear(width)(x)
                if self.layer_norm:
                    x = TorchLayerNorm()(x)
                x = act(x)
            last_dim = width
        return x


class DeepSets(nn.Module):
    input_dim: int
    phi_layers: Sequence[int]
    rho_layers: Sequence[int]
    output_dim: int
    activation: str
    layer_norm: bool = True
    residual_block: bool = False
    sparse_batching: bool = True  # config compat; layout is always flattened
    pooling: str = "sum"
    compute_dtype: str = "float32"  # "bfloat16" runs the MXU chain in bf16
    # (params and pooling reductions stay f32)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True) -> jnp.ndarray:
        points, seg = batch["points"], batch["seg"]
        points = points.astype(resolve_dtype(self.compute_dtype))
        seg = seg.astype(jnp.int32)  # loaders may ship compact int16 ids
        num_events = batch["y"].shape[0]
        num_segments = num_events + 1  # final slot collects padding points

        # φ over every point in the batch — one dense MXU chain
        h = _MLPStack(self.phi_layers, self.activation, self.layer_norm, self.residual_block)(
            points
        )
        phi_dim = self.phi_layers[-1] if self.phi_layers else self.input_dim
        h = TorchLinear(phi_dim)(h)

        # pooling reductions in f32: events span up to 10^4 points and bf16
        # accumulation over that many terms drifts
        h32 = h.astype(jnp.float32)
        counts = segment_count(seg, num_segments)[:num_events]
        safe = jnp.maximum(counts, 1.0).reshape(-1, 1)
        if self.pooling == "sum":
            pooled = segment_sum(h32, seg, num_segments)[:num_events] / jnp.sqrt(safe)
        elif self.pooling == "mean":
            pooled = segment_sum(h32, seg, num_segments)[:num_events] / safe
        elif self.pooling == "max":
            pooled = segment_max(h32, seg, num_segments)[:num_events]
        else:
            raise ValueError("pooling must be 'mean', 'sum', or 'max'")
        pooled = pooled.astype(h.dtype)

        out = _MLPStack(self.rho_layers, self.activation, self.layer_norm)(pooled)
        return TorchLinear(self.output_dim)(out).astype(jnp.float32)
