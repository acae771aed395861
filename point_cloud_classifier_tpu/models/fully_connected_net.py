"""MLP classifier over the 9 tabular features.

Architecture parity with the reference (`models/fully_connected_net.py:4-29`):
``[Linear → BatchNorm1d? → ReLU]*`` over ``hidden_layers`` then a final
Linear to ``output_dim``.  Consumes the padded tabular batch
(``x [B, F]``, ``y_mask [B]``); the mask keeps batch-norm statistics exact
for the final partial batch of an epoch.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from point_cloud_classifier_tpu.models.common import (
    MaskedBatchNorm,
    TorchLinear,
    resolve_dtype,
)


class FullyConnectedNet(nn.Module):
    input_dim: int
    hidden_layers: Sequence[int]
    batch_normalization: bool
    output_dim: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True) -> jnp.ndarray:
        x = batch["x"].astype(resolve_dtype(self.compute_dtype))
        mask = batch.get("y_mask")
        for width in self.hidden_layers:
            x = TorchLinear(width)(x)
            if self.batch_normalization:
                x = MaskedBatchNorm()(x, mask=mask, train=train)
            x = nn.relu(x)
        return TorchLinear(self.output_dim)(x).astype(jnp.float32)
