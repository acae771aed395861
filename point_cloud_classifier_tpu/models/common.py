"""Shared model building blocks.

Initialization and normalization semantics deliberately match PyTorch's
defaults, since accuracy-parity targets compare against reference models
trained with those defaults:

- Linear: weight AND bias ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  (torch's kaiming_uniform_(a=sqrt(5)) reduces to exactly this bound)
- BatchNorm1d: eps 1e-5, momentum 0.1, normalize with *biased* batch
  variance, update running_var with the *unbiased* variance
- LayerNorm: eps 1e-5
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def activation_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name not in ("relu", "gelu", "silu", "tanh"):
        raise ValueError(f"Unknown activation: {name}")
    # "gelu" resolves to quick_gelu unless PCC_GELU=exact|poly
    # (ops/activations.py) — keeps the MLP stacks consistent with the φ
    # kernels, which share the same resolver
    from point_cloud_classifier_tpu.ops.activations import resolve_activation

    return resolve_activation(name)


def _torch_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear's default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        bound = fan_in**-0.5 if fan_in > 0 else 0.0
        kernel = self.param("kernel", _torch_uniform(bound), (fan_in, self.features))
        # params live in f32; under mixed precision the matmul runs at the
        # activation dtype (bf16 feeds the MXU at full rate) with f32 accum
        y = jnp.dot(
            x, kernel.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", _torch_uniform(bound), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def resolve_dtype(name) -> jnp.dtype:
    """'float32' | 'bfloat16' | 'float16' (config strings) → jnp dtype."""
    if name is None:
        return jnp.float32
    return jnp.dtype(name)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows, ignoring masked (padding) rows.

    Replicates torch.nn.BatchNorm1d: biased variance for normalization,
    unbiased variance into the running stats, momentum 0.1, eps 1e-5.  The
    mask is how static-shape padded batches keep exactly the reference's
    batch statistics (padding rows contribute nothing).
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        # statistics always in f32 — under bf16 compute (mixed precision)
        # batch moments would otherwise lose too much precision
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        if train:
            if mask is None:
                n = jnp.asarray(x.shape[0], dtype=x.dtype)
                mean = jnp.mean(x, axis=0)
                var = jnp.mean((x - mean) ** 2, axis=0)
            else:
                w = mask.reshape(-1, 1).astype(x.dtype)
                n = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(w * x, axis=0) / n
                var = jnp.sum(w * (x - mean) ** 2, axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(in_dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps 1e-5, affine)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # moments in f32 under mixed precision
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(in_dtype)
