"""Post-training int8 quantization for the inference hot path.

TPU-native rationale: the v5e MXU executes s8×s8→s32 matmuls at 394 TOPS —
2× its bf16 peak — and int8 activations halve the HBM traffic of the
per-point ``[P, H]`` tensors that dominate the DeepSets forward.  The
reference has no quantized path (it serves f32 torch —
`models/wrapper.py:116-124`); this module is new TPU-first capability for
the serving/latency story, not a parity item.

Scheme (the standard dynamic-quantization recipe, as in JAX AQT):

- **weights**: symmetric per-output-channel int8 — ``w ≈ w_q · s_w[1, N]``,
  scale from the column abs-max.  Quantized inside the jit so checkpoints
  stay f32; for [256, 256] layers the quantize cost is ~0.1% of the matmul.
- **activations**: symmetric dynamic per-row int8 — ``x ≈ x_q · s_x[P, 1]``
  with the scale from each row's abs-max (one VPU row-reduce).  Per-row
  scales cost nothing extra at rescale time (rank-1 outer product with the
  weight scales) and are markedly more accurate than per-tensor for
  heavy-tailed physics features.
- **accumulation**: ``lax.dot_general`` with int8 operands and
  ``preferred_element_type=int32`` — exact: |acc| ≤ K·127² ≈ 4.1e6 for
  K=256, far inside int32.  Rescale to f32, add bias, activation in bf16.

Residual blocks add the activation output to the ORIGINAL (unquantized)
carry, so quantization error does not compound through the skip path.

Accuracy: logits match f32 to ~1e-2 relative at the flagship widths
(tests/test_quant.py pins this plus end-to-end trained-model agreement).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Spec = Tuple[Tuple[str, bool], ...]

_QMAX = 127.0


def _quantize(x: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric abs-max int8 along ``axis``: ``x ≈ q · scale`` (scale f32).

    One home for the clip/round/epsilon policy so the row and column
    variants can't drift.  All-zero slices (padding) get the epsilon scale
    and quantize to 0.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row int8 (activations): ``scale: [P, 1]`` f32."""
    return _quantize(x, axis=-1)


def quantize_cols(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel int8 (weights): ``scale: [1, N]`` f32 (abs-max
    over the input axis)."""
    return _quantize(w, axis=0)


def int8_linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    out_dtype: jnp.dtype,
) -> jnp.ndarray:
    """``x @ w + b`` through the int8 MXU path.

    ``x`` is dynamically quantized per row, ``w`` per output channel; the
    s32 accumulator is rescaled by the rank-1 outer product of the two
    scale vectors (fuses into the dot's epilogue under XLA).
    """
    xq, sx = quantize_rows(x)
    wq, sw = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype)


def phi_forward_int8(
    points: jnp.ndarray, spec: Spec, params: Sequence, activation: str
) -> jnp.ndarray:
    """The DeepSets φ chain (hidden layers + final linear) with every
    matmul on the int8 MXU path.

    Mirrors :func:`ops.fused_phi.phi_forward_xla` (reference φ structure,
    `models/deep_sets.py:44-55`) minus layer-norm — LN rescales rows, so a
    quantized LN chain would need fused requantization; the shipped configs
    run ``layer_norm=False`` and the caller falls back to XLA otherwise.
    Residual carries stay unquantized (skip-path error does not compound).

    Like ``phi_forward_xla``, the final un-activated linear is applied only
    when its weights are present (``len(params) == len(spec) + 1``).  The
    hidden-only form backs the post-pool placement: the final Linear then
    runs per-EVENT in f32 after pooling — fewer per-point int8 MACs AND
    one less quantization in the chain (strictly more accurate).
    """
    from point_cloud_classifier_tpu.ops.activations import resolve_activation

    act = resolve_activation(activation)
    h = points
    for (kind, has_ln), layer in zip(spec, params):
        if has_ln:
            raise ValueError("phi_forward_int8 does not support layer_norm")
        w, b = layer[0], layer[1]
        out = act(int8_linear(h, w, b, h.dtype))
        h = h + out if kind == "residual" else out
    if len(params) == len(spec):
        return h
    wf, bf = params[-1][0], params[-1][1]
    return int8_linear(h, wf, bf, h.dtype)
