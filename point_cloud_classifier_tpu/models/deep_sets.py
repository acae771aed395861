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
reduction over the static ``[P_pad, H]`` layout.  φ parameters are declared
flat so the same weights drive two implementations of the hot path:

- the XLA path (``ops/fused_phi.phi_forward_xla`` + segment ops) — always
  correct, used on CPU / for max pooling / with layer-norm, and the
  measured-fastest TRAINING path at the shipped widths (whole-step A/B:
  256: 1.01 vs 1.04 ms/step fused with exact-tanh gelu; with the
  QuickGELU + explicit-exp sigmoid defaults the gap WIDENED to 377.2k
  vs 282.6k clouds/sec — the fused backward's in-tile recompute is 4/3
  the FLOPs and now recomputes less-expensive activations, while the
  XLA path banked the same activation savings directly)
- the fused Pallas kernel (``ops/fused_phi.phi_pool``, fwd + bwd kernels)
  — φ matmul chain and segment-sum pooling in one kernel, per-point
  activations never touch HBM (SURVEY §3.3's #1 fusion target).  ``auto``
  selects it on TPU for EVAL/INFERENCE at φ width ≥ 512, where
  forward-only has no recompute penalty and the activation-traffic saving
  is pure win (1.44× op-level at 512, growing with width); training under
  ``auto`` stays on XLA until the fused pair measurably wins whole-step
  (``fused_phi="on"`` forces it for A/B work)

On every path except ``"tail"`` the final φ Linear (bare — no
activation/LN, reference `:55`) is applied AFTER pooling by default: it
commutes with mean and sum/√N pooling, so the [P, H]×[H, H] matmul runs
per-event instead of per-point and h3 never exists.  On the fused Pallas
path the kernel then runs the HIDDEN chain only (one less matmul per tile
forward, one less vjp layer of in-tile recompute backward — the 4/3
recompute penalty above shrinks accordingly); on the int8 path the
per-event final runs in f32, which is also one less quantization.
Exactness pinned by tests/test_models.py::test_postpool_final_linear_is_exact;
``PCC_PHI_POSTPOOL=0`` restores the reference's per-point placement.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from point_cloud_classifier_tpu.models.common import (
    TorchLayerNorm,
    TorchLinear,
    _torch_uniform,
    activation_fn,
    resolve_dtype,
)
from point_cloud_classifier_tpu.ops.fused_phi import (
    phi_forward_xla,
    phi_hidden_xla,
    phi_pool,
)
from point_cloud_classifier_tpu.ops.segment import (
    counts_to_segment_ids,
    segment_count,
    segment_max,
    segment_sum,
    spread_by_segment,
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
    fused_phi: str = "auto"  # "auto": Pallas kernel on TPU where measured
    # to win — eval/infer at φ width ≥512 (forward-only, no recompute
    # penalty); XLA elsewhere incl. all training (see _use_pallas);
    # "on": always Pallas (interpreted off-TPU); "off": always XLA;
    # "tail": hidden φ layers on XLA (save-residuals autodiff) + the final
    # linear AND pooling in the Pallas kernel pair (empty spec — affine, so
    # the backward is closed-form with ZERO recompute).  Measured a 1.3%
    # whole-step REGRESSION at the flagship shape (318.0k vs 322.1k
    # clouds/sec, same window): the XLA path's segment_sum is already a
    # one-hot MXU contraction, so there were no h3 scatter round-trips to
    # save — kept opt-in (docs/kernels.md tuning table)
    factored_cols: Sequence[int] = ()  # wire contract with the loader's
    # factor_event_cols: per-event-constant feature columns arrive as
    # "event_feats" [B+1, C] and are re-gathered by segment id on device
    quant: str = "none"  # "int8": EVAL/INFER φ matmuls on the s8 MXU path
    # (ops/quant.py — dynamic per-row activations × per-channel weights,
    # s32 accumulate; v5e int8 peak is 2× bf16 and int8 activations halve
    # the [P, H] HBM traffic).  Training always runs the float path;
    # layer_norm falls back to float (LN rescales rows mid-chain).
    # New TPU-native serving capability — the reference serves f32 torch.

    def _phi_spec_params(self):
        """Flat φ parameters (torch Linear init) + the layer spec."""
        spec, params = [], []
        last = self.input_dim
        for i, width in enumerate(self.phi_layers):
            kind = (
                "residual" if (self.residual_block and last == width) else "plain"
            )
            bound = last**-0.5
            w = self.param(f"phi_{i}_kernel", _torch_uniform(bound), (last, width))
            b = self.param(f"phi_{i}_bias", _torch_uniform(bound), (width,))
            if self.layer_norm:
                ls = self.param(f"phi_{i}_ln_scale", nn.initializers.ones, (width,))
                lb = self.param(f"phi_{i}_ln_bias", nn.initializers.zeros, (width,))
            else:
                ls = lb = None
            spec.append((kind, self.layer_norm))
            params.append((w, b, ls, lb))
            last = width
        bound = last**-0.5
        wf = self.param("phi_final_kernel", _torch_uniform(bound), (last, last))
        bf = self.param("phi_final_bias", _torch_uniform(bound), (last,))
        params.append((wf, bf))
        return tuple(spec), tuple(params)

    def _use_pallas(self, train: bool = True) -> bool:
        if self.fused_phi == "off" or self.layer_norm or self.pooling == "max":
            return False
        if self.fused_phi == "on":
            return True
        # "auto" is measurement-driven (whole-train-step A/B on v5e,
        # P=65536, fuse 16 — docs/kernels.md): XLA EVERYWHERE.
        # - TRAINING: the fused fwd+bwd pair ties at best (256: 1.04 vs
        #   1.01 ms/step; 512: 2.39 vs 2.31) — the backward kernel's
        #   in-tile recompute is 4/3 the FLOPs of XLA's save-residuals
        #   autodiff.  (Round 1 routed width ≥512 to the kernel from an
        #   op-level A/B; whole-step that was a regression: the then-
        #   XLA-replay backward re-paid the forward, 2.65 vs 2.31.)
        # - EVAL/INFER: the width ≥512 forward-kernel crossover that held
        #   before the post-pool final-linear default was re-measured
        #   AFTER it (2026-08-18, device-truth eval, bench --eval-device):
        #   XLA wins at both widths now (256: 248.0k vs 223.2k; 512:
        #   191.3k vs 172.1k clouds/sec) — post-pool removed the final
        #   per-point matmul from BOTH arms, and what remains of the XLA
        #   chain fuses well enough that the kernel's saved [P,H]
        #   round-trips no longer pay for its epilogue.  fused_phi="on"
        #   keeps the kernel reachable (tests, future re-tuning).
        return False

    def _phi_mode(self, train: bool = True) -> str:
        """'int8' (quantized eval) | 'pallas' (full fusion) | 'tail' (XLA
        hidden chain + fused final-linear+pool) | 'xla'."""
        if not train and self.quant == "int8" and not self.layer_norm:
            return "int8"
        if self._use_pallas(train):
            return "pallas"
        if self.fused_phi == "tail" and self.pooling in ("sum", "mean"):
            return "tail"
        return "xla"

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True) -> jnp.ndarray:
        points = batch["points"].astype(resolve_dtype(self.compute_dtype))
        num_events = batch["y"].shape[0]
        num_segments = num_events + 1  # final slot collects padding points
        # DENSE wire: points [B, M, Fw] with per-cloud rows (padding
        # INSIDE each row, gated by seg_counts).  Segment structure is
        # then implicit-uniform, so every segment op on this path
        # degenerates to a reshape: pooling becomes a masked [B, M, H]
        # row-sum (the flat wire's one-hot pool contraction — ~1/3 of the
        # flagship train step's MACs — never exists), per-point ids are
        # iota // M, and the factored-column spread is a broadcast.
        dense_wire = points.ndim == 3
        if dense_wire:
            row_m = points.shape[1]
            points = points.reshape(num_events * row_m, points.shape[-1])
            seg = None  # synthesized on demand (iota // M, gather-free)
        elif "seg" in batch:
            seg = batch["seg"].astype(jnp.int32)  # compact int16 ids allowed
        else:
            # counts wire encoding (~1KB instead of ~P·2B on the H2D link):
            # rebuild the per-point ids on device, gather-free (a
            # jnp.repeat here profiled at ~0.5 ms/step — see
            # ops/segment.counts_to_segment_ids)
            seg = counts_to_segment_ids(batch["seg_counts"], points.shape[0])

        if self.factored_cols:
            # rebuild the full per-point feature matrix in original column
            # order; event_feats columns arrive in ASCENDING original-column
            # order (the loader sorts factor_event_cols) so sort here too
            factored = sorted(self.factored_cols)
            if dense_wire:
                # uniform stride: the per-point spread is a broadcast —
                # cheaper even than the one-hot MXU spread
                ef = batch["event_feats"][:num_events].astype(points.dtype)
                per_point = jnp.broadcast_to(
                    ef[:, None, :], (num_events, row_m, ef.shape[-1])
                ).reshape(points.shape[0], ef.shape[-1])
            else:
                # one-hot MXU spread, not a row gather (~0.5 ms/step saved)
                per_point = spread_by_segment(
                    batch["event_feats"], seg, dtype=points.dtype
                )
            cols, ki, fi = [], 0, 0
            for c in range(self.input_dim):
                if c in factored:
                    cols.append(per_point[:, fi : fi + 1])
                    fi += 1
                else:
                    cols.append(points[:, ki : ki + 1])
                    ki += 1
            points = jnp.concatenate(cols, axis=1)

        spec, params = self._phi_spec_params()
        if "seg_counts" in batch:
            # the counts wire already carries per-event sizes — no need to
            # re-reduce a [P]-length array on the hot path
            counts = batch["seg_counts"][:num_events].astype(jnp.float32)
        else:
            counts = segment_count(seg, num_segments)[:num_events]
        safe = jnp.maximum(counts, 1.0).reshape(-1, 1)

        mode = self._phi_mode(train)
        if dense_wire and mode in ("pallas", "tail"):
            # the fused kernels pool by segment id with no per-point
            # validity, and the dense wire's padding lives INSIDE rows
            # (φ(0) ≠ 0 would contaminate the sums) — the dense wire is
            # an XLA-path layout.  Decided BEFORE post_pool below so a
            # fused_phi="tail" config still gets the post-pool final
            # linear on dense batches.
            mode = "xla"
        # The final φ Linear has NO activation or LayerNorm after it
        # (reference models/deep_sets.py:55 — bare even when
        # layer_norm=True), so it COMMUTES with the linear poolings:
        #   mean:    (1/N) Σ (W h_i + b) = W (Σ h_i / N) + b
        #   sum/√N:  (1/√N) Σ (W h_i + b) = W (Σ h_i / √N) + b·√N
        # Applying it post-pool runs the [·, H]×[H, H] matmul over B
        # events instead of P points (P/B ≈ 256× fewer MACs at the
        # flagship shape) and h3 + its cotangent never exist — roughly
        # halving both per-point MXU work and the [P, H] activation HBM
        # round-trips of the training step.  Applies on every φ path
        # (XLA, fused Pallas — whose kernel then runs one less matmul
        # per tile fwd and one less vjp layer bwd — and int8, where the
        # f32 per-event final is also one less quantization) except
        # "tail", whose point IS fusing that linear with the pool.
        # Mathematically exact (float rounding only); trace-time kill
        # switch PCC_PHI_POSTPOOL=0 for A/B.
        post_pool = (
            mode != "tail"
            and self.pooling in ("sum", "mean")
            and os.environ.get("PCC_PHI_POSTPOOL", "1") != "0"
        )
        phi_params = params[:-1] if post_pool else params
        if mode in ("pallas", "tail"):
            interpret = jax.default_backend() != "tpu"
            if mode == "tail":
                # hidden chain on XLA (fastest measured training form at
                # the shipped widths), then final linear + pooling in one
                # kernel pair: h3 and its cotangent never touch HBM, and
                # the affine tail's backward has no recompute at all
                h = phi_hidden_xla(points, spec, params[:-1], self.activation)
                total = phi_pool(
                    h, seg, (), (params[-1],), self.activation, num_segments,
                    interpret,
                )[:num_events]
            else:
                total = phi_pool(
                    points, seg, spec, phi_params, self.activation,
                    num_segments, interpret,
                )[:num_events]
            if self.pooling == "sum":
                pooled = total / jnp.sqrt(safe)
            elif self.pooling == "mean":
                pooled = total / safe
            else:
                raise ValueError("pallas path supports 'sum'/'mean' pooling")
        else:
            # φ over every point — one dense MXU chain; pooling reductions in
            # f32 (events span up to 10^4 points; bf16 accumulation drifts)
            if mode == "int8":
                from point_cloud_classifier_tpu.ops.quant import phi_forward_int8

                phi_fn = lambda pts, prm: phi_forward_int8(  # noqa: E731
                    pts, spec, prm, self.activation
                )
            else:
                phi_fn = lambda pts, prm: phi_forward_xla(  # noqa: E731
                    pts, spec, prm, self.activation
                )
            remat = os.environ.get("PCC_PHI_REMAT", "auto")
            if remat == "1" or (
                remat == "auto"
                and post_pool
                and mode != "int8"
                # WIDTH-gated (round-5 policy audit, docs/kernels.md):
                # remat wins at width 256 (+38% at B=256, +7.1% at B=64)
                # but LOSES at every measured wider draw (512: −3.6%;
                # 1024: −1.5% at B=64, −5.7% at B=256 — the rematerialized
                # chain's FLOPs grow quadratically in width while the
                # saved [P, H] residual traffic grows linearly), and the
                # B=64/B=256 agreement shows width, not batch, drives the
                # trade.  384 splits the measured 256-win / 512-loss.
                and max(self.phi_layers, default=0) <= 384
            ):
                # Rematerialize the φ chain in the backward instead of
                # saving [P, H] residuals — the fused kernel's HBM-vs-FLOPs
                # trade, but XLA-scheduled.  Measured: a LOSS at the
                # 3-layer per-point chain (228.9k vs 322.1k clouds/sec,
                # docs/kernels.md) but a WIN once post-pool shrinks the
                # per-point chain to the 2 hidden layers (441.3k vs 425.5k
                # same-window, ab_session 2026-08-18) — so "auto" remats
                # exactly when post_pool is on.  PCC_PHI_REMAT=0/1 forces.
                phi_fn = jax.checkpoint(phi_fn)
            h = phi_fn(points, phi_params)
            h32 = h.astype(jnp.float32)
            if dense_wire:
                # uniform rows: pooling is a masked [B, M, H] row
                # reduction — O(P·H) VPU adds instead of the one-hot
                # [P, B+1] MXU contraction (P·B·H MACs, ~1/3 of the
                # flagship step's FLOPs fwd+bwd).  The mask gates the
                # in-row padding (φ(0) ≠ 0: the hidden chain's biases)
                mask = (
                    jax.lax.iota(jnp.int32, row_m)[None, :]
                    < counts[:, None]
                ).astype(jnp.float32)
                rows = h32.reshape(num_events, row_m, h32.shape[-1])
                if self.pooling in ("sum", "mean"):
                    # batched [1, M] @ [M, H] matvec with the mask as lhs:
                    # the masked-sum VPU reduction hits an XLA layout
                    # cliff at some M (−32% whole-step at M=320 vs
                    # proportional at 264/288), while the MXU matvec is
                    # M-shape-robust; HIGHEST keeps the f32 accumulation
                    # (events span 10^4 points; bf16x1 would round the
                    # operand before summing) at ~P·H MACs — noise
                    total = jnp.einsum(
                        "bm,bmh->bh", mask, rows,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    if self.pooling == "sum":
                        pooled = total / jnp.sqrt(safe)
                    else:
                        pooled = total / safe
                elif self.pooling == "max":
                    mask = mask[:, :, None]
                    pooled = jnp.max(
                        jnp.where(mask > 0, rows, -jnp.inf), axis=1
                    )
                    # empty events: the flat segment_max convention is 0
                    pooled = jnp.where(
                        counts[:, None] > 0, pooled, 0.0
                    )
                else:
                    raise ValueError(
                        "pooling must be 'mean', 'sum', or 'max'"
                    )
            elif self.pooling == "sum":
                pooled = segment_sum(h32, seg, num_segments)[:num_events] / jnp.sqrt(safe)
            elif self.pooling == "mean":
                pooled = segment_sum(h32, seg, num_segments)[:num_events] / safe
            elif self.pooling == "max":
                pooled = segment_max(h32, seg, num_segments)[:num_events]
            else:
                raise ValueError("pooling must be 'mean', 'sum', or 'max'")
        if post_pool:
            wf, bf = params[-1]
            if self.pooling == "sum":
                bias_scale = jnp.sqrt(counts).reshape(-1, 1)
            else:
                # empty (fully padded) events pool to 0 on the per-point
                # path — they never see the bias — so mask it here too
                bias_scale = (counts > 0).astype(jnp.float32).reshape(-1, 1)
            pooled = (
                jnp.dot(
                    pooled.astype(jnp.float32),
                    wf.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                + bf.astype(jnp.float32) * bias_scale
            )

        pooled = pooled.astype(points.dtype)
        out = _MLPStack(self.rho_layers, self.activation, self.layer_norm)(pooled)
        return TorchLinear(self.output_dim)(out).astype(jnp.float32)
