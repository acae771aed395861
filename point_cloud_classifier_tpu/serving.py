"""Deployment export: serialize a trained run to portable StableHLO.

The reference deploys by unpickling torch modules next to the training code
(`train.py:30-85` loads checkpoints into freshly-constructed model classes)
— serving requires the full framework at inference time.  This module
exports the jit'd eval computation itself via ``jax.export``: weights are
baked in as constants, so the artifact is a self-contained program an
inference host can run with nothing but jax installed — no model classes,
no config resolution, no checkpoint format.

TPU-native design points:

- **Static-shape buckets are the export unit.**  The whole framework runs
  on pow2-bucketed batch shapes (SURVEY §3's ragged→static design); each
  distinct shape is one compiled program, so it is also one exported
  artifact.  A manifest maps shape-key → file and the loader picks by the
  incoming batch's shapes — exactly the dispatch the training pipeline
  already does against its jit cache.
- **Artifacts are pure StableHLO.**  Export traces under
  ``ops.dispatch.force_xla()``, which closes EVERY Pallas gate (DeepSets
  fused φ, GraphNet kNN/GAT/in-row kernels) so no ``tpu_custom_call`` is
  embedded even when tracing on a TPU host — the same program serves on
  TPU, CPU, or GPU hosts.  The int8 MXU path (``quant="int8"``,
  ops/quant.py) survives export: quantization is plain StableHLO
  (round/clip/convert + s8 dot).
- **Probabilities out, not logits** — the artifact bakes in the decision
  head (sigmoid), matching ``ModelWrapper.predict``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Sequence

import numpy as np

MANIFEST = "manifest.json"


def _shape_key(batch: Dict) -> str:
    """Canonical key for one bucketed batch shape (order-independent)."""
    items = sorted(
        (k, tuple(np.shape(v)), str(np.asarray(v).dtype) if not hasattr(v, "dtype") else str(v.dtype))
        for k, v in batch.items()
    )
    return ";".join(f"{k}:{'x'.join(map(str, s))}:{d}" for k, s, d in items)


def _eval_fn(wrapper, quant: str = "none"):
    """Build the serving computation: batch dict → per-event probabilities.

    Weights are closed over (→ baked into the export as constants).  The
    φ path is forced to XLA for portability; ``quant="int8"`` routes the
    DeepSets matmul chain to the s8 path (portable StableHLO too).
    """
    import jax

    from point_cloud_classifier_tpu.models.deep_sets import DeepSets

    model = wrapper.model
    if isinstance(model, DeepSets):
        # fused_phi="on" is an explicit user override that skips the
        # dispatch gate — clone it off so the artifact stays portable
        updates = {"fused_phi": "off"}
        if quant != "none":
            updates["quant"] = quant
        model = model.clone(**updates)
    elif quant != "none":
        raise ValueError(f"quant={quant!r} is only supported for DeepSets")
    variables = {"params": wrapper.params, "batch_stats": wrapper.batch_stats}

    def fn(batch):
        logits = model.apply(variables, batch, train=False)
        return jax.nn.sigmoid(logits)

    return fn


def export_run(
    model_dir: str,
    out_dir: str = None,
    quant: str = "none",
    loaders: Sequence[Iterable] = None,
    platforms: Sequence[str] = None,
) -> str:
    """Export a finished run dir to ``<model_dir>/exported/``.

    One ``.stablehlo`` artifact per distinct bucketed batch shape seen in
    the run's loaders (default: its test loader), plus ``manifest.json``.
    Returns the export directory.

    ``platforms`` defaults to the current backend; pass e.g.
    ``("cpu", "tpu")`` to emit one artifact servable on both.
    """
    import jax
    import jax.export as jex

    from point_cloud_classifier_tpu.factory import (
        get_dataloader,
        get_model,
        resolve_quant,
    )
    from point_cloud_classifier_tpu.ops.dispatch import force_xla
    from point_cloud_classifier_tpu.utils.config import load_config

    config = load_config(os.path.join(model_dir, "config.yaml"))
    model_name = config["meta"]["model_name"]
    if model_name == "logistic_regression":
        raise ValueError(
            "logistic_regression serves via its closed-form scorer; "
            "export covers the jit'd network models"
        )
    dataset_name = config["meta"]["dataset_name"]
    quant = resolve_quant(config, model_name, quant)
    wrapper = get_model(model_name=model_name, config=config, model_dir=model_dir)
    if loaders is None:
        loaders = [get_dataloader(dataset_name, config).get_test_loader()]

    fn = _eval_fn(wrapper, quant=quant)
    out_dir = out_dir or os.path.join(model_dir, "exported")
    os.makedirs(out_dir, exist_ok=True)

    manifest = {
        "model": model_name,
        "dataset": dataset_name,
        "quant": quant,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "artifacts": {},
    }
    n = 0
    for loader in loaders:
        for batch in loader:
            key = _shape_key(batch)
            if key in manifest["artifacts"]:
                continue
            abstract = {
                k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
                for k, v in batch.items()
            }
            # trace with every Pallas gate forced to the XLA path: on a
            # TPU host GraphNet would otherwise embed tpu_custom_call ops
            # (kNN/GAT/in-row kernels), breaking the pure-StableHLO
            # portability contract (ops/dispatch.py)
            with force_xla():
                exported = jex.export(jax.jit(fn), platforms=platforms)(abstract)
            fname = f"shape_{n}.stablehlo"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exported.serialize())
            manifest["artifacts"][key] = fname
            n += 1
    if not manifest["artifacts"]:
        raise ValueError("no batches produced by the export loaders")
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=4)
    return out_dir


class ExportedModel:
    """Serve from an export directory — no model classes or checkpoints.

    Deserializes each shape's StableHLO artifact lazily and dispatches by
    the incoming batch's shape key (the same static-shape contract the
    training pipeline's jit cache uses).
    """

    def __init__(self, export_dir: str):
        with open(os.path.join(export_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.export_dir = export_dir
        self._loaded: Dict[str, object] = {}

    def _artifact(self, key: str):
        import jax.export as jex

        if key not in self._loaded:
            fname = self.manifest["artifacts"].get(key)
            if fname is None:
                known = "\n  ".join(self.manifest["artifacts"])
                raise KeyError(
                    f"no exported artifact for batch shape {key}; "
                    f"exported shapes:\n  {known}"
                )
            with open(os.path.join(self.export_dir, fname), "rb") as f:
                self._loaded[key] = jex.deserialize(f.read())
        return self._loaded[key]

    def __call__(self, batch: Dict) -> np.ndarray:
        """Per-event probabilities for one bucketed batch dict."""
        exported = self._artifact(_shape_key(batch))
        # exported.call expects the same pytree the export traced: one dict
        return np.asarray(exported.call(batch))

    def predict(self, loader: Iterable, return_prob: bool = False):
        """Mirror ``ModelWrapper.predict`` over an iterable of batches."""
        y_true, y_out = [], []
        for batch in loader:
            probs = self(batch)
            mask = np.asarray(batch["y_mask"]).astype(bool)
            p = probs[mask]
            y_true.append(np.asarray(batch["y"])[mask])
            y_out.append(p if return_prob else (p >= 0.5).astype(np.float32))
        return np.concatenate(y_true), np.concatenate(y_out)
