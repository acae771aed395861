"""Name-dispatch factories shared by the CLI and the serving modules.

These used to live in the top-level ``train.py`` script (mirroring the
reference's layout, reference `train.py:17-85`), but the serving surfaces
(``server.Scorer``, ``serving.export_run``) need them too, and a package
module importing the entry-point script is a layering inversion — it made
``point_cloud_classifier_tpu.server``/``serving`` unimportable unless the
repo root happened to be on ``sys.path``.  ``train.py`` re-exports
everything here, so its module-level API is unchanged.
"""

from __future__ import annotations

import os

from point_cloud_classifier_tpu.data import (
    Step2PointGraph,
    Step2PointPointCloud,
    Step2PointTabular,
)
from point_cloud_classifier_tpu.models import (
    DeepSets,
    FullyConnectedNet,
    GraphNet,
    LogRegression,
    ModelWrapper,
)

MODEL_DATASETS = {
    "logistic_regression": "s2pt",
    "fully_connected_net": "s2pt",
    "deep_sets": "s2ppc",
    "graph_net": "s2pg",
}


def get_dataloader(dataset_name: str, config: dict):
    """Dataset-name dispatch, mirroring reference `train.py:17-27`."""
    if dataset_name == "s2pt":
        return Step2PointTabular(**config["dataset"])
    if dataset_name == "s2ppc":
        ds_cfg = dict(config["dataset"])
        # default to the per-batch auto layout: ship a batch as DENSE
        # per-cloud rows [B, M, Fw] whenever that processes no more padded
        # points than the flat pow2 bucket (PointCloudLoader.__iter__) —
        # pooling then degenerates to a masked batched matvec instead of
        # the one-hot [P, B+1] MXU contraction (+15% whole-step measured,
        # BASELINE.md headline; exact numerics either way, test-pinned).
        # Unsorted batches mostly stay flat (the batch max size sets M);
        # dataset.length_sorted=true makes dense the steady state.
        ds_cfg.setdefault("layout", "auto")
        return Step2PointPointCloud(**ds_cfg)
    if dataset_name == "s2pg":
        ds_cfg = dict(config["dataset"])
        mdl_gate = config.get("model", {})
        if (
            mdl_gate.get("use_gat", False)
            and ds_cfg.get("use_weights", True)
            and ds_cfg.get("graph_layout") != "flat"
        ):
            # Zero-weight exactness gate for weighted GAT (see the comment
            # below): must apply even when the config pins graph_layout
            # explicitly — dense GAT masks on w != 0, so without the
            # loader's demotion check an exact-zero wire weight would
            # silently drop an edge the flat path keeps.
            ds_cfg.setdefault("dense_w_is_existence", True)
        if (
            mdl_gate.get("use_gat", False) or mdl_gate.get("sag_pool", False)
        ) and ds_cfg.get("graph_layout") != "flat":
            # attention softmax terms and the SAG score conv count a
            # duplicate-MERGED edge once on the dense wires where the flat
            # path counts each occurrence — the loader demotes to flat iff
            # the store actually contains a duplicate (same
            # check-then-demote pattern as dense_w_is_existence; simple
            # graphs keep the dense layout and its kernels).  Applies
            # whether the layout is pinned or defaulted below.
            ds_cfg.setdefault("flat_if_multigraph", True)
        if (
            not mdl_gate.get("use_gat", False)
            and mdl_gate.get("local_pooling", "add") == "max"
            and ds_cfg.get("graph_layout") in ("dense", "auto")
        ):
            # dense max pooling runs over the in-row wire (per-slot
            # one-hot einsums since round 3 — no out-row mirror needed); a
            # batch the loader can only ship as edge_slot triples must
            # ride the flat wire instead of crashing the dense path
            # mid-epoch.  Applies to SAG+max too (dense since round 4;
            # the old `not sag_pool` exclusion here predated that and
            # left explicitly-pinned dense/auto SAG+max configs
            # unprotected — round-5 review finding; the defaulted-layout
            # branch below always covered it)
            ds_cfg.setdefault("require_inrow", True)
        if (
            mdl_gate.get("fused_inrow", False)
            and ds_cfg.get("graph_layout") != "flat"
        ):
            # the opt-in fused kernel's backward needs the out-row wire —
            # applies whether the layout is defaulted below or pinned in
            # the config (the same explicit-layout bypass class as the
            # dense_w_is_existence gate above)
            ds_cfg.setdefault("emit_out_rows", True)
        if "graph_layout" not in ds_cfg:
            # default to the dense batched-adjacency layout whenever the
            # model can consume it (GraphConv add/mean and GAT, incl. SAG)
            # — message passing/attention become batched MXU matmuls with
            # per-batch fallback to the flat edge-list layout for oversized
            # events ("auto")
            mdl = config.get("model", {})
            if mdl.get("use_gat", False):
                # dense GAT masks on w != 0, so a weighted GAT (flat GAT
                # ignores weights; torch_geometric asserts on them) could
                # drop an edge whose gaussian weight underflowed to an
                # exact zero.  The LOADER now checks for that once at init
                # (dense_w_is_existence) and demotes itself to flat only
                # when a zero actually exists — real lineage data
                # (strictly positive weights) keeps the dense layout and
                # the slot-softmax kernel instead of paying the ~40x flat
                # segment-softmax penalty on every GAT+use_weights sweep
                # arm
                eligible = True
                # (dense_w_is_existence for weighted GAT is already set
                # by the explicit-layout gate above — its
                # `graph_layout != "flat"` check also passes when the
                # key is absent, so one gate covers both cases)
            else:
                # max rides dense BY DEFAULT since round 3: the first-cut
                # inrow_max_aggregate used a take_along_axis gather and
                # measured 0.6x the flat segment_max (10.2k vs 16.8k
                # graphs/sec) — demoted; the one-hot-einsum rewrite
                # measured **129,716 vs 24,445 flat (5.3x)** same-window
                # 2026-08-20 (add-dense anchor 290.8k reproduced the
                # headline, so the window is comparable)
                eligible = mdl.get("local_pooling", "add") in (
                    "add", "mean", "max",
                )
                if mdl.get("local_pooling", "add") == "max":
                    # SAG+max rides dense since round 4 (conv2's in-row
                    # weights are keep-masked via the broadcast-compare
                    # keep[src] trick — the same composition as GAT+SAG);
                    # edge_slot-triple-only batches fall back to flat
                    # instead of crashing the in-row max mid-epoch
                    ds_cfg.setdefault("require_inrow", True)
            eligible = eligible and not mdl.get("knn_k", 0)
            ds_cfg["graph_layout"] = "auto" if eligible else "flat"
        return Step2PointGraph(**ds_cfg)
    raise ValueError(f"Unknown dataset: {dataset_name}")


def get_model(model_name: str, config: dict, model_dir: str = None):
    """Model-name dispatch + optional checkpoint restore (`train.py:30-85`)."""
    if model_name == "logistic_regression":
        model = LogRegression()
        if model_dir is not None:
            model_path = os.path.join(model_dir, "model.pkl")
            if not os.path.exists(model_path):
                raise FileNotFoundError(
                    f"LogisticRegression model not found at {model_path}"
                )
            model.load(model_path)
            print(f"Loaded LogisticRegression model from {model_path}")
        return model

    if model_name == "fully_connected_net":
        net = FullyConnectedNet(**config["model"])
    elif model_name == "deep_sets":
        net = DeepSets(**config["model"])
    elif model_name == "graph_net":
        net = GraphNet(**config["model"])
    else:
        raise ValueError(f"Unknown model: {model_name}")

    model = ModelWrapper(net, **config["trainer"], **config["logging"])
    if model_dir is not None:
        model_path = os.path.join(model_dir, "best_model.pt")
        if not os.path.exists(model_path):
            raise FileNotFoundError(f"{model_name} model not found at {model_path}")
        model.load(model_path)
        print(f"Loaded {model_name} model from {model_path}")
    return model


# Measured int8-vs-bf16 eval-device crossover (2026-08-20, same-window
# `bench --eval-device --phi-width W [--quant int8]`, clouds/sec):
#   W=256:  959,774 int8 vs 1,407,664 bf16  (0.68x — int8 loses)
#   W=512:  577,399 int8 vs   657,156 bf16  (0.88x — int8 loses)
#   W=1024: 242,354 int8 vs   215,674 bf16  (1.12x — int8 WINS)
# Below the crossover the per-row dynamic quantize/dequantize passes cost
# more than the halved matmul time; at W>=1024 the 2x-peak s8 MXU and the
# halved activation traffic win.  ``quant="auto"`` gates on this.
_INT8_AUTO_MIN_WIDTH = 1024


def resolve_quant(config: dict, model_name: str, quant: str) -> str:
    """Resolve a ``--quant`` request to the path that will actually run.

    ``"auto"`` → ``"int8"`` iff the model is deep_sets AND its widest φ
    layer is ≥ ``_INT8_AUTO_MIN_WIDTH`` (the measured win regime — table
    above), else ``"none"``; auto never escalates an unsupported model
    to an error.  Explicit values pass through for validation.
    """
    if quant in (None, "none"):
        return "none"
    if quant == "auto":
        if model_name != "deep_sets":
            return "none"
        model_cfg = config.get("model", {})
        if model_cfg.get("layer_norm"):
            # DeepSets._phi_mode falls back to float under layer_norm, so
            # "int8" here would only mislabel artifacts that ran float
            return "none"
        widths = model_cfg.get("phi_layers") or []
        if not widths or max(widths) < _INT8_AUTO_MIN_WIDTH:
            return "none"
        return "int8"
    return quant


def apply_quant(config: dict, model_name: str, quant: str) -> None:
    """Route eval/serving to the int8 MXU path (``ops/quant.py``).

    f32 checkpoints load unchanged — weights are quantized inside the jit'd
    eval step.  DeepSets-only (the one model whose forward is dominated by
    the per-point matmul chain); layer_norm configs fall back to float
    inside the model (``DeepSets._phi_mode``).

    ``quant="auto"`` resolves by the measured crossover: int8 iff the
    widest φ layer is ≥ ``_INT8_AUTO_MIN_WIDTH`` (see the table above),
    else float — so the flag is safe to pass unconditionally.
    """
    quant = resolve_quant(config, model_name, quant)
    if quant == "none":
        return
    if model_name != "deep_sets":
        raise ValueError(
            f"--quant {quant} is only supported for deep_sets "
            f"(got {model_name})"
        )
    config["model"]["quant"] = quant
