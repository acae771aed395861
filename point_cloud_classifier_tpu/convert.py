"""Reference (torch) checkpoint → this framework's checkpoint format.

The reference persists ``torch.save(model.state_dict(), path)``
(`models/wrapper.py:131,174`); our checkpoints are a pickle of
``{"params", "batch_stats"}`` pytrees under the same filenames
(``best_model.pt`` / ``model.pt``).  The parameter trees correspond 1:1
(``models/common.py`` reproduces torch layer semantics), so a trained
reference model converts exactly:

- ``torch.nn.Linear`` weight ``[out, in]`` → ``TorchLinear`` kernel
  ``[in, out]`` (transpose); bias unchanged
- ``torch.nn.BatchNorm1d`` weight/bias → ``MaskedBatchNorm`` scale/bias;
  running_mean/running_var → the ``batch_stats`` tree
  (``num_batches_tracked`` has no counterpart — our BN uses the fixed
  0.1 momentum the reference configures, so the counter is dead state)
- ``torch.nn.LayerNorm`` weight/bias → ``TorchLayerNorm`` scale/bias
- torch_geometric ``GraphConv.lin_rel``/``lin_root`` → our
  ``GraphConv.TorchLinear_0`` (aggregate path, biased) /
  ``TorchLinear_1`` (root path, bias-free)

Layer *ordering* is generated from the run's config exactly the way both
constructors generate it (reference `models/deep_sets.py:43-73`,
`models/fully_connected_net.py:18-25`), then every state_dict key must be
consumed — unknown or leftover keys are a hard error, so silently wrong
mappings cannot slip through.  Forward-output equivalence torch-vs-ours is
pinned by tests/test_convert.py.

CLI: ``python train.py convert <model> <torch_ckpt> <out.pt>``
(``--config-dir``/config overrides resolve dims the same way training
does).  GAT / SAGPooling checkpoints are rejected explicitly: their
torch_geometric key layout varies across tg versions and none ships in
this environment to pin against.
"""

from __future__ import annotations

import pickle
from typing import Dict, Tuple

import numpy as np

Tree = Dict[str, object]


def _np(v) -> np.ndarray:
    """torch tensor / array-like → float32 numpy (params are f32 here)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


class _Taker:
    """Ordered key consumer over a state_dict with leftover detection."""

    def __init__(self, state: Dict[str, object]):
        self._state = dict(state)

    def take(self, key: str) -> np.ndarray:
        if key not in self._state:
            raise KeyError(
                f"reference checkpoint is missing '{key}' — wrong model/config "
                f"for this checkpoint? (remaining keys: {sorted(self._state)[:8]}…)"
            )
        return _np(self._state.pop(key))

    def finish(self) -> None:
        leftovers = [
            k for k in self._state if not k.endswith("num_batches_tracked")
        ]
        if leftovers:
            raise ValueError(
                "unconverted keys in the torch checkpoint (naming mismatch or "
                f"unsupported variant): {sorted(leftovers)}"
            )


def _linear(t: _Taker, prefix: str, bias: bool = True) -> Tree:
    out = {"kernel": t.take(f"{prefix}.weight").T.copy()}
    if bias:
        out["bias"] = t.take(f"{prefix}.bias")
    return out


def _batchnorm(t: _Taker, prefix: str) -> Tuple[Tree, Tree]:
    params = {"scale": t.take(f"{prefix}.weight"), "bias": t.take(f"{prefix}.bias")}
    stats = {
        "mean": t.take(f"{prefix}.running_mean"),
        "var": t.take(f"{prefix}.running_var"),
    }
    return params, stats


def _layernorm(t: _Taker, prefix: str) -> Tree:
    return {"scale": t.take(f"{prefix}.weight"), "bias": t.take(f"{prefix}.bias")}


def _convert_fcn(cfg: dict, t: _Taker) -> Tuple[Tree, Tree]:
    """Reference `models/fully_connected_net.py:18-25`: [Linear, BN?, ReLU]*
    then the output Linear, all inside one ``network`` Sequential."""
    hidden = list(cfg["hidden_layers"])
    bn = bool(cfg["batch_normalization"])
    params: Tree = {}
    stats: Tree = {}
    idx = 0
    for i in range(len(hidden)):
        params[f"TorchLinear_{i}"] = _linear(t, f"network.{idx}")
        idx += 1
        if bn:
            p, s = _batchnorm(t, f"network.{idx}")
            params[f"MaskedBatchNorm_{i}"] = p
            stats[f"MaskedBatchNorm_{i}"] = s
            idx += 1
        idx += 1  # ReLU (parameterless)
    params[f"TorchLinear_{len(hidden)}"] = _linear(t, f"network.{idx}")
    return params, stats


def _convert_deep_sets(cfg: dict, t: _Taker) -> Tuple[Tree, Tree]:
    """Reference `models/deep_sets.py:43-73`: φ = [ResidualBlock | Linear
    (+LN) + act]* + extra Linear; ρ = [Linear (+LN) + act]* + head."""
    ln = bool(cfg.get("layer_norm", True))
    residual = bool(cfg.get("residual_block", False))
    params: Tree = {}

    last = cfg["input_dim"]
    idx = 0
    for i, h in enumerate(cfg["phi_layers"]):
        if residual and last == h:
            base = f"phi.{idx}"
            lin = _linear(t, f"{base}.linear")
            params[f"phi_{i}_kernel"] = lin["kernel"]
            params[f"phi_{i}_bias"] = lin["bias"]
            if ln:
                lnp = _layernorm(t, f"{base}.layer_norm")
                params[f"phi_{i}_ln_scale"] = lnp["scale"]
                params[f"phi_{i}_ln_bias"] = lnp["bias"]
            idx += 1
        else:
            lin = _linear(t, f"phi.{idx}")
            params[f"phi_{i}_kernel"] = lin["kernel"]
            params[f"phi_{i}_bias"] = lin["bias"]
            idx += 1
            if ln:
                lnp = _layernorm(t, f"phi.{idx}")
                params[f"phi_{i}_ln_scale"] = lnp["scale"]
                params[f"phi_{i}_ln_bias"] = lnp["bias"]
                idx += 1
            idx += 1  # activation
        last = h
    fin = _linear(t, f"phi.{idx}")
    params["phi_final_kernel"] = fin["kernel"]
    params["phi_final_bias"] = fin["bias"]

    mlp: Tree = {}
    idx = 0
    for j in range(len(cfg["rho_layers"])):
        mlp[f"TorchLinear_{j}"] = _linear(t, f"rho.{idx}")
        idx += 1
        if ln:
            mlp[f"TorchLayerNorm_{j}"] = _layernorm(t, f"rho.{idx}")
            idx += 1
        idx += 1  # activation
    params["_MLPStack_0"] = mlp
    params["TorchLinear_0"] = _linear(t, f"rho.{idx}")  # classifier head
    return params, {}


def _convert_graph_net(cfg: dict, t: _Taker) -> Tuple[Tree, Tree]:
    """Reference `models/graph_net.py:46-63`: two GraphConvs (+BN each),
    fc1+bn3, fc2.  torch_geometric GraphConv = lin_rel (aggregate, biased)
    + lin_root (skip, bias-free) — our TorchLinear_0 / TorchLinear_1."""
    if cfg.get("use_gat") or cfg.get("sag_pool"):
        raise NotImplementedError(
            "GAT / SAGPooling checkpoint conversion is not supported: "
            "torch_geometric's GATConv/SAGPooling state_dict layout varies "
            "across tg versions (and tg is absent here to pin against). "
            "Retrain instead — minutes at TPU throughput."
        )
    params: Tree = {}
    stats: Tree = {}
    for k in (1, 2):
        params[f"GraphConv_{k - 1}"] = {
            "TorchLinear_0": _linear(t, f"conv{k}.lin_rel"),
            "TorchLinear_1": _linear(t, f"conv{k}.lin_root", bias=False),
        }
        p, s = _batchnorm(t, f"bn{k}")
        params[f"MaskedBatchNorm_{k - 1}"] = p
        stats[f"MaskedBatchNorm_{k - 1}"] = s
    params["TorchLinear_0"] = _linear(t, "fc1")
    p, s = _batchnorm(t, "bn3")
    params["MaskedBatchNorm_2"] = p
    stats["MaskedBatchNorm_2"] = s
    params["TorchLinear_1"] = _linear(t, "fc2")
    return params, stats


_CONVERTERS = {
    "fully_connected_net": _convert_fcn,
    "deep_sets": _convert_deep_sets,
    "graph_net": _convert_graph_net,
}


def convert_torch_state_dict(
    model_name: str, config: dict, state: Dict[str, object]
) -> Tuple[Tree, Tree]:
    """(params, batch_stats) pytrees from a reference ``state_dict``."""
    if model_name not in _CONVERTERS:
        raise ValueError(
            f"no converter for '{model_name}' "
            f"(supported: {sorted(_CONVERTERS)}; logistic_regression "
            "checkpoints are sklearn pickles — retrain, it is seconds of CPU)"
        )
    t = _Taker(state)
    params, stats = _CONVERTERS[model_name](config["model"], t)
    t.finish()
    return params, stats


def convert_checkpoint(
    model_name: str, config: dict, torch_ckpt_path: str, out_path: str
) -> None:
    """Read a reference ``torch.save(state_dict)`` file, write our pickle."""
    import torch

    state = torch.load(torch_ckpt_path, map_location="cpu", weights_only=True)
    params, stats = convert_torch_state_dict(model_name, config, state)
    with open(out_path, "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)
