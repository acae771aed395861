"""Reference (torch) checkpoint ↔ this framework's checkpoint format.

The reference persists ``torch.save(model.state_dict(), path)``
(`models/wrapper.py:131,174`); our checkpoints are a pickle of
``{"params", "batch_stats"}`` pytrees under the same filenames
(``best_model.pt`` / ``model.pt``).  The parameter trees correspond 1:1
(``models/common.py`` reproduces torch layer semantics), so checkpoints
convert exactly, in BOTH directions:

- ``torch.nn.Linear`` weight ``[out, in]`` ↔ ``TorchLinear`` kernel
  ``[in, out]`` (transpose); bias unchanged
- ``torch.nn.BatchNorm1d`` weight/bias ↔ ``MaskedBatchNorm`` scale/bias;
  running_mean/running_var ↔ the ``batch_stats`` tree
  (``num_batches_tracked`` has no counterpart — our BN uses the fixed
  0.1 momentum the reference configures, so the counter is dead state;
  the reverse direction emits it as 0)
- ``torch.nn.LayerNorm`` weight/bias ↔ ``TorchLayerNorm`` scale/bias
- torch_geometric ``GraphConv.lin_rel``/``lin_root`` ↔ our
  ``GraphConv.TorchLinear_0`` (aggregate path, biased) /
  ``TorchLinear_1`` (root path, bias-free)

The key correspondence is ONE declarative mapping per model, generated
from the run's config exactly the way both constructors order their
layers (reference `models/deep_sets.py:43-73`,
`models/fully_connected_net.py:18-25`, `models/graph_net.py:46-63`); both
directions walk it, and the torch→ours direction must consume every
state_dict key — unknown or leftover keys are a hard error, so silently
wrong mappings cannot slip through.  Forward-output equivalence
torch-vs-ours is pinned by tests/test_convert.py.

CLI: ``python train.py convert <model> <in> <out> [--to-torch]``
(``--config``/`--config-dir`` resolve dims the same way training does).
GAT / SAGPooling checkpoints are rejected explicitly: their
torch_geometric key layout varies across tg versions and none ships in
this environment to pin against.  The reference's logistic-regression
``model.pkl`` (a pickled sklearn estimator) needs no conversion — our
``LogRegression.load`` reads it natively.
"""

from __future__ import annotations

import pickle
from typing import Dict, Iterator, List, Tuple

import numpy as np

Tree = Dict[str, object]
# (torch_key, tree ∈ {"params", "stats"}, path-in-tree, transpose)
Entry = Tuple[str, str, Tuple[str, ...], bool]


def _np(v) -> np.ndarray:
    """torch tensor / array-like → float32 numpy (params are f32 here)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


# -- declarative mappings -----------------------------------------------------


def _lin(prefix: str, path: Tuple[str, ...], bias: bool = True) -> Iterator[Entry]:
    yield f"{prefix}.weight", "params", path + ("kernel",), True
    if bias:
        yield f"{prefix}.bias", "params", path + ("bias",), False


def _bn(prefix: str, name: str) -> Iterator[Entry]:
    yield f"{prefix}.weight", "params", (name, "scale"), False
    yield f"{prefix}.bias", "params", (name, "bias"), False
    yield f"{prefix}.running_mean", "stats", (name, "mean"), False
    yield f"{prefix}.running_var", "stats", (name, "var"), False


def _ln(prefix: str, scale_path: Tuple[str, ...], bias_path: Tuple[str, ...]) -> Iterator[Entry]:
    yield f"{prefix}.weight", "params", scale_path, False
    yield f"{prefix}.bias", "params", bias_path, False


def _fcn_mapping(cfg: dict) -> Iterator[Entry]:
    """Reference `models/fully_connected_net.py:18-25`: [Linear, BN?, ReLU]*
    then the output Linear, all inside one ``network`` Sequential."""
    hidden = list(cfg["hidden_layers"])
    bn = bool(cfg["batch_normalization"])
    idx = 0
    for i in range(len(hidden)):
        yield from _lin(f"network.{idx}", (f"TorchLinear_{i}",))
        idx += 1
        if bn:
            yield from _bn(f"network.{idx}", f"MaskedBatchNorm_{i}")
            idx += 1
        idx += 1  # ReLU (parameterless)
    yield from _lin(f"network.{idx}", (f"TorchLinear_{len(hidden)}",))


def _deep_sets_mapping(cfg: dict) -> Iterator[Entry]:
    """Reference `models/deep_sets.py:43-73`: φ = [ResidualBlock | Linear
    (+LN) + act]* + extra Linear; ρ = [Linear (+LN) + act]* + head."""
    ln = bool(cfg.get("layer_norm", True))
    residual = bool(cfg.get("residual_block", False))

    last = cfg["input_dim"]
    idx = 0
    for i, h in enumerate(cfg["phi_layers"]):
        if residual and last == h:
            base = f"phi.{idx}"
            yield f"{base}.linear.weight", "params", (f"phi_{i}_kernel",), True
            yield f"{base}.linear.bias", "params", (f"phi_{i}_bias",), False
            if ln:
                yield from _ln(
                    f"{base}.layer_norm", (f"phi_{i}_ln_scale",), (f"phi_{i}_ln_bias",)
                )
            idx += 1
        else:
            yield f"phi.{idx}.weight", "params", (f"phi_{i}_kernel",), True
            yield f"phi.{idx}.bias", "params", (f"phi_{i}_bias",), False
            idx += 1
            if ln:
                yield from _ln(
                    f"phi.{idx}", (f"phi_{i}_ln_scale",), (f"phi_{i}_ln_bias",)
                )
                idx += 1
            idx += 1  # activation
        last = h
    yield f"phi.{idx}.weight", "params", ("phi_final_kernel",), True
    yield f"phi.{idx}.bias", "params", ("phi_final_bias",), False

    idx = 0
    for j in range(len(cfg["rho_layers"])):
        yield from _lin(f"rho.{idx}", ("_MLPStack_0", f"TorchLinear_{j}"))
        idx += 1
        if ln:
            yield from _ln(
                f"rho.{idx}",
                ("_MLPStack_0", f"TorchLayerNorm_{j}", "scale"),
                ("_MLPStack_0", f"TorchLayerNorm_{j}", "bias"),
            )
            idx += 1
        idx += 1  # activation
    yield from _lin(f"rho.{idx}", ("TorchLinear_0",))  # classifier head


def _graph_net_mapping(cfg: dict) -> Iterator[Entry]:
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
    for k in (1, 2):
        yield from _lin(f"conv{k}.lin_rel", (f"GraphConv_{k - 1}", "TorchLinear_0"))
        yield from _lin(
            f"conv{k}.lin_root", (f"GraphConv_{k - 1}", "TorchLinear_1"), bias=False
        )
        yield from _bn(f"bn{k}", f"MaskedBatchNorm_{k - 1}")
    yield from _lin("fc1", ("TorchLinear_0",))
    yield from _bn("bn3", "MaskedBatchNorm_2")
    yield from _lin("fc2", ("TorchLinear_1",))


_MAPPINGS = {
    "fully_connected_net": _fcn_mapping,
    "deep_sets": _deep_sets_mapping,
    "graph_net": _graph_net_mapping,
}


def _mapping(model_name: str, config: dict) -> List[Entry]:
    if model_name not in _MAPPINGS:
        raise ValueError(
            f"no converter for '{model_name}' "
            f"(supported: {sorted(_MAPPINGS)}; logistic_regression "
            "checkpoints are sklearn pickles — our LogRegression.load "
            "reads them natively)"
        )
    return list(_MAPPINGS[model_name](config["model"]))


# -- tree plumbing -------------------------------------------------------------


def _set(tree: Tree, path: Tuple[str, ...], value: np.ndarray) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _get(tree: Tree, path: Tuple[str, ...]) -> np.ndarray:
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            raise KeyError(
                f"checkpoint tree is missing {'/'.join(path)} — wrong "
                "model/config for this checkpoint?"
            )
        tree = tree[k]
    return tree


# -- torch → ours ---------------------------------------------------------------


def convert_torch_state_dict(
    model_name: str, config: dict, state: Dict[str, object]
) -> Tuple[Tree, Tree]:
    """(params, batch_stats) pytrees from a reference ``state_dict``."""
    entries = _mapping(model_name, config)
    remaining = dict(state)
    trees = {"params": {}, "stats": {}}
    for key, tree_name, path, transpose in entries:
        if key not in remaining:
            raise KeyError(
                f"reference checkpoint is missing '{key}' — wrong model/config "
                f"for this checkpoint? (remaining keys: {sorted(remaining)[:8]}…)"
            )
        v = _np(remaining.pop(key))
        _set(trees[tree_name], path, v.T.copy() if transpose else v)
    leftovers = [k for k in remaining if not k.endswith("num_batches_tracked")]
    if leftovers:
        raise ValueError(
            "unconverted keys in the torch checkpoint (naming mismatch or "
            f"unsupported variant): {sorted(leftovers)}"
        )
    return trees["params"], trees["stats"]


# -- ours → torch ---------------------------------------------------------------


def to_torch_state_dict(
    model_name: str, config: dict, params: Tree, batch_stats: Tree
) -> Dict[str, np.ndarray]:
    """A reference-loadable ``state_dict`` (numpy values) from our trees.

    Emits ``num_batches_tracked = 0`` for every BatchNorm so torch's
    strict ``load_state_dict`` accepts it.
    """
    trees = {"params": params, "stats": batch_stats or {}}
    out: Dict[str, np.ndarray] = {}
    for key, tree_name, path, transpose in _mapping(model_name, config):
        v = np.asarray(_get(trees[tree_name], path), dtype=np.float32)
        out[key] = np.ascontiguousarray(v.T) if transpose else v
        if key.endswith(".running_var"):
            out[key[: -len("running_var")] + "num_batches_tracked"] = np.asarray(
                0, dtype=np.int64
            )
    return out


# -- file-level entry points ----------------------------------------------------


def convert_checkpoint(
    model_name: str, config: dict, torch_ckpt_path: str, out_path: str
) -> None:
    """Read a reference ``torch.save(state_dict)`` file, write our pickle."""
    import torch

    state = torch.load(torch_ckpt_path, map_location="cpu", weights_only=True)
    params, stats = convert_torch_state_dict(model_name, config, state)
    with open(out_path, "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)


def export_torch_checkpoint(
    model_name: str, config: dict, ckpt_path: str, out_path: str
) -> None:
    """Read one of our checkpoints, write a reference-loadable torch file."""
    import torch

    with open(ckpt_path, "rb") as f:
        state = pickle.load(f)
    sd = to_torch_state_dict(
        model_name, config, state["params"], state.get("batch_stats") or {}
    )
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, out_path)
