"""Random hyperparameter search with a persistent leaderboard.

Behavior parity with the reference sweep (`sweep.py:13-197`):

- ``run_search(model_name, dataset_name, search_dir, max_runs=2000)`` loads
  the overlayed config, forces ``trainer.epochs = 10``, and loops: sample a
  config → ``train_model(..., return_log_dir=True)`` → read back the run's
  ``meta.json`` → update + rewrite ``search_results.json`` after **every**
  run so a crashed search keeps partial results (`sweep.py:68, 136-166`)
- per-run failures are caught and appended to ``status_log.txt`` with the
  offending hyperparameters (`sweep.py:53-61`)
- per-model samplers draw from the same search spaces (`sweep.py:70-133`).
  The reference's FCN sampler writes ``model.learning_rate`` which its model
  ctor rejects, so every FCN run fails (`sweep.py:74`); ours targets
  ``trainer.learning_rate`` so FCN search actually works, and we keep the
  spaces otherwise identical.
- non-empty search dirs prompt for confirm-then-delete (`sweep.py:169-183`);
  pass ``force=True`` (CLI ``--force``) to skip the prompt

TPU-native addition: instead of torch's ``empty_cache`` between runs
(`sweep.py:64-66`), live jax arrays are dropped with the run's Python refs
and a ``gc.collect()``; compiled train/eval steps are shared across runs of
the same architecture+optimizer (the trainer keys them in a module-level
cache with the learning rate riding in the optimizer state), so repeat
configurations skip recompilation entirely.  ``--vmap`` goes further and
trains same-architecture arms as one program (``parallel/vmap_sweep.py``).
"""

from __future__ import annotations

import argparse
import gc
import json
import pickle
import os
import shutil
from copy import deepcopy

import numpy as np

from point_cloud_classifier_tpu.utils.config import load_config
from train import train_model


def fully_connected_net_config(config):
    hp_config = deepcopy(config)
    hp_config["trainer"]["learning_rate"] = 10 ** np.random.uniform(-4, -2)
    hidden_dim = int(np.random.choice([32, 64, 128, 256]))
    n_layers = int(np.random.choice([2, 3, 4]))
    hp_config["model"]["hidden_layers"] = [hidden_dim] * n_layers
    hp_config["model"]["batch_normalization"] = bool(np.random.choice([True, False]))
    hp_config["dataset"]["batch_size"] = int(np.random.choice([32, 64]))
    return hp_config


def deep_sets_config(config):
    hp_config = deepcopy(config)

    phi_dim = int(np.random.choice([128, 256, 512, 1024]))
    phi_n_layers = int(np.random.choice([1, 2, 3, 4]))
    hp_config["model"]["phi_layers"] = [phi_dim] * phi_n_layers

    rho_dim = int(np.random.choice([128, 256, 512, 1024]))
    rho_n_layers = int(np.random.choice([1, 2, 3]))
    hp_config["model"]["rho_layers"] = [rho_dim] * rho_n_layers

    hp_config["model"]["activation"] = str(np.random.choice(["gelu", "silu"]))
    hp_config["model"]["residual_block"] = bool(np.random.choice([True, False]))
    hp_config["trainer"]["learning_rate"] = 10 ** np.random.uniform(-4, -2)
    hp_config["dataset"]["batch_size"] = int(np.random.choice([16, 32, 64]))
    return hp_config


def graph_net_config(config):
    hp_config = deepcopy(config)

    hp_config["model"]["hidden_dim"] = int(np.random.choice([64, 128, 256]))
    hp_config["model"]["activation"] = str(np.random.choice(["gelu", "relu", "tanh"]))
    hp_config["model"]["use_gat"] = bool(np.random.choice([True, False]))
    hp_config["model"]["gat_heads"] = int(np.random.choice([4, 8]))
    hp_config["model"]["sag_pool"] = bool(np.random.choice([True, False]))
    hp_config["model"]["pool_ratio"] = float(np.random.choice([0.3, 0.4, 0.5]))
    hp_config["model"]["local_pooling"] = str(np.random.choice(["add", "mean", "max"]))
    hp_config["model"]["global_pooling"] = str(np.random.choice(["add", "mean", "max"]))
    hp_config["model"]["deepchem_style"] = bool(np.random.choice([True, False]))

    input_dim = int(np.random.choice([1, 4]))
    hp_config["model"]["input_dim"] = input_dim
    hp_config["dataset"]["n_features"] = input_dim

    hp_config["dataset"]["use_weights"] = bool(np.random.choice([True, False]))
    hp_config["dataset"]["batch_size"] = int(np.random.choice([16, 32, 64]))

    hp_config["trainer"]["learning_rate"] = 10 ** np.random.uniform(-4, -2)
    hp_config["trainer"]["optimizer"] = str(np.random.choice(["adam", "adamw"]))
    return hp_config


_SAMPLERS = {
    "fully_connected_net": fully_connected_net_config,
    "deep_sets": deep_sets_config,
    "graph_net": graph_net_config,
}


def update_leaderboard(top_runs, version_dir):
    """Append a finished run's val accuracy; keep sorted desc (`sweep.py:136-160`)."""
    meta_path = os.path.join(version_dir, "meta.json")
    if not os.path.exists(meta_path):
        print(f"WARNING: meta.json not found at {version_dir}")
        return

    with open(meta_path, "r") as f:
        meta = json.load(f)

    val_acc = meta.get("metrics", {}).get("accuracy/val", None)
    n_params = meta.get("metrics", {}).get("parameters", None)
    if val_acc is None:
        print(f"WARNING: No val_accuracy for {version_dir}")
        return

    version = version_dir.split("_")[-1]
    top_runs.append({"version": version, "val_acc": val_acc, "parameters": n_params})
    top_runs.sort(key=lambda x: x["val_acc"], reverse=True)


def save_leaderboard(top_runs, save_dir):
    with open(os.path.join(save_dir, "search_results.json"), "w") as f:
        json.dump(top_runs, f, indent=4)


def create_search_dir(search_dir, force: bool = False):
    """Confirm-then-clear a non-empty search dir (`sweep.py:169-183`)."""
    if os.path.exists(search_dir) and os.listdir(search_dir):
        if not force:
            reply = input(f"Directory '{search_dir}' is NOT empty. Delete it? [y/N]: ")
            if reply.lower() != "y":
                return
        print("Clearing existing search directory")
        shutil.rmtree(search_dir)
    os.makedirs(search_dir, exist_ok=True)


def run_search(
    model_name: str,
    dataset_name: str,
    search_dir: str,
    max_runs: int = 2000,
    config_dir: str = "configs",
    epochs: int = 10,
    force: bool = False,
    data_dir: str = None,
):
    """Random search loop (`sweep.py:13-68`)."""
    if model_name not in _SAMPLERS:
        raise ValueError(f"No hyperparameter sampler for model: {model_name}")

    search_dir = os.path.abspath(search_dir)
    status_log = os.path.join(search_dir, "status_log.txt")

    config = load_config(
        os.path.join(config_dir, "base.yaml"),
        os.path.join(config_dir, f"{model_name}.yaml"),
    )
    create_search_dir(search_dir=search_dir, force=force)

    config["logging"]["log_dir"] = search_dir
    config["trainer"]["epochs"] = epochs
    # sweep runs are leaderboard fodder — skip per-epoch resume checkpoints
    # (the reference sweep writes none either; best_model.pt still appears)
    config["trainer"]["state_every"] = 0
    if data_dir is not None:
        config["dataset"]["data_dir"] = data_dir

    top_runs = []
    print(f"Starting hyperparameter search ({max_runs} runs)...")

    for i in range(max_runs):
        hp_config = _SAMPLERS[model_name](config=config)
        print(hp_config)

        try:
            version_dir = train_model(
                model_name=model_name,
                dataset_name=dataset_name,
                config=hp_config,
                return_log_dir=True,
            )
            update_leaderboard(top_runs=top_runs, version_dir=version_dir)
        except Exception as e:
            print(f"[Run {i}/{max_runs}] Configuration failed: {e}")
            with open(status_log, "a") as f:
                f.write(f"Run {i} FAILED\n")
                f.write(f"Error: {e}\n")
                f.write("Hyperparameters:\n")
                f.write(f"{hp_config}\n")
                f.write("-" * 80 + "\n\n")

        _release_run_memory(i)
        save_leaderboard(top_runs=top_runs, save_dir=search_dir)

    return top_runs


def _release_run_memory(run_index: int, every: int = 8) -> None:
    """Between-runs memory hygiene — the TPU-native analogue of the
    reference's ``gc.collect()`` + ``torch.cuda.empty_cache()``
    (`sweep.py:64-66`).

    Every sampled architecture compiles fresh jit programs (train step,
    fused step, eval step, init — times every batch-shape bucket), and
    both XLA's executable cache and the module-level step caches retain
    them all; a long search accumulates until LLVM itself cannot allocate
    (observed: a 100-run graph_net soak died at run ~59 with "LLVM
    compilation error: Cannot allocate memory" then SIGSEGV).  Dropping
    the caches every few runs bounds the footprint; same-architecture
    re-runs inside the window still share programs.
    """
    gc.collect()
    if (run_index + 1) % every:
        return
    import jax

    from point_cloud_classifier_tpu.models import wrapper as _wrapper

    from point_cloud_classifier_tpu.parallel import vmap_sweep as _vs

    _wrapper._STEP_CACHE.clear()
    _wrapper._INIT_CACHE.clear()
    _vs._FN_CACHE.clear()
    jax.clear_caches()
    gc.collect()


def run_search_vmapped(
    model_name: str,
    dataset_name: str,
    search_dir: str,
    max_runs: int = 32,
    config_dir: str = "configs",
    epochs: int = 10,
    force: bool = False,
    data_dir: str = None,
    use_mesh: bool = False,
):
    """TPU-native sweep: same-architecture configs train as ONE vmapped step.

    Sampled configs are grouped by everything except ``trainer.learning_rate``
    (widths/flags/batch define the XLA program shape); each group's arms are
    stacked on a leading axis and trained simultaneously
    (``parallel/vmap_sweep.py``).  Artifacts stay contract-identical to the
    sequential sweep: one ``version_N`` dir per sampled config with resolved
    ``config.yaml`` + ``meta.json`` metrics, plus the same
    ``search_results.json`` leaderboard.
    """
    from point_cloud_classifier_tpu.models import DeepSets, FullyConnectedNet, GraphNet
    from point_cloud_classifier_tpu.parallel.vmap_sweep import train_configs_vmapped
    from point_cloud_classifier_tpu.utils.config import save_config
    from point_cloud_classifier_tpu.utils.log import TrainingLogger
    from train import get_dataloader

    model_classes = {
        "fully_connected_net": FullyConnectedNet,
        "deep_sets": DeepSets,
        "graph_net": GraphNet,
    }
    model_name = model_name.lower()
    dataset_name = dataset_name.lower()
    if model_name not in _SAMPLERS:
        raise ValueError(f"No hyperparameter sampler for model: {model_name}")

    search_dir = os.path.abspath(search_dir)
    config = load_config(
        os.path.join(config_dir, "base.yaml"),
        os.path.join(config_dir, f"{model_name}.yaml"),
    )
    create_search_dir(search_dir=search_dir, force=force)
    config["logging"]["log_dir"] = search_dir
    config["trainer"]["epochs"] = epochs
    if data_dir is not None:
        config["dataset"]["data_dir"] = data_dir

    # sample everything up front, then group by program shape
    sampled = [_SAMPLERS[model_name](config=config) for _ in range(max_runs)]
    groups = {}
    for hp in sampled:
        key = json.dumps(
            {
                "model": hp["model"],
                "dataset": hp["dataset"],
                "optimizer": hp["trainer"].get("optimizer", "adam"),
            },
            sort_keys=True,
        )
        groups.setdefault(key, []).append(hp)

    status_log = os.path.join(search_dir, "status_log.txt")
    top_runs = []
    print(
        f"Starting vmapped search: {max_runs} configs in {len(groups)} "
        f"architecture groups..."
    )
    for g_i, (key, group) in enumerate(groups.items()):
        hp0 = group[0]
        try:
            # pass the model section too: graph_layout eligibility
            # (train.py:get_dataloader) must see local_pooling/use_gat, else
            # a max-aggregation group would get dense batches it can't run
            dataloader = get_dataloader(
                dataset_name,
                {"dataset": dict(hp0["dataset"]), "model": dict(hp0["model"])},
            )
            train_loader = dataloader.get_train_loader()
            val_loader = dataloader.get_val_loader()
            model = model_classes[model_name](**hp0["model"])
            lrs = [hp["trainer"]["learning_rate"] for hp in group]

            mesh = None
            if use_mesh:
                from point_cloud_classifier_tpu.parallel import default_mesh

                mesh = default_mesh()
            result = train_configs_vmapped(
                model,
                lrs,
                hp0["trainer"].get("optimizer", "adam"),
                epochs,
                train_loader,
                val_loader,
                mesh=mesh,
            )
            val_accs, train_accs = result["val_accs"], result["train_accs"]
            n_params = result["n_params"]
        except Exception as e:
            # same failure-capture contract as the sequential sweep
            # (`sweep.py:53-61` in the reference): log and keep searching
            print(f"[Group {g_i}/{len(groups)}] Configuration group failed: {e}")
            with open(status_log, "a") as f:
                f.write(f"Group {g_i} ({len(group)} configs) FAILED\n")
                f.write(f"Error: {e}\n")
                f.write("Hyperparameters:\n")
                f.write(f"{hp0}\n")
                f.write("-" * 80 + "\n\n")
            save_leaderboard(top_runs=top_runs, save_dir=search_dir)
            continue

        for arm, (hp, va, ta) in enumerate(zip(group, val_accs, train_accs)):
            try:
                logger = TrainingLogger(model_name, dataset_name, **hp["logging"])
                version_dir = os.path.join(
                    search_dir, f"version_{logger.get_version()}"
                )
                hp["logging"]["log_dir"] = version_dir
                hp["meta"]["model_name"] = model_name
                hp["meta"]["dataset_name"] = dataset_name
                save_config(config=hp, log_dir=version_dir)
                # weights in ModelWrapper's checkpoint format so
                # `train.py evaluate/infer <version_dir>` work on sweep winners
                with open(os.path.join(version_dir, "model.pt"), "wb") as f:
                    pickle.dump(result["final_state"][arm], f)
                if result.get("best_improved", [True] * len(group))[arm]:
                    with open(
                        os.path.join(version_dir, "best_model.pt"), "wb"
                    ) as f:
                        pickle.dump(result["best_state"][arm], f)
                # else: validation never improved (e.g. NaN divergence) —
                # best_state is the random init; the sequential path writes
                # no best checkpoint there, so neither do we
                logger.log_metric("accuracy/train", round(ta, 6))
                logger.log_metric("accuracy/val", round(va, 6))
                logger.log_metric("parameters", n_params)
                update_leaderboard(top_runs=top_runs, version_dir=version_dir)
            except Exception as e:
                # per-ARM isolation: one arm's artifact-write failure must
                # not abort the remaining arms/groups — same
                # log-and-keep-searching contract as the group try above
                # and the sequential loop
                print(f"[Group {g_i} arm {arm}] artifact write failed: {e}")
                with open(status_log, "a") as f:
                    f.write(f"Group {g_i} arm {arm} ARTIFACTS FAILED\n")
                    f.write(f"Error: {e}\n")
                    f.write(f"{hp}\n")
                    f.write("-" * 80 + "\n\n")
        # vmapped programs are arm-count × larger than single runs, so clear
        # compiled-executable caches more aggressively than the sequential loop
        _release_run_memory(g_i, every=4)
        save_leaderboard(top_runs=top_runs, save_dir=search_dir)

    return top_runs


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Random hyperparameter search")
    parser.add_argument("model", choices=sorted(_SAMPLERS))
    parser.add_argument("--dataset", default=None)
    parser.add_argument("--search-dir", default="search_runs")
    parser.add_argument("--max-runs", type=int, default=2000)
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--data-dir", default=None, help="override dataset.data_dir")
    parser.add_argument("--force", action="store_true", help="clear search dir without prompting")
    parser.add_argument(
        "--vmap",
        action="store_true",
        help="train same-architecture configs simultaneously as one vmapped step",
    )
    parser.add_argument(
        "--mesh",
        action="store_true",
        help="with --vmap: shard the arm axis over all visible devices",
    )
    parser.add_argument(
        "--seed", type=int, default=None,
        help="seed the hyperparameter sampler (reproducible searches)",
    )
    args = parser.parse_args(argv)
    # warm-start policy: sweeps are compile-bound until the persistent jit
    # cache warms (round-4 campaign: 6.6 → ~2 min/run), so CLI sweeps
    # enable the rev-keyed cache by default (PCC_COMPILE_CACHE=0 opts out
    # — utils/jit_cache.py)
    from point_cloud_classifier_tpu.utils.jit_cache import enable_default_cache

    enable_default_cache()
    if args.seed is not None:
        np.random.seed(args.seed)

    from train import MODEL_DATASETS

    dataset = args.dataset or MODEL_DATASETS[args.model]
    kwargs = dict(
        model_name=args.model,
        dataset_name=dataset,
        search_dir=args.search_dir,
        max_runs=args.max_runs,
        config_dir=args.config_dir,
        epochs=args.epochs,
        force=args.force,
        data_dir=args.data_dir,
    )
    if args.vmap:
        run_search_vmapped(use_mesh=args.mesh, **kwargs)
    else:
        run_search(**kwargs)


if __name__ == "__main__":
    main()
