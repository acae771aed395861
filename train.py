"""Training / evaluation orchestration and CLI.

Behavior parity with the reference entry point (`train.py:17-195`):

- ``get_dataloader(dataset_name, config)`` string-dispatches to the three
  dataset modules (`train.py:17-27`)
- ``get_model(model_name, config, model_dir)`` builds the model (wrapping the
  Flax nets in :class:`ModelWrapper`) and optionally restores a checkpoint
  from a run dir (`train.py:30-85`; LogRegression loads ``model.pkl``, the
  nets load ``best_model.pt``)
- ``train_model(...)`` reproduces the run lifecycle exactly
  (`train.py:143-186`): versioned run dir, config mutation
  (``logging.log_dir`` → version dir, ``meta.*`` filled in), resolved
  ``config.yaml`` saved, fit, final save, train/val accuracy + parameter
  count logged to ``meta.json``, optional plots
- ``evaluate_model(model_dir, save_dir)`` reloads a run and writes
  ``metrics.json``, ``classification_report.txt`` and the three evaluation
  plots (`train.py:88-139`)

TPU-native addition: a real CLI (the reference hardcodes choices in
``__main__``, `train.py:188-195`) — ``python train.py <model> [--dataset ...]
[--config-dir ...] [--plots] [--create-dataset]`` plus an ``evaluate``
subcommand — without changing the module-level API.
"""

from __future__ import annotations

import argparse
import json
import os

from sklearn.metrics import accuracy_score, classification_report

from point_cloud_classifier_tpu.utils.config import load_config, save_config
from point_cloud_classifier_tpu.utils.log import TrainingLogger
from point_cloud_classifier_tpu.utils.plots import (
    plot_confusion_matrix,
    plot_precision_recall_curve,
    plot_roc_curve,
)

# Factories live in the package so serving modules can import them without
# the repo root on sys.path (point_cloud_classifier_tpu/factory.py); this
# module re-exports them to keep its reference-shaped API.
from point_cloud_classifier_tpu.factory import (  # noqa: E402
    MODEL_DATASETS,
    get_dataloader,
    get_model,
)
from point_cloud_classifier_tpu.factory import apply_quant as _apply_quant  # noqa: E402


def train_model(
    model_name: str,
    dataset_name: str,
    config: dict,
    plots: bool = False,
    return_log_dir: bool = False,
):
    """Full training run lifecycle (reference `train.py:143-186`)."""
    dataset_name = dataset_name.lower()
    model_name = model_name.lower()

    logger = TrainingLogger(model_name, dataset_name, **config["logging"])
    version = logger.get_version()
    log_dir = os.path.join(config["logging"]["log_dir"], f"version_{version}")
    config["logging"]["log_dir"] = log_dir
    config["meta"]["model_name"] = model_name
    config["meta"]["dataset_name"] = dataset_name

    dataloader = get_dataloader(dataset_name=dataset_name, config=config)
    model = get_model(model_name=model_name, config=config)

    train_loader = dataloader.get_train_loader()
    val_loader = dataloader.get_val_loader()

    save_config(config=config, log_dir=log_dir)
    model.fit(train_loader, val_loader)
    model.save(save_dir=log_dir)

    y_true_train, y_pred_train = model.predict(train_loader)
    y_true_val, y_pred_val = model.predict(val_loader)

    acc_train = accuracy_score(y_true_train, y_pred_train)
    acc_val = accuracy_score(y_true_val, y_pred_val)
    logger.log_metric("accuracy/train", round(acc_train, 6))
    logger.log_metric("accuracy/val", round(acc_val, 6))
    logger.log_metric("parameters", model.get_trainable_parameters())

    if plots:
        y_true_val, y_prob_val = model.predict(val_loader, return_prob=True)
        plot_confusion_matrix(y_true_val, y_pred_val, log_dir)
        plot_precision_recall_curve(y_true_val, y_prob_val, log_dir)
        plot_roc_curve(y_true_val, y_prob_val, log_dir)

    if return_log_dir:
        return log_dir
    return None


def infer(model_dir: str, split: str = "test", output: str = None,
          quant: str = "none"):
    """Batch inference from a finished run dir → CSV of probabilities.

    A serving-shaped surface the reference lacks (its closest is
    ``evaluate_model``, which only writes aggregate metrics).
    """
    import numpy as np

    config = load_config(os.path.join(model_dir, "config.yaml"))
    model_name = config["meta"]["model_name"]
    dataset_name = config["meta"]["dataset_name"]
    _apply_quant(config, model_name, quant)

    dataloader = get_dataloader(dataset_name=dataset_name, config=config)
    model = get_model(model_name=model_name, config=config, model_dir=model_dir)
    loader = {
        "train": dataloader.get_train_loader,
        "val": dataloader.get_val_loader,
        "test": dataloader.get_test_loader,
    }[split]()
    if hasattr(loader, "shuffle"):
        # scoring, not SGD: the train loader defaults to shuffle=True,
        # which would permute the CSV rows so the positional `index`
        # column no longer joins back to dataset order (round-5 review
        # finding; val/test loaders are already unshuffled)
        loader.shuffle = False

    y_true, y_prob = model.predict(loader, return_prob=True)
    y_true = np.asarray(y_true).reshape(-1)
    y_prob = np.asarray(y_prob).reshape(-1)
    output = output or os.path.join(model_dir, f"predictions_{split}.csv")
    with open(output, "w") as f:
        f.write("index,y_true,probability,prediction\n")
        for i, (t, p) in enumerate(zip(y_true, y_prob)):
            f.write(f"{i},{int(t)},{p:.6f},{int(p >= 0.5)}\n")
    print(f"Wrote {len(y_true)} predictions to {output}")
    return output


def infer_raw(model_dir: str, input_path: str, output: str = None,
              quant: str = "none"):
    """Serve predictions for a RAW shower HDF5 file (no labels, no cache).

    Runs the run's preprocessing pipeline on the input with the scalers
    persisted at dataset-creation time, then scores with the run's
    checkpoint — the serving surface the reference lacks entirely.
    """
    import numpy as np

    from point_cloud_classifier_tpu.data.inference import inference_loader

    config = load_config(os.path.join(model_dir, "config.yaml"))
    model_name = config["meta"]["model_name"]
    dataset_name = config["meta"]["dataset_name"]
    _apply_quant(config, model_name, quant)

    loader, event_ids = inference_loader(dataset_name, config, input_path)
    model = get_model(model_name=model_name, config=config, model_dir=model_dir)
    _, y_prob = model.predict(loader, return_prob=True)
    y_prob = np.asarray(y_prob).reshape(-1)

    output = output or os.path.splitext(input_path)[0] + "_predictions.csv"
    with open(output, "w") as f:
        f.write("event_id,probability,prediction\n")
        for ev, p in zip(event_ids, y_prob):
            f.write(f"{int(ev)},{p:.6f},{int(p >= 0.5)}\n")
    print(f"Wrote {len(y_prob)} predictions to {output}")
    return output


def resume_training(model_dir: str):
    """Continue an interrupted run from its orbax full-state checkpoint.

    The reference cannot do this — its resume granularity is "retrain"
    (SURVEY §5).  Rebuilds loaders + model from the run dir's resolved
    ``config.yaml``, restores (params, opt_state, epoch, early-stop
    counters) and continues ``fit`` to the configured epoch count.
    """
    config = load_config(os.path.join(model_dir, "config.yaml"))
    model_name = config["meta"]["model_name"]
    dataset_name = config["meta"]["dataset_name"]
    if model_name == "logistic_regression":
        raise ValueError("logistic_regression trains in one shot; nothing to resume")

    dataloader = get_dataloader(dataset_name=dataset_name, config=config)
    model = get_model(model_name=model_name, config=config)
    model.log_dir = model_dir
    model.checkpoint_path = os.path.join(model_dir, "best_model.pt")

    train_loader = dataloader.get_train_loader()
    val_loader = dataloader.get_val_loader()
    model.fit(train_loader, val_loader, resume=True)
    model.save(save_dir=model_dir)
    return model


def evaluate_model(model_dir: str, save_dir: str = None, quant: str = "none"):
    """Reload a finished run and score all splits (reference `train.py:88-139`).

    ``save_dir=None`` resolves to ``<model_dir>/eval`` for the float path
    and ``<model_dir>/eval_int8`` for a quantized one — decided AFTER
    ``--quant auto`` resolution, so auto-that-resolves-to-float writes the
    plain ``eval/`` artifacts (and never an ``eval_auto/``)."""
    from point_cloud_classifier_tpu.factory import resolve_quant

    config_path = os.path.join(model_dir, "config.yaml")
    config = load_config(config_path)

    model_name = config["meta"]["model_name"]
    dataset_name = config["meta"]["dataset_name"]
    quant = resolve_quant(config, model_name, quant)
    _apply_quant(config, model_name, quant)
    if save_dir is None:
        sub = "eval" if quant == "none" else f"eval_{quant}"
        save_dir = os.path.join(model_dir, sub)
    os.makedirs(save_dir, exist_ok=True)

    dataloader = get_dataloader(dataset_name=dataset_name, config=config)
    model = get_model(model_name=model_name, config=config, model_dir=model_dir)

    test_loader = dataloader.get_test_loader()
    y_true_test, y_pred_test = model.predict(test_loader)
    acc_test = accuracy_score(y_true_test, y_pred_test)
    print("accuracy/test", round(acc_test, 6))

    train_loader = dataloader.get_train_loader()
    y_true_train, y_pred_train = model.predict(train_loader)
    acc_train = accuracy_score(y_true_train, y_pred_train)
    print("accuracy/train", round(acc_train, 6))

    val_loader = dataloader.get_val_loader()
    y_true_val, y_pred_val = model.predict(val_loader)
    acc_val = accuracy_score(y_true_val, y_pred_val)
    print("accuracy/val", round(acc_val, 6))

    metrics = {
        "accuracy_train": float(acc_train),
        "accuracy_val": float(acc_val),
        "accuracy_test": float(acc_test),
    }
    if quant != "none":
        # mark which eval path produced these numbers; the float layout
        # stays byte-compatible with the reference's metrics.json
        metrics["quant"] = quant
    with open(os.path.join(save_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=4)

    report = classification_report(y_true_test, y_pred_test)
    with open(os.path.join(save_dir, "classification_report.txt"), "w") as f:
        f.write(report)

    y_true_test, y_prob_test = model.predict(test_loader, return_prob=True)
    plot_confusion_matrix(y_true_test, y_pred_test, save_dir)
    plot_precision_recall_curve(y_true_test, y_prob_test, save_dir)
    plot_roc_curve(y_true_test, y_prob_test, save_dir)
    return metrics


# -- CLI -------------------------------------------------------------------


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native point-cloud classifier: train / evaluate"
    )
    sub = parser.add_subparsers(dest="command")

    tp = sub.add_parser("train", help="train a model")
    tp.add_argument("model", choices=sorted(MODEL_DATASETS))
    tp.add_argument("--dataset", default=None, help="default: the model's dataset")
    tp.add_argument("--config-dir", default="configs")
    tp.add_argument("--data-dir", default=None, help="override dataset.data_dir")
    tp.add_argument("--log-dir", default=None, help="override logging.log_dir")
    tp.add_argument("--epochs", type=int, default=None, help="override trainer.epochs")
    tp.add_argument("--seed", type=int, default=None, help="override trainer.seed (init RNG)")
    tp.add_argument("--plots", action="store_true")
    tp.add_argument(
        "--create-dataset",
        action="store_true",
        help="run the offline preprocessing pipeline before training",
    )

    quant_help = (
        "int8: score on the s8 MXU path (dynamic per-row activation × "
        "per-channel weight quantization, ops/quant.py); deep_sets only.  "
        "auto: int8 iff the measured crossover says it wins (φ width ≥ 1024, "
        "factory.resolve_quant), else float — safe on any model"
    )
    ep = sub.add_parser("evaluate", help="evaluate a finished run dir")
    ep.add_argument("model_dir")
    ep.add_argument("--save-dir", default=None, help="default: <model_dir>/eval")
    ep.add_argument("--quant", default="none", choices=["none", "int8", "auto"], help=quant_help)

    rp = sub.add_parser("resume", help="resume an interrupted run dir")
    rp.add_argument("model_dir")

    ip = sub.add_parser("infer", help="batch inference from a run dir → CSV")
    ip.add_argument("model_dir")
    ip.add_argument("--split", default="test", choices=["train", "val", "test"])
    ip.add_argument("--output", default=None)
    ip.add_argument("--quant", default="none", choices=["none", "int8", "auto"], help=quant_help)

    irp = sub.add_parser(
        "infer-raw", help="serve predictions for a raw shower HDF5 file"
    )
    irp.add_argument("model_dir")
    irp.add_argument("--input", required=True, help="raw .h5 shower file")
    irp.add_argument("--output", default=None)
    irp.add_argument("--quant", default="none", choices=["none", "int8", "auto"], help=quant_help)

    sv = sub.add_parser(
        "serve",
        help="HTTP scoring endpoint: POST raw shower HDF5 bytes to "
        "/predict, get per-event probabilities (GET /health)",
    )
    sv.add_argument("model_dir")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--quant", default="none", choices=["none", "int8", "auto"], help=quant_help)

    xp = sub.add_parser(
        "export",
        help="export a finished run to self-contained StableHLO serving "
        "artifacts (one per bucketed batch shape + manifest.json)",
    )
    xp.add_argument("model_dir")
    xp.add_argument("--out-dir", default=None, help="default: <model_dir>/exported")
    xp.add_argument("--quant", default="none", choices=["none", "int8", "auto"], help=quant_help)
    xp.add_argument(
        "--platforms", nargs="+", default=None,
        help="target platforms (e.g. cpu tpu); default: current backend",
    )

    cp = sub.add_parser(
        "create-datasets", help="run offline preprocessing for all representations"
    )
    cp.add_argument("--data-dir", required=True)
    cp.add_argument("--config-dir", default="configs")
    cp.add_argument(
        "--datasets", nargs="+", default=["s2pt", "s2ppc", "s2pg"],
        choices=["s2pt", "s2ppc", "s2pg"],
    )
    cp.add_argument(
        "--workers", type=int, default=1,
        help="fan per-file load+preprocess out over N processes; outputs "
        "are bit-identical to --workers 1 (offset/split/concat stay "
        "sequential)",
    )

    cv = sub.add_parser(
        "convert",
        help="convert a reference torch checkpoint (torch.save state_dict) "
        "into this framework's checkpoint format",
    )
    cv.add_argument("model", choices=["fully_connected_net", "deep_sets", "graph_net"])
    cv.add_argument("torch_ckpt", help="reference best_model.pt / model.pt")
    cv.add_argument("out", help="output path (e.g. <run_dir>/model.pt)")
    cv.add_argument("--config-dir", default="configs")
    cv.add_argument(
        "--config", default=None,
        help="resolved config.yaml from the reference run dir (defaults to "
        "the configs/ overlay for the model — dims must match the ckpt)",
    )
    cv.add_argument(
        "--to-torch", action="store_true",
        help="reverse direction: read one of OUR checkpoints and write a "
        "reference-loadable torch state_dict",
    )
    return parser


def main(argv=None) -> None:
    # warm-start policy: CLI runs reuse compiled executables across
    # processes (rev-keyed persistent cache; PCC_COMPILE_CACHE=0 opts out
    # — utils/jit_cache.py).  Measured 6.6 → ~2 min/run on the round-4
    # sweep campaign.
    from point_cloud_classifier_tpu.utils.jit_cache import enable_default_cache

    enable_default_cache()
    args = _build_parser().parse_args(argv)
    if args.command == "evaluate":
        # quantized eval gets its own default dir: writing into eval/
        # would silently overwrite the float baseline's metrics.json with
        # int8-path numbers and leave no marker of which path produced
        # them.  evaluate_model owns the choice — it must happen AFTER
        # --quant auto resolves against the run's config
        evaluate_model(
            model_dir=args.model_dir, save_dir=args.save_dir, quant=args.quant
        )
        return

    if args.command == "resume":
        resume_training(model_dir=args.model_dir)
        return

    if args.command == "infer":
        infer(model_dir=args.model_dir, split=args.split, output=args.output,
              quant=args.quant)
        return

    if args.command == "infer-raw":
        infer_raw(model_dir=args.model_dir, input_path=args.input,
                  output=args.output, quant=args.quant)
        return

    if args.command == "serve":
        from point_cloud_classifier_tpu.server import serve

        serve(args.model_dir, host=args.host, port=args.port, quant=args.quant)
        return

    if args.command == "export":
        from point_cloud_classifier_tpu.serving import export_run

        out = export_run(
            args.model_dir,
            out_dir=args.out_dir,
            quant=args.quant,
            platforms=tuple(args.platforms) if args.platforms else None,
        )
        print(f"Exported serving artifacts to {out}")
        return

    if args.command == "convert":
        from point_cloud_classifier_tpu.convert import (
            convert_checkpoint,
            export_torch_checkpoint,
        )

        if args.config:
            import yaml

            with open(args.config) as f:
                config = yaml.safe_load(f)
        else:
            config = load_config(
                os.path.join(args.config_dir, "base.yaml"),
                os.path.join(args.config_dir, f"{args.model}.yaml"),
            )
        fn = export_torch_checkpoint if args.to_torch else convert_checkpoint
        fn(args.model, config, args.torch_ckpt, args.out)
        print(f"Converted {args.torch_ckpt} -> {args.out}")
        return

    if args.command == "create-datasets":
        # the module-level equivalent of the reference's utils/data.py
        # __main__ block (`utils/data.py:1264-1266`)
        dataset_models = {
            "s2pt": "fully_connected_net",
            "s2ppc": "deep_sets",
            "s2pg": "graph_net",
        }
        for ds in args.datasets:
            config = load_config(
                os.path.join(args.config_dir, "base.yaml"),
                os.path.join(args.config_dir, f"{dataset_models[ds]}.yaml"),
            )
            config["dataset"]["data_dir"] = args.data_dir
            config["dataset"]["create_dataset"] = True
            if args.workers > 1:
                config["dataset"]["workers"] = args.workers
            get_dataloader(ds, config)
        return

    if args.command != "train":
        _build_parser().print_help()
        return

    model = args.model
    dataset = (args.dataset or MODEL_DATASETS[model]).lower()
    config = load_config(
        os.path.join(args.config_dir, "base.yaml"),
        os.path.join(args.config_dir, f"{model}.yaml"),
    )
    if args.data_dir:
        config["dataset"]["data_dir"] = args.data_dir
    if args.log_dir:
        config["logging"]["log_dir"] = args.log_dir
    if args.epochs is not None:
        config.setdefault("trainer", {})["epochs"] = args.epochs
    if args.seed is not None:
        # setdefault like --epochs above: a config without a trainer
        # section must not silently drop the override
        config.setdefault("trainer", {})["seed"] = args.seed
    if args.create_dataset:
        config["dataset"]["create_dataset"] = True
        get_dataloader(dataset, config)
        config["dataset"]["create_dataset"] = False

    train_model(model, dataset, config, plots=args.plots)


if __name__ == "__main__":
    main()
