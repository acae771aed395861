"""Evaluation plot artifacts.

Produces the same four PNG artifacts as the reference (`utils/plots.py:6-94`):
row-normalized confusion-matrix heatmap, ROC curve with AUC, precision-recall
curve with AUC, and the energy-vs-hits scatter for the tabular dataset.
``save_dir=None`` shows the figure interactively like the reference does —
on hosts with a GUI backend; headless hosts (no ``DISPLAY``, no explicit
``MPLBACKEND``) default to the non-interactive Agg backend, where ``show()``
is a no-op and the figure is simply closed.
"""

from __future__ import annotations

import os

import matplotlib

if (
    not os.environ.get("MPLBACKEND")
    and not os.environ.get("DISPLAY")
    and not os.environ.get("WAYLAND_DISPLAY")
    and __import__("sys").platform.startswith("linux")
):
    # headless default only — don't clobber an interactive host's backend
    # (the unconditional pin made the documented save_dir=None interactive
    # path a silent no-op everywhere).  The check is linux-X11/Wayland
    # specific: macOS never sets DISPLAY yet has a working GUI backend
    matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from sklearn.metrics import (
    auc,
    confusion_matrix,
    precision_recall_curve,
    roc_auc_score,
    roc_curve,
)


def _finish(fig, save_dir, filename):
    if save_dir:
        fig.savefig(os.path.join(save_dir, filename))
        plt.close(fig)
    else:  # pragma: no cover - interactive use
        plt.show()
        if not plt.isinteractive():
            # Agg's / non-interactive show() returns without a window:
            # don't leak the figure.  INTERACTIVE mode (%matplotlib) must
            # keep the window open like the reference does — closing here
            # destroyed it the moment show() returned
            plt.close(fig)


def plot_data(dataset, sample_size=None, random_state=42, save_dir=None):
    """Scatter of total energy vs hit count per event, colored by label.

    Mirrors the reference EDA scatter (`utils/plots.py:6-34`).
    """
    df = dataset.copy()
    if sample_size is not None:
        df = df.groupby("label", group_keys=False).sample(
            n=sample_size, random_state=random_state
        )

    fig, ax = plt.subplots(figsize=(10, 6))
    for label, group in df.groupby("label"):
        ax.scatter(
            group["energy_total"], group["hits_total"], alpha=0.7, label=str(label), s=12
        )
    ax.set_xlabel("Shower Energy (MeV)")
    ax.set_ylabel("Number of Hits")
    ax.legend(title="Particle")
    ax.grid(True)
    _finish(fig, save_dir, "plot.png")


def plot_confusion_matrix(y_true, y_pred, save_dir=None, split_name="test"):
    """Row-normalized confusion matrix heatmap (`utils/plots.py:37-53`)."""
    cm = confusion_matrix(y_true, y_pred, normalize="true")
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(cm, cmap="Blues", vmin=0.0, vmax=1.0)
    for (i, j), v in np.ndenumerate(cm):
        ax.text(
            j,
            i,
            f"{v:.2f}",
            ha="center",
            va="center",
            color="white" if v > 0.5 else "black",
        )
    ax.set_xticks(range(cm.shape[1]))
    ax.set_yticks(range(cm.shape[0]))
    ax.set_title(f"Confusion Matrix ({split_name})")
    ax.set_xlabel("Predicted label")
    ax.set_ylabel("True label")
    fig.tight_layout()
    _finish(fig, save_dir, f"confusion_matrix_{split_name}.png")


def plot_roc_curve(y_true, y_prob, save_dir=None, split_name="test"):
    """ROC curve with AUC annotation (`utils/plots.py:55-75`)."""
    fpr, tpr, _ = roc_curve(y_true, y_prob)
    auc_value = roc_auc_score(y_true, y_prob)

    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(fpr, tpr, label=f"AUC = {auc_value:.3f}")
    ax.plot([0, 1], [0, 1], "k--", label="Random")
    ax.set_title(f"ROC Curve ({split_name})")
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.legend(loc="lower right")
    fig.tight_layout()
    _finish(fig, save_dir, f"roc_curve_{split_name}.png")


def plot_precision_recall_curve(y_true, y_prob, save_dir=None, split_name="test"):
    """Precision-recall curve with AUC annotation (`utils/plots.py:77-94`)."""
    precision, recall, _ = precision_recall_curve(y_true, y_prob)
    pr_auc = auc(recall, precision)

    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(recall, precision, label=f"AUC = {pr_auc:.3f}")
    ax.set_title(f"Precision-Recall Curve ({split_name})")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.legend(loc="lower left")
    fig.tight_layout()
    _finish(fig, save_dir, f"precision_recall_{split_name}.png")
