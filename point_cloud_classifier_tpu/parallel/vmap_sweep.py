"""Vmapped multi-config training: many sweep arms per chip.

The reference sweep trains one configuration at a time in a Python loop
(`sweep.py:29-66`).  On TPU, configurations that share an architecture shape
(same layer widths / flags / batch size) differ only in *values* — learning
rate, init seed — so their train steps are the same program and can run as
one ``jax.vmap``-ed step over a stacked parameter axis: one XLA program
computing K sweep arms per step, with the MXU seeing K-fold larger batched
matmuls instead of K tiny sequential ones.

Per-config learning rates ride inside the optimizer state via
``optax.inject_hyperparams``, so a single ``tx.update`` serves every arm.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from point_cloud_classifier_tpu.models.wrapper import masked_bce


def _make_tx(optimizer: str):
    if optimizer == "adam":
        base = optax.adam
        kwargs = dict(b1=0.9, b2=0.999, eps=1e-8)
    elif optimizer == "adamw":
        base = optax.adamw
        kwargs = dict(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    else:
        raise ValueError(f"Unknown optimizer: {optimizer}")
    return optax.inject_hyperparams(base)(learning_rate=1.0, **kwargs)


def train_configs_vmapped(
    model: nn.Module,
    learning_rates: Sequence[float],
    optimizer: str,
    epochs: int,
    train_loader: Iterable,
    val_loader: Iterable,
    seeds: Sequence[int] = None,
) -> Tuple[List[float], int]:
    """Train K same-architecture configs simultaneously.

    Returns ``(val accs, train accs, param count)`` at the final epoch —
    matching the reference sweep's contract, which scores the final-epoch
    model (`train.py:168-175`; with the sweep's forced 10 epochs the
    patience-10 early stop can never trigger, so fixed-epoch training is
    semantics-preserving).
    """
    k = len(learning_rates)
    if seeds is None:
        seeds = [0] * k
    lrs = jnp.asarray(learning_rates, dtype=jnp.float32)

    first = next(iter(train_loader))
    variables = jax.vmap(
        lambda s: model.init(jax.random.PRNGKey(s), first, train=False)
    )(jnp.asarray(seeds, dtype=jnp.uint32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = _make_tx(optimizer)
    opt_state = jax.vmap(tx.init)(params)
    # per-arm learning rate lives in the injected hyperparams
    opt_state = opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": lrs}
    )

    def one_train_step(p, stats, s, batch):
        def loss_fn(pp):
            logits, mutated = model.apply(
                {"params": pp, "batch_stats": stats},
                batch,
                train=True,
                mutable=["batch_stats"],
            )
            return (
                masked_bce(logits, batch["y"], batch["y_mask"]),
                mutated.get("batch_stats", stats),
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), new_stats, s, loss

    vstep = jax.jit(
        jax.vmap(one_train_step, in_axes=(0, 0, 0, None)), donate_argnums=(0, 1, 2)
    )

    def one_eval(p, stats, batch):
        logits = model.apply(
            {"params": p, "batch_stats": stats}, batch, train=False
        )
        probs = jax.nn.sigmoid(logits)
        correct = jnp.sum(
            ((probs >= 0.5) == (batch["y"] >= 0.5))[:, 0] * batch["y_mask"]
        )
        return correct

    veval = jax.jit(jax.vmap(one_eval, in_axes=(0, 0, None)))

    for _ in range(epochs):
        for batch in train_loader:
            params, batch_stats, opt_state, _ = vstep(
                params, batch_stats, opt_state, batch
            )

    def accuracy(loader):
        correct = jnp.zeros((k,))
        total = 0.0
        for batch in loader:
            correct = correct + veval(params, batch_stats, batch)
            total += float(np.sum(batch["y_mask"]))
        return [float(c) / max(total, 1.0) for c in np.asarray(correct)]

    val_accs = accuracy(val_loader)
    train_accs = accuracy(train_loader)
    n_params = int(sum(x.size for x in jax.tree.leaves(params)) // max(k, 1))
    return val_accs, train_accs, n_params
