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


def _arm_slice(tree, i: int):
    """Arm ``i``'s unstacked pytree (numpy leaves)."""
    return jax.tree.map(lambda x: np.asarray(x[i]), tree)


def train_configs_vmapped(
    model: nn.Module,
    learning_rates: Sequence[float],
    optimizer: str,
    epochs: int,
    train_loader: Iterable,
    val_loader: Iterable,
    seeds: Sequence[int] = None,
    patience: int = 10,
):
    """Train K same-architecture configs simultaneously.

    Reproduces the sequential trainer's semantics per arm
    (`models/wrapper.py` / reference `models/wrapper.py:97-139`): per-epoch
    validation loss, best-val checkpoint tracking, and early stopping with
    the given patience — stopped arms simply freeze (their updates are
    masked out) while the rest keep training in the same vmapped step.

    Returns a dict with per-arm ``val_accs`` / ``train_accs`` (scored with
    the FINAL params, like the reference's post-fit ``predict``), the per-arm
    ``final_state`` / ``best_state`` lists (``{"params", "batch_stats"}``
    pytrees, ModelWrapper checkpoint format), and ``n_params``.
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

    def one_train_step(p, stats, s, active, batch):
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
        updates, new_s = tx.update(grads, s, p)
        new_p = optax.apply_updates(p, updates)
        # early-stopped arms freeze: keep old params/stats/opt state
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(active, a, b), new, old
        )
        return keep(new_p, p), keep(new_stats, stats), keep(new_s, s), loss

    vstep = jax.jit(
        jax.vmap(one_train_step, in_axes=(0, 0, 0, 0, None)),
        donate_argnums=(0, 1, 2),
    )

    def one_eval(p, stats, batch):
        logits = model.apply({"params": p, "batch_stats": stats}, batch, train=False)
        probs = jax.nn.sigmoid(logits)
        loss = masked_bce(logits, batch["y"], batch["y_mask"])
        correct = jnp.sum(
            ((probs >= 0.5) == (batch["y"] >= 0.5))[:, 0] * batch["y_mask"]
        )
        return loss, correct

    veval = jax.jit(jax.vmap(one_eval, in_axes=(0, 0, None)))

    best_val_loss = jnp.full((k,), jnp.inf)
    stall = jnp.zeros((k,), dtype=jnp.int32)
    # explicit copies: the train step donates (params, stats, opt_state)
    # buffers, so the best-checkpoint trackers must not alias them
    best_params = jax.tree.map(jnp.copy, params)
    best_stats = jax.tree.map(jnp.copy, batch_stats)

    for _ in range(epochs):
        active = stall < patience
        if not bool(jnp.any(active)):
            break
        for batch in train_loader:
            params, batch_stats, opt_state, _ = vstep(
                params, batch_stats, opt_state, active, batch
            )

        # per-arm val loss → best-checkpoint + early-stop bookkeeping
        losses, n_batches = jnp.zeros((k,)), 0
        for batch in val_loader:
            loss, _ = veval(params, batch_stats, batch)
            losses = losses + loss
            n_batches += 1
        val_loss = losses / max(n_batches, 1)
        improved = (val_loss < best_val_loss) & active
        best_val_loss = jnp.where(improved, val_loss, best_val_loss)
        stall = jnp.where(improved, 0, stall + active.astype(jnp.int32))

        def sel(new, old):
            # leaves are stacked [K, ...]; broadcast the [K] mask per leaf
            return jax.tree.map(
                lambda a, b: jnp.where(
                    improved.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                new,
                old,
            )

        best_params = sel(params, best_params)
        best_stats = sel(batch_stats, best_stats)

    def accuracy(loader):
        correct = jnp.zeros((k,))
        total = 0.0
        for batch in loader:
            _, c = veval(params, batch_stats, batch)
            correct = correct + c
            total += float(np.sum(batch["y_mask"]))
        return [float(c) / max(total, 1.0) for c in np.asarray(correct)]

    val_accs = accuracy(val_loader)
    train_accs = accuracy(train_loader)
    n_params = int(sum(x.size for x in jax.tree.leaves(params)) // max(k, 1))
    return {
        "val_accs": val_accs,
        "train_accs": train_accs,
        "n_params": n_params,
        "final_state": [
            {"params": _arm_slice(params, i), "batch_stats": _arm_slice(batch_stats, i)}
            for i in range(k)
        ],
        "best_state": [
            {
                "params": _arm_slice(best_params, i),
                "batch_stats": _arm_slice(best_stats, i),
            }
            for i in range(k)
        ],
    }
