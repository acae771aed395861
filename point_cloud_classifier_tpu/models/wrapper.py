"""Trainer: jit-compiled train/eval steps with early stopping + checkpoints.

Behavior parity with the reference trainer (`models/wrapper.py:8-181`):

- optimizer adam/adamw at torch defaults (betas 0.9/0.999, eps 1e-8,
  adamw weight-decay 0.01 applied to every parameter)
- loss: sigmoid binary cross-entropy on logits, per-batch mean; the epoch
  train loss and val loss are means of batch means (`:76`, `:119`)
- per-epoch validation with accuracy at sigmoid ≥ 0.5 (`:114-115`)
- best-val-loss checkpoint (``best_model.pt``) + early stopping with
  patience 10 (`:23-26`, `:128-139`); final ``model.pt`` via ``save()``

TPU-native differences: the whole optimization step (forward, backward,
Adam update, batch-norm stat update) is one donated jit function; batches are
the static-shape padded layouts, so the loss/accuracy masks padding and the
jit cache stays small (one entry per bucket shape).  Scalar metrics go to
``metrics.jsonl`` in the run dir (and to TensorBoard when
``PCC_TENSORBOARD=1`` and torch is importable — histograms are opt-in via
``PCC_TB_HISTOGRAMS=1`` because they force device→host copies every epoch,
which is exactly the reference's `:82-84` throughput sink).
"""

from __future__ import annotations

import json
import os
import pickle
import time
from functools import partial
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


def masked_bce(logits: jnp.ndarray, y: jnp.ndarray, y_mask: jnp.ndarray) -> jnp.ndarray:
    per = optax.sigmoid_binary_cross_entropy(logits, y)
    w = y_mask[:, None]
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def _make_tx(optimizer: str) -> optax.GradientTransformation:
    """adam/adamw at torch defaults, with the learning rate riding in the
    optimizer state (``inject_hyperparams``) so one compiled train step
    serves every learning rate."""
    if optimizer == "adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=1.0, b1=0.9, b2=0.999, eps=1e-8
        )
    if optimizer == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=1.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
        )
    raise ValueError(f"Unknown optimizer: {optimizer}")


# compiled (train_step, eval_step, tx) shared across ModelWrapper instances
# with the same architecture + optimizer: jit caches are per-function-object,
# so per-instance closures would recompile on every sweep run
_STEP_CACHE: Dict[tuple, tuple] = {}
_INIT_CACHE: Dict[str, object] = {}
_TRANSFER_WARMED = False


def _warm_transfer_async() -> None:
    """Prime the device→host path on a background thread.

    On tunneled TPU backends the FIRST D2H transfer of a process can stall
    for tens of seconds (lazy transport setup); issuing a 1-element
    round-trip early overlaps that stall with data loading and compilation
    instead of eating it inside the first checkpoint write or eval.
    """
    global _TRANSFER_WARMED
    if _TRANSFER_WARMED:
        return
    _TRANSFER_WARMED = True
    import threading

    def warm():
        try:
            np.asarray(jnp.zeros((1,)))
        except Exception:
            pass

    threading.Thread(target=warm, daemon=True).start()


def _shape_key(batch):
    """One bucketed batch shape = one compiled program = one fuse group.

    NOTE: data/resident.py carries its own _shape_key with a different
    dtype encoding (dtype.str vs str(dtype)); the two key INDEPENDENT
    caches and must never be compared across modules."""
    return tuple(sorted((k, np.shape(v), str(v.dtype)) for k, v in batch.items()))


def _stack_and_constrain(mesh, batches):
    """Stack a tuple of per-batch dicts into one ``[K, ...]`` dict and,
    under a mesh, constrain every leaf to the declared stacked
    data-parallel layout.

    The SINGLE implementation behind both fuse-window forms — the in-jit
    tuple stack (``_stack_in_jit``) and the memoized pre-stack
    (``_prestack_window``): the two paths must compile identical SPMD
    layouts for the same window, so the stack+constraint body lives here
    once (round-5 review: the former duplicate bodies could silently
    diverge)."""
    if isinstance(batches, tuple):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    else:
        stacked = batches
    if mesh is not None:
        from point_cloud_classifier_tpu.parallel.mesh import (
            stacked_batch_sharding,
        )

        stacked = {
            k: jax.lax.with_sharding_constraint(
                v, stacked_batch_sharding(mesh, v)
            )
            for k, v in stacked.items()
        }
    return stacked


@jax.jit
def _pack_leaves(leaves):
    """Flatten a list of same-dtype arrays into one device array.

    Must be jitted: on backends where eager ops compile remotely, the
    per-leaf ravel/concatenate chain costs a remote compilation EACH."""
    return jnp.concatenate([l.ravel() for l in leaves])


class _ScalarLog:
    """metrics.jsonl writer with optional TensorBoard mirroring."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl") if log_dir else None
        self._tb = None
        if log_dir and os.environ.get("PCC_TENSORBOARD") == "1":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        if self._tb:
            self._tb.add_scalar(tag, value, step)

    def histograms(self, named_arrays, step: int) -> None:
        """Per-parameter weight histograms (reference `models/wrapper.py:82-84`).

        Opt-in via PCC_TB_HISTOGRAMS=1 (+ PCC_TENSORBOARD=1): forces a full
        device→host copy of the weights every epoch — exactly the throughput
        sink the reference pays unconditionally.
        """
        if self._tb and os.environ.get("PCC_TB_HISTOGRAMS") == "1":
            for name, arr in named_arrays:
                self._tb.add_histogram(name, np.asarray(arr), step)

    def close(self) -> None:
        if self._tb:
            self._tb.close()


class ModelWrapper:
    """Owns a Flax module + optimizer state; reference-shaped fit/predict/save."""

    def __init__(
        self,
        model: nn.Module,
        learning_rate: float,
        epochs: int,
        log_dir: Optional[str] = None,
        optimizer: str = "adam",
        seed: int = 0,
        mesh=None,
        data_parallel: bool = False,
        n_model: int = 1,
        state_every: int = 1,
        fuse_steps: int = 1,
        device_resident: bool = False,
    ):
        self.model = model
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.log_dir = log_dir
        self.seed = seed
        # full-state (resume) checkpoint cadence in epochs; 0 disables.
        # Sweeps disable it — their runs only need meta.json + final weights,
        # and an orbax write per epoch would dominate tiny-model epochs.
        self.state_every = state_every
        # step fusion: scan over K consecutive same-shape batches in ONE
        # dispatched program.  Semantics identical to K sequential steps
        # (lax.scan carries the optimizer chain in order); the win is K-fold
        # fewer dispatches — decisive on high-latency transports, a modest
        # Python-overhead cut everywhere else.  YAML: ``trainer.fuse_steps``
        # (the shipped configs stay byte-compatible with the reference, so
        # they never set it); env PCC_FUSE_STEPS force-overrides, mirroring
        # PCC_RESIDENT.
        env_fuse = os.environ.get("PCC_FUSE_STEPS")
        if env_fuse is not None:
            try:
                fuse_steps = int(env_fuse)
            except ValueError as e:
                raise ValueError(
                    f"PCC_FUSE_STEPS must be an integer, got {env_fuse!r}"
                ) from e
        self.fuse_steps = max(1, int(fuse_steps))
        # device-resident input pipeline: pin the (small) dataset in HBM on
        # the first epoch and replay it, eliminating per-epoch host→device
        # transfer — the steady-state pipeline for datasets ≪ HBM (see
        # data/resident.py).  YAML: ``trainer.device_resident: true``;
        # env PCC_RESIDENT=1/0 force-overrides.
        env_resident = os.environ.get("PCC_RESIDENT")
        if env_resident is not None:
            device_resident = env_resident == "1"
        self.device_resident = device_resident
        # distribution: a (data, model) jax mesh; None = single device.  The
        # reference has no distributed path at all (its device policy is one
        # line, `models/wrapper.py:22`); here batches shard over the ``data``
        # axis and wide weights over ``model``, with XLA emitting the ICI
        # collectives (see parallel/mesh.py).
        # env overrides mirror PCC_RESIDENT/PCC_FUSE_STEPS: CLI runs can go
        # data-parallel (PCC_DATA_PARALLEL=1) or tensor-parallel
        # (PCC_N_MODEL=K) without touching the byte-compat configs; YAML
        # can still set trainer.data_parallel / trainer.n_model directly
        # (the trainer section is splatted into this constructor).
        env_dp = os.environ.get("PCC_DATA_PARALLEL")
        if env_dp is not None:
            # strict 0/1 like PCC_FUSE_STEPS/PCC_N_MODEL: a silently
            # ignored "true"/"yes" would void a mesh A/B
            if env_dp not in ("0", "1"):
                raise ValueError(
                    f"PCC_DATA_PARALLEL must be '0' or '1', got {env_dp!r}"
                )
            data_parallel = env_dp == "1"
        env_nm = os.environ.get("PCC_N_MODEL")
        if env_nm is not None:
            try:
                n_model = int(env_nm)
            except ValueError as e:
                raise ValueError(
                    f"PCC_N_MODEL must be an integer, got {env_nm!r}"
                ) from e
        if mesh is None and (data_parallel or n_model > 1):
            from point_cloud_classifier_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_model=n_model)
        self.mesh = mesh
        # fuse_steps > 1 under a mesh is supported: the fused steps
        # constrain the stacked [K, ...] fuse window to the declared
        # data-parallel shardings inside the jit (see _stack_in_jit /
        # parallel.mesh.stacked_batch_sharding), so the scanned program is
        # the same SPMD computation as K unfused steps — one dispatch
        # instead of K, which is what makes multi-chip training
        # transport-independent on high-latency links.
        self.patience = 10
        self.best_val_loss = float("inf")
        self.early_stop_counter = 0
        self.checkpoint_path = os.path.join(log_dir, "best_model.pt") if log_dir else None

        self.optimizer_name = optimizer
        self.tx = _make_tx(optimizer)  # lr set in opt_state at init
        _warm_transfer_async()

        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self._train_step = None
        self._eval_step = None
        self._eval_step_fused = None
        # memoized [K, ...]-stacked fuse windows for device-resident replay
        # (see _prestack_window)
        self._window_memo = {}
        self._window_memo_bytes = 0
        # id() of the loader whose windows the memo currently holds (for
        # the stale-clear in _eval_dispatch: repeated predict/evaluate on
        # the SAME ResidentCache must keep hitting across calls — the
        # memo's element-wise identity check makes an id-reuse collision
        # harmless, worst case some stale windows wait for LRU pressure
        # exactly as they did pre-round-5)
        self._memo_loader_id = None
        # True while fit()'s epoch loop runs: the memo legitimately holds
        # windows from TWO loaders there (train + per-epoch fit-val), so
        # the stale-entry clear at _eval_dispatch entry must not fire for
        # fit's internal validation calls (see _clear_window_memo)
        self._in_fit = False
        self._window_stack_jit = None

    # -- initialization ------------------------------------------------------

    def _ensure_initialized(self, batch: Dict[str, np.ndarray]) -> None:
        if self.params is not None:
            return
        # jit the init: run eagerly it dispatches one remote compilation per
        # primitive on AOT-compiled backends.  Cached per architecture so
        # sweep runs share it.
        key = repr(self.model)
        if key not in _INIT_CACHE:
            # bind the MODULE, not self: a lambda over `self` would pin
            # the whole first wrapper per architecture (trained params,
            # opt state, HBM window memo) in this module-level cache for
            # the process lifetime — Flax modules are just frozen config
            # dataclasses, cheap to retain (round-5 review finding)
            model = self.model
            _INIT_CACHE[key] = jax.jit(
                lambda rng, b: model.init(rng, b, train=False)
            )
        variables = _INIT_CACHE[key](
            jax.random.PRNGKey(self.seed), jax.tree.map(jnp.asarray, batch)
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if self.mesh is not None:
            self._place_state()
        self.opt_state = self._init_opt_state()
        self._build_steps()

    def _init_opt_state(self):
        state = self.tx.init(self.params)
        return state._replace(
            hyperparams={
                **state.hyperparams,
                "learning_rate": jnp.asarray(self.learning_rate, dtype=jnp.float32),
            }
        )

    def _place_state(self) -> None:
        from point_cloud_classifier_tpu.parallel.mesh import (
            param_shardings,
            replicated,
        )

        shardings = param_shardings(self.mesh, self.params)
        self.params = jax.tree.map(jax.device_put, self.params, shardings)
        rep = replicated(self.mesh)
        self.batch_stats = jax.tree.map(
            lambda x: jax.device_put(x, rep), self.batch_stats
        )

    def _put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return batch
        from point_cloud_classifier_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def _batches(self, loader: Iterable) -> Iterable:
        """Batch stream for the hot loop.

        Default: host batches go straight into the jit'd step — jit's
        argument-transfer path pipelines H2D with async dispatch and measures
        fastest on this backend.  ``PCC_PREFETCH=1`` switches to explicit
        double-buffered ``device_put`` prefetch (``data/prefetch.py``), which
        wins on hosts where eager transfers overlap better than jit's.
        """
        from point_cloud_classifier_tpu.data.resident import ResidentCache

        if isinstance(loader, ResidentCache):
            # batches are already device-resident with their shardings;
            # prefetch/background/put layers would only add copies
            return loader
        if os.environ.get("PCC_BG_LOADER") == "1":
            from point_cloud_classifier_tpu.data.background import BackgroundIterator

            loader = BackgroundIterator(loader, prefetch=2)
        if os.environ.get("PCC_PREFETCH") == "1":
            from point_cloud_classifier_tpu.data.prefetch import prefetch_to_device

            return prefetch_to_device(loader, size=2, mesh=self.mesh)
        if self.mesh is not None:
            return (self._put_batch(b) for b in loader)
        return loader

    def _clear_window_memo(self):
        """Drop all memoized pre-stacked windows (and the source batch
        tuples they pin in HBM).  Called at fit() entry and at
        _eval_dispatch entry OUTSIDE fit, so a previous run's windows
        release before the next loader uploads rather than waiting for
        LRU pressure (advisor round-4 finding).  fit's own per-epoch
        validation must NOT clear — the memo legitimately interleaves
        train and fit-val windows across the epoch loop."""
        if self._window_memo:
            self._window_memo.clear()
        self._window_memo_bytes = 0
        self._memo_loader_id = None

    def _prestack_window(self, pending, loader):
        """Memoized [K, ...]-stacked form of a device-resident fuse window.

        The fused steps accept a tuple of per-batch dicts and stack it
        INSIDE the jit (`_stack_in_jit`) — one dispatch, but the 256-way
        concatenate re-copies the whole window through HBM on EVERY
        flush, every epoch.  On the HBM-roofline-bound flagship that copy
        measured **9% of the whole resident train step** (tuple 550.5k vs
        pre-stacked 604.5k clouds/sec meshless, 553.1k vs 607.0k under
        the mesh — same-window A/Bs 2026-08-20, fuse 256; the graph
        family hides it at 1.1% because its step is compute-bound).

        ``ResidentCache`` replays the SAME device batch dicts every epoch,
        so the stacked window is computed once (one jitted stack dispatch,
        sharding-constrained under a mesh exactly like `_stack_in_jit`)
        and reused for the rest of training — from epoch 2 the flush pays
        zero stacking traffic.  Memoization is gated on
        ``ResidentCache.replay_is_window_stable`` (streaming loaders and
        batch-granular shuffles recompose windows every epoch — nothing
        would hit, and the first-pass gate means stacking starts on the
        first REPLAY epoch) and bounded by the loader's own
        ``budget_bytes`` with least-recently-inserted eviction, so total
        resident HBM is ≤ 2× the configured budget.  Returns ``None``
        when it does not apply and the caller falls back to the in-jit
        tuple path.  Entries hold the source batch tuple, so the id-keys
        cannot alias a live window, and hits verify identity
        element-wise.
        """
        from point_cloud_classifier_tpu.data.resident import ResidentCache

        if not isinstance(loader, ResidentCache):
            return None
        if not loader.replay_is_window_stable(max(1, self.fuse_steps)):
            # streaming first pass, budget abandonment, or batch-granular
            # shuffle (window composition varies per epoch): memoizing
            # would churn stacks through the LRU for zero hits — drop THIS
            # loader's stale entries and ride the in-jit tuple stack.
            # Only this loader's: during fit the memo legitimately also
            # holds the OTHER loader's live windows (an unstable train
            # cache clearing wholesale wiped the stable fit-val loader's
            # windows on every fused flush, re-stacking them through HBM
            # each epoch — round-5 review finding)
            mine = [
                k for k, v in self._window_memo.items() if v[2] == id(loader)
            ]
            for k in mine:
                old = self._window_memo.pop(k)[1]
                self._window_memo_bytes -= sum(
                    int(v.nbytes) for v in old.values()
                )
            return None
        key = tuple(map(id, pending))
        entry = self._window_memo.get(key)
        if entry is not None and all(
            a is b for a, b in zip(entry[0], pending)
        ):
            return entry[1]
        # budget: mirror the LOADER's own resident cap (the memo is
        # additive to the cache's pinned bytes, so the documented ceiling
        # is 2× the configured budget); evict least-recently-inserted
        # entries when a stable-window workload still overflows (mixed
        # shape buckets can misalign occasional windows)
        budget = loader.budget_bytes
        if self._window_stack_jit is None:
            # same stack+constraint body as _stack_in_jit — shared via
            # _stack_and_constrain so both fuse-window forms compile the
            # identical SPMD layout
            mesh = self.mesh
            self._window_stack_jit = jax.jit(
                lambda batches: _stack_and_constrain(mesh, batches)
            )
        stacked = self._window_stack_jit(tuple(pending))
        nbytes = sum(int(v.nbytes) for v in stacked.values())
        if nbytes > budget:
            # single window over budget: use once, don't pin — and don't
            # enter the eviction loop (it would flush the entire memo for
            # an entry that is never inserted)
            return stacked
        while self._window_memo and self._window_memo_bytes + nbytes > budget:
            oldest = next(iter(self._window_memo))
            old = self._window_memo.pop(oldest)[1]
            self._window_memo_bytes -= sum(
                int(v.nbytes) for v in old.values()
            )
        # value: (source tuple for the identity hit-check, stacked window,
        # owning loader id for the selective unstable-loader clear above)
        self._window_memo[key] = (tuple(pending), stacked, id(loader))
        self._window_memo_bytes += nbytes
        return stacked

    def _mesh_cache_key(self):
        """Hashable mesh fingerprint for the step cache.

        The fused steps close over the mesh (their stacked-window sharding
        constraints name its axes), so two wrappers only share compiled
        steps when their meshes are the same shape over the same devices.
        """
        if self.mesh is None:
            return None
        return (
            tuple(self.mesh.shape.items()),
            tuple(d.id for d in self.mesh.devices.flat),
        )

    def _build_steps(self) -> None:
        key = (repr(self.model), self.optimizer_name, self._mesh_cache_key())
        if key in _STEP_CACHE:
            (
                self._train_step,
                self._eval_step,
                self._train_step_fused,
                self._train_step_debug,
                self._eval_step_fused,
            ) = _STEP_CACHE[key]
            return
        model, tx, mesh = self.model, self.tx, self.mesh

        def _step_math_full(params, batch_stats, opt_state, batch):
            def loss_fn(p):
                logits, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss = masked_bce(logits, batch["y"], batch["y_mask"])
                return loss, (logits, mutated.get("batch_stats", batch_stats))

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss, logits, grads

        def _step_math(params, batch_stats, opt_state, batch):
            # logits/grads dropped → XLA dead-code-eliminates their escape,
            # so the hot step pays nothing for the debug variant's existence
            return _step_math_full(params, batch_stats, opt_state, batch)[:4]

        train_step = partial(jax.jit, donate_argnums=(0, 1, 2))(_step_math)
        # histogram-parity step (reference `models/wrapper.py:79-84` logs the
        # last batch's logits + per-parameter grads every epoch): same math,
        # but the logits and gradient tree escape the jit boundary
        train_step_debug = partial(jax.jit, donate_argnums=(0, 1, 2))(
            _step_math_full
        )

        def _eval_math(params, batch_stats, batch):
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, train=False
            )
            loss = masked_bce(logits, batch["y"], batch["y_mask"])
            probs = jax.nn.sigmoid(logits)
            return loss, probs

        eval_step = jax.jit(_eval_math)

        def _stack_in_jit(batches):
            # fused steps accept EITHER a pre-stacked [K, ...] batch dict
            # (host path: one np.stack → one H2D transfer) OR a tuple of K
            # per-batch dicts (device-resident path): stacking K pinned
            # device arrays EAGERLY costs one dispatch per leaf per flush,
            # which on high-latency transports erased the whole fusion win
            # (measured: fuse-16 fit() 15× SLOWER per step than unfused in
            # a degraded window) — inside the jit it is free XLA data
            # movement and the flush stays ONE dispatch.  jit keys on the
            # pytree structure, so both forms coexist per compile cache.
            #
            # Under a mesh the stacked window is constrained to the
            # declared data-parallel layout ([K, B/data, ...]): without the
            # constraint the stack's sharding is whatever propagation
            # infers, i.e. implementation-defined placement — the reason
            # round-2 locked fused+mesh out entirely.
            return _stack_and_constrain(mesh, batches)

        @jax.jit
        def eval_step_fused(params, batch_stats, batches):
            """K eval steps in one program: scan over stacked batches.

            Params don't change between eval steps, so unlike the train
            scan there is no carried state — the scan exists purely to
            collapse K dispatches into one (decisive on high-latency
            transports; see fuse_steps)."""

            def body(carry, batch):
                return carry, _eval_math(params, batch_stats, batch)

            _, (losses, probs) = jax.lax.scan(body, None, _stack_in_jit(batches))
            return losses, probs

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step_fused(params, batch_stats, opt_state, batches):
            """K train steps in one program: scan over stacked batches."""

            def body(carry, batch):
                p, stats, opt = carry
                p, stats, opt, loss = _step_math(p, stats, opt, batch)
                return (p, stats, opt), loss

            (params, batch_stats, opt_state), losses = jax.lax.scan(
                body, (params, batch_stats, opt_state), _stack_in_jit(batches)
            )
            return params, batch_stats, opt_state, losses

        self._train_step = train_step
        self._eval_step = eval_step
        self._train_step_fused = train_step_fused
        self._train_step_debug = train_step_debug
        self._eval_step_fused = eval_step_fused
        _STEP_CACHE[key] = (
            train_step, eval_step, train_step_fused, train_step_debug,
            eval_step_fused,
        )

    # -- full-state checkpoint / resume (reference has none: its resume
    # granularity is "retrain", SURVEY §5) --------------------------------

    def _state_dir(self) -> Optional[str]:
        return os.path.abspath(os.path.join(self.log_dir, "state")) if self.log_dir else None

    def save_state(self, epoch: int, force: bool = False) -> None:
        """Orbax checkpoint of (params, batch_stats, opt_state) + counters."""
        path = self._state_dir()
        if path is None or self.params is None:
            return
        if not force and (
            self.state_every <= 0 or (epoch + 1) % self.state_every != 0
        ):
            return
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {
                "params": self.params,
                "batch_stats": self.batch_stats,
                "opt_state": self.opt_state,
            },
            force=True,
        )
        ckptr.wait_until_finished()
        with open(os.path.join(path, "trainer_state.json"), "w") as f:
            json.dump(
                {
                    "epoch": epoch,
                    "best_val_loss": self.best_val_loss,
                    "early_stop_counter": self.early_stop_counter,
                },
                f,
                indent=4,
            )

    def restore_state(self) -> int:
        """Restore a mid-training checkpoint; returns the next epoch index."""
        path = self._state_dir()
        meta_path = os.path.join(path, "trainer_state.json") if path else None
        if not (meta_path and os.path.exists(meta_path)):
            return 0
        import orbax.checkpoint as ocp

        raw = ocp.StandardCheckpointer().restore(path)
        self.params = jax.tree.map(jnp.asarray, raw["params"])
        self.batch_stats = jax.tree.map(jnp.asarray, raw.get("batch_stats", {}))
        if self.mesh is not None:
            self._place_state()  # resume under the declared shardings
        # optax state trees round-trip as nested lists/dicts; refit the
        # restored leaves onto a freshly-init'd state's treedef
        template = self._init_opt_state()
        self.opt_state = jax.tree.unflatten(
            jax.tree.structure(template),
            [jnp.asarray(x) for x in jax.tree.leaves(raw["opt_state"])],
        )
        self._build_steps()
        with open(meta_path) as f:
            meta = json.load(f)
        self.best_val_loss = meta["best_val_loss"]
        self.early_stop_counter = meta["early_stop_counter"]
        return meta["epoch"] + 1

    # -- training loop ---------------------------------------------------------

    def fit(
        self, train_loader: Iterable, val_loader: Iterable = None, resume: bool = False
    ) -> None:
        # _in_fit gates the stale-window clear in _eval_dispatch: per-epoch
        # validation inside this call must keep the live train+val memo
        self._in_fit = True
        try:
            return self._fit_impl(train_loader, val_loader, resume)
        finally:
            self._in_fit = False

    def _fit_impl(
        self, train_loader: Iterable, val_loader: Iterable = None, resume: bool = False
    ) -> None:
        from point_cloud_classifier_tpu.utils.profiling import StepTimer, maybe_trace

        log = _ScalarLog(self.log_dir)
        t0 = time.time()
        self._clear_window_memo()  # release any previous run's pinned windows
        start_epoch = self.restore_state() if resume else 0
        if self.device_resident:
            from point_cloud_classifier_tpu.data.resident import ResidentCache

            if not isinstance(train_loader, ResidentCache):
                # shuffle_seed keeps SGD stochastic across epochs: the cache
                # replays epoch-1 batches, so without it every epoch would
                # silently repeat the identical batch ORDER (the underlying
                # loader's per-epoch reshuffle never runs again).  Batch
                # COMPOSITION stays fixed after epoch one — the standard
                # trade of cached input pipelines (data/resident.py).
                # epoch_offset keeps RESUMED runs order-equivalent to an
                # uninterrupted one: the cache's shuffle is keyed on its
                # own epoch counter, so restarting it at 0 would replay
                # the permutations the crashed run already consumed.
                # shuffle_block=fuse_steps: permute WINDOWS, not batches,
                # so each fuse window's composition is epoch-stable and
                # the memoized pre-stacked windows keep hitting (see
                # _prestack_window and data/resident.py)
                train_loader = ResidentCache(
                    train_loader,
                    mesh=self.mesh,
                    shuffle_seed=self.seed,
                    epoch_offset=start_epoch,
                    shuffle_block=max(1, self.fuse_steps),
                )
            if val_loader is not None and not isinstance(val_loader, ResidentCache):
                val_loader = ResidentCache(val_loader, mesh=self.mesh)
        # histogram-parity mode (reference `models/wrapper.py:79-84`): log
        # the last batch's logits histogram + per-parameter weight AND grad
        # histograms every epoch.  Forces single-batch dispatches (grads
        # must escape the jit boundary per batch) and a device→host copy of
        # the whole gradient tree — exactly the reference's unconditional
        # throughput sink, so it stays opt-in.
        hist_on = (
            log._tb is not None and os.environ.get("PCC_TB_HISTOGRAMS") == "1"
        )
        for epoch in range(start_epoch, self.epochs):
            batch_losses = []
            timer = StepTimer()
            epoch_t0 = time.perf_counter()
            pending = []  # same-shape batches awaiting a fused dispatch
            last_aux = [None]  # (logits, grads) of the epoch's last batch
            shapes_seen = getattr(self, "_shapes_seen", set())
            self._shapes_seen = shapes_seen

            def flush():
                if not pending:
                    return
                with timer.step():
                    if hist_on and len(pending) == 1:
                        (
                            self.params,
                            self.batch_stats,
                            self.opt_state,
                            loss,
                            logits,
                            grads,
                        ) = self._train_step_debug(
                            self.params, self.batch_stats, self.opt_state, pending[0]
                        )
                        last_aux[0] = (logits, grads)
                    elif len(pending) == 1:
                        self.params, self.batch_stats, self.opt_state, loss = (
                            self._train_step(
                                self.params, self.batch_stats, self.opt_state, pending[0]
                            )
                        )
                    else:
                        # K batches → ONE scanned dispatch.  Host batches
                        # stack on the host (one H2D transfer instead of K);
                        # device-resident replays reuse a memoized
                        # pre-stacked window (_prestack_window — the in-jit
                        # tuple stack re-copied the window every flush, 9%
                        # of the flagship step), falling back to the in-jit
                        # tuple stack when memoization doesn't apply
                        if isinstance(next(iter(pending[0].values())), np.ndarray):
                            stacked = {
                                k: np.stack([b[k] for b in pending]) for k in pending[0]
                            }
                        else:
                            stacked = self._prestack_window(
                                pending, train_loader
                            )
                            if stacked is None:
                                stacked = tuple(pending)
                        self.params, self.batch_stats, self.opt_state, loss = (
                            self._train_step_fused(
                                self.params, self.batch_stats, self.opt_state, stacked
                            )
                        )
                batch_losses.append(loss)
                pending.clear()

            shape_key = _shape_key

            with maybe_trace(self.log_dir, force=False):
                for batch in self._batches(train_loader):
                    self._ensure_initialized(batch)
                    if self._train_step is None:
                        # params were assigned directly (not via
                        # fit/load): _ensure_initialized early-returns
                        # without building the step fns — same guard
                        # _eval_dispatch carries (round-5 review finding)
                        self._build_steps()
                        if self.opt_state is None:
                            self.opt_state = self._init_opt_state()
                    shapes_seen.add(shape_key(batch))
                    if pending and (
                        len(pending) >= self.fuse_steps
                        or shape_key(pending[0]) != shape_key(batch)
                    ):
                        flush()
                    pending.append(batch)
                    if self.fuse_steps <= 1 or hist_on:
                        flush()
                flush()
            if not batch_losses:
                raise ValueError(
                    "train loader produced no batches — empty dataset/split "
                    "or an over-aggressive filter"
                )
            # ONE device→host transfer per epoch: each individual float()
            # is a full host↔device round trip (hundreds of ms on remote
            # TPU transports); fused flushes contribute [K] loss rows
            epoch_loss = float(
                jnp.mean(jnp.concatenate([jnp.atleast_1d(l) for l in batch_losses]))
            )
            # measured AFTER the float() sync above, so it covers the
            # device work of every dispatched step — the per-step timer
            # only sees the async jit dispatch cost (see below)
            epoch_wall = time.perf_counter() - epoch_t0
            if not np.isfinite(epoch_loss):
                # failure detection: halt with state on disk instead of
                # training on garbage; sweep drivers catch this and log it
                # to status_log.txt like any failed configuration
                log.scalar("Loss/train", epoch_loss, epoch)
                log.close()
                state = self._state_dir()
                raise FloatingPointError(
                    f"Non-finite training loss ({epoch_loss}) at epoch "
                    f"{epoch + 1}"
                    + (f"; last good checkpoint in {state}" if state else "")
                )
            log.scalar("Loss/train", epoch_loss, epoch)
            perf = timer.summary()
            if perf["steps"]:
                # throughput from the SYNCED epoch wall time: jit calls
                # return at enqueue, so the dispatch-time sum would
                # overstate throughput ~10x on short epochs (code-review
                # finding).  p50 stays the dispatch-side percentile (its
                # historical meaning, per DISPATCH/flush); the throughput
                # rows count micro-STEPS — a fused flush is one timed
                # dispatch covering K optimizer steps, and reporting
                # flushes as steps would overstate step cost K-fold.
                # The n_steps sum below reads shape metadata only — no
                # per-loss device→host reads.
                n_steps = sum(
                    int(l.shape[0]) if getattr(l, "ndim", 0) else 1
                    for l in batch_losses
                )
                log.scalar(
                    "Throughput/steps_per_sec",
                    n_steps / max(epoch_wall, 1e-9),
                    epoch,
                )
                log.scalar("StepTime/p50_ms", perf["p50_ms"], epoch)
                log.scalar(
                    "StepTime/wall_ms_per_step",
                    1e3 * epoch_wall / n_steps,
                    epoch,
                )

            stop_early = False
            if val_loader is not None:
                val_loss, val_acc = self._evaluate(val_loader)
                log.scalar("Loss/val", val_loss, epoch)
                log.scalar("Accuracy/val", val_acc, epoch)

                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    self.early_stop_counter = 0
                    if self.checkpoint_path:
                        self._write_checkpoint(self.checkpoint_path)
                    print(f"Epoch {epoch+1}: New best model saved (val_loss={val_loss:.4f})")
                else:
                    self.early_stop_counter += 1
                    print(
                        f"Epoch {epoch+1}: No improvement "
                        f"({self.early_stop_counter}/{self.patience})"
                    )
                # the break happens AFTER histogram logging below: the
                # reference logs every EXECUTED epoch, including the one
                # that triggers early stop (models/wrapper.py:79-84)
                stop_early = self.early_stop_counter >= self.patience
            if hist_on and self.params is not None:
                # reference naming: {name}_weight / {name}_grad per
                # parameter, plus the last batch's raw "logits"
                def _named(tree, suffix):
                    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                        name = "/".join(str(getattr(p, "key", p)) for p in path)
                        yield f"{name}{suffix}", leaf

                named = list(_named(self.params, "_weight"))
                if last_aux[0] is not None:
                    logits, grads = last_aux[0]
                    named.append(("logits", logits))
                    named.extend(_named(grads, "_grad"))
                log.histograms(named, epoch)
            if stop_early:
                print("Early stopping triggered.")
                self.save_state(epoch, force=self.state_every > 0)
                break
            self.save_state(epoch)
        log.scalar("train_wall_seconds", time.time() - t0, 0)
        # bucket-explosion observability: each distinct batch shape is a
        # separate compiled program — users tune min_bucket/bucket_factor
        # against this number
        log.scalar("compile/distinct_batch_shapes", len(getattr(self, "_shapes_seen", ())), 0)
        log.close()

    def _eval_dispatch(self, loader: Iterable):
        """Dispatch eval over the loader, scan-fusing same-shape runs.

        Mirrors fit's step fusion for the no-gradient path: up to
        ``fuse_steps`` consecutive same-shape batches stack into ONE
        ``eval_step_fused`` dispatch (params don't change between eval
        steps, so fusing never alters results).  Everything is dispatched
        async before any conversion; returns ``(losses [N], probs list,
        y list, y_mask list)`` — per-BATCH host arrays (lists, because
        bucketed loaders emit mixed batch shapes).
        """
        if not self._in_fit and id(loader) != self._memo_loader_id:
            # standalone evaluate()/predict() on a NEW loader: a previous
            # run's windows are stale — release them before this loader
            # dispatches (fit's per-epoch validation skips this: its memo
            # is live).  Same-loader repeat calls (serving-style scoring
            # loops over one ResidentCache) keep their memo — clearing
            # unconditionally re-stacked every window through HBM on
            # every call (round-5 review finding)
            self._clear_window_memo()
        if not self._in_fit:
            self._memo_loader_id = id(loader)
        chunks = []  # (loss(es), probs, ys_group, masks_group) device/host
        flags = []  # fused? per chunk (kept out of the device_get pytree)
        pending = []

        def flush():
            if not pending:
                return
            group_ys = [b["y"] for b in pending]
            group_masks = [b["y_mask"] for b in pending]
            if len(pending) == 1:
                loss, probs = self._eval_step(
                    self.params, self.batch_stats, pending[0]
                )
                chunks.append((loss, probs, group_ys, group_masks))
                flags.append(False)
            else:
                if isinstance(next(iter(pending[0].values())), np.ndarray):
                    stacked = {
                        k: np.stack([b[k] for b in pending]) for k in pending[0]
                    }
                else:
                    # device-resident replays reuse the memoized
                    # pre-stacked window (see _prestack_window); fall back
                    # to the in-jit tuple stack otherwise
                    stacked = self._prestack_window(pending, loader)
                    if stacked is None:
                        stacked = tuple(pending)
                losses, probs = self._eval_step_fused(
                    self.params, self.batch_stats, stacked
                )
                chunks.append((losses, probs, group_ys, group_masks))
                flags.append(True)
            pending.clear()

        # fused eval works under a mesh too: _stack_in_jit constrains the
        # stacked [K, ...] window to the declared data-parallel shardings
        fuse = self.fuse_steps
        for batch in self._batches(loader):
            self._ensure_initialized(batch)
            if self._eval_step is None:
                # params were assigned directly (not via fit/load)
                self._build_steps()
            if pending and (
                len(pending) >= fuse or _shape_key(pending[0]) != _shape_key(batch)
            ):
                flush()
            pending.append(batch)
            if fuse <= 1:
                flush()
        flush()
        if not chunks:
            raise ValueError("eval loader produced no batches")
        # batch ALL device→host conversions into ONE transfer round — a
        # per-batch float()/asarray() costs a round trip each.  y/y_mask
        # are included: under resident/mesh pipelines they are DEVICE
        # arrays, and per-batch np.asarray reads used to issue ~2 blocking
        # transfers per val batch (code-review finding).  device_get starts
        # async copies for every leaf before gathering any of them; host
        # numpy leaves pass through untouched.
        chunks = jax.device_get(chunks)
        losses, probs_all, y_all, mask_all = [], [], [], []
        for (loss, probs, group_ys, group_masks), fused in zip(chunks, flags):
            if fused:
                losses.extend(np.asarray(loss).reshape(-1))
                probs_all.extend(np.asarray(probs))  # [K, B, 1] -> K rows
            else:
                losses.append(float(loss))
                probs_all.append(np.asarray(probs))
            y_all.extend(np.asarray(y) for y in group_ys)
            mask_all.extend(np.asarray(m).astype(bool) for m in group_masks)
        return np.asarray(losses), probs_all, y_all, mask_all

    def _evaluate(self, loader: Iterable):
        losses, probs_all, y_all, mask_all = self._eval_dispatch(loader)
        correct, total = 0.0, 0.0
        for probs, y, mask in zip(probs_all, y_all, mask_all):
            preds = probs >= 0.5
            correct += float((preds[mask, 0] == (y[mask, 0] >= 0.5)).sum())
            total += float(mask.sum())
        return float(np.mean(losses)), correct / max(total, 1.0)

    # -- inference ----------------------------------------------------------------

    def predict(self, data_loader: Iterable, return_prob: bool = False):
        _, probs_all, y_all, mask_all = self._eval_dispatch(data_loader)
        y_true, y_out = [], []
        for probs, y, mask in zip(probs_all, y_all, mask_all):
            probs = probs[mask]
            y_true.append(y[mask])
            y_out.append(probs if return_prob else (probs >= 0.5).astype(np.float32))
        return np.concatenate(y_true), np.concatenate(y_out)

    # -- persistence -----------------------------------------------------------------

    def _state_dict(self):
        """Params + batch stats as one host pytree — via a SINGLE transfer.

        Converting leaf-by-leaf costs one device→host round trip per array
        (~0.5 s each on remote transports), which made every best-checkpoint
        write during fit cost seconds.  All leaves are f32, so they pack
        into one flat device array, one copy, then reshape on host.
        """
        tree = {"params": self.params, "batch_stats": self.batch_stats}
        leaves, treedef = jax.tree.flatten(tree)
        if not leaves:
            return {"params": {}, "batch_stats": {}}
        if any(l.dtype != leaves[0].dtype for l in leaves):
            return jax.tree.map(np.asarray, tree)  # mixed dtypes: per-leaf
        flat = np.asarray(_pack_leaves(leaves))
        out, offset = [], 0
        for l in leaves:
            out.append(flat[offset : offset + l.size].reshape(l.shape))
            offset += l.size
        return jax.tree.unflatten(treedef, out)

    def _write_checkpoint(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self._state_dict(), f)

    def save(self, save_dir: str) -> None:
        self._write_checkpoint(os.path.join(save_dir, "model.pt"))

    def load(self, model_path: str) -> None:
        with open(model_path, "rb") as f:
            state = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, state["params"])
        self.batch_stats = jax.tree.map(jnp.asarray, state["batch_stats"])
        if self.mesh is not None:
            self._place_state()
        self.opt_state = self._init_opt_state()
        self._build_steps()

    def get_trainable_parameters(self) -> int:
        if self.params is None:
            return 0
        return int(sum(x.size for x in jax.tree.leaves(self.params)))
