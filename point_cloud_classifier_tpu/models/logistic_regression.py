"""L2-regularized logistic regression, JAX-native.

Interface parity with the reference's sklearn wrapper
(`models/logistic_regression.py:6-44`): ``fit(train_df, val_df)`` /
``predict(df, return_prob)`` consume pandas DataFrames with a ``label``
column, ``save(dir)`` pickles to ``model.pkl``, ``get_trainable_parameters``
counts coef+intercept.

Math parity with sklearn's defaults (LogisticRegression(): L2, C=1.0,
lbfgs, max_iter=100): minimize  Σ log(1+exp(-ŷ)) + (1/2C)·‖w‖²  with the
intercept unpenalized, solved by optax L-BFGS with zoom linesearch.  Runs on
whatever backend JAX picks — the problem is tiny, so this is CPU-ish glue,
but it keeps the framework torch/sklearn-free on the model path.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax


_SOLVER = optax.lbfgs()  # pure init/update pair — safe to share process-wide


@jax.jit
def _fit_lbfgs(Xj, yj, C, tol, max_iter):
    """Whole L-BFGS solve in ONE jitted program (round-5 review fix).

    The old per-iteration host loop dispatched one jit call plus TWO
    blocking scalar readbacks per iteration — ~0.5 s each in degraded
    windows on the tunneled TPU backend, so a tiny CPU-sized fit could
    spend minutes in transport stalls; it also re-traced `step` on every
    fit() (the loss closed over that call's arrays).  A `lax.while_loop`
    runs the identical iteration math (same stop rule: iterate while
    max|grad| >= tol and i < max_iter) with zero per-iteration host
    round-trips, and the module-level jit caches across fits by shape.

    Note on dtype: inputs arrive float64 from pandas but jnp.asarray
    yields f32 under jax's default x64-disabled config — same as the old
    path; the measured sklearn parity (Δ=0.0000, BASELINE.md) already
    covers this deviation.
    """

    def loss_fn(params):
        logits = Xj @ params["w"] + params["b"]
        ll = jnp.sum(optax.sigmoid_binary_cross_entropy(logits, yj))
        return ll + 0.5 / C * jnp.sum(params["w"] ** 2)

    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def body(carry):
        params, opt_state, _, i = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = _SOLVER.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        gnorm = jnp.maximum(jnp.max(jnp.abs(grad["w"])), jnp.abs(grad["b"]))
        return params, opt_state, gnorm, i + 1

    def cond(carry):
        _, _, gnorm, i = carry
        return (i < max_iter) & (gnorm >= tol)

    params = {"w": jnp.zeros(Xj.shape[1]), "b": jnp.array(0.0)}
    params, _, _, _ = jax.lax.while_loop(
        cond, body, (params, _SOLVER.init(params), jnp.inf, jnp.int32(0))
    )
    return params


class LogRegression:
    def __init__(self, C: float = 1.0, max_iter: int = 100, tol: float = 1e-4):
        self.C = C
        self.max_iter = max_iter
        self.tol = tol
        self.coef_: np.ndarray = None
        self.intercept_: np.ndarray = None

    @staticmethod
    def _split_xy(df):
        X = df.drop(columns=["label"]).to_numpy(dtype=np.float64)
        y = df["label"].to_numpy(dtype=np.float64)
        return X, y

    def fit(self, train_loader, val_loader=None) -> "LogRegression":
        X, y = self._split_xy(train_loader)
        params = _fit_lbfgs(
            jnp.asarray(X),
            jnp.asarray(y),
            jnp.asarray(self.C, jnp.float32),
            jnp.asarray(self.tol, jnp.float32),
            jnp.asarray(self.max_iter, jnp.int32),
        )
        self.coef_ = np.asarray(params["w"]).reshape(1, -1)
        self.intercept_ = np.asarray(params["b"]).reshape(1)
        return self

    def _decision(self, X: np.ndarray) -> np.ndarray:
        return X @ self.coef_[0] + self.intercept_[0]

    def predict(self, data_loader, return_prob: bool = False):
        X, y_true = self._split_xy(data_loader)
        scores = self._decision(X)
        if return_prob:
            return y_true, 1.0 / (1.0 + np.exp(-scores))
        return y_true, (scores >= 0.0).astype(np.float64)

    def save(self, save_dir: str) -> None:
        path = os.path.join(save_dir, "model.pkl")
        with open(path, "wb") as f:
            pickle.dump({"coef_": self.coef_, "intercept_": self.intercept_, "C": self.C}, f)
        print(f"Model saved to {path}")

    def load(self, model_path: str) -> "LogRegression":
        with open(model_path, "rb") as f:
            state = pickle.load(f)
        if isinstance(state, dict):
            self.coef_ = state["coef_"]
            self.intercept_ = state["intercept_"]
            self.C = state.get("C", 1.0)
        else:
            # a reference model.pkl: the pickled sklearn LogisticRegression
            # estimator itself (`models/logistic_regression.py:11-16`).
            # Its decision function is the same affine form, so the fitted
            # coefficients drop straight in — reference runs load natively
            self.coef_ = np.asarray(state.coef_, dtype=np.float64)
            self.intercept_ = np.asarray(state.intercept_, dtype=np.float64)
            self.C = float(getattr(state, "C", 1.0))
        return self

    def get_trainable_parameters(self) -> int:
        if self.coef_ is None:
            raise ValueError(
                "Model has not been fitted yet. Fit the model before counting parameters."
            )
        return self.coef_.size + self.intercept_.size
