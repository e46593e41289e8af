"""Active-learning fit journey — the reference's headline UX, batch-safe.

Reference: ``deduplipy/active_learning/active_learning.py`` drives an
interactive console loop (y/n/p/s/f prompts, ``:68-95``) around modAL
uncertainty sampling with a sklearn ``StandardScaler -> LogisticRegression
(class_weight='balanced')`` pipeline (``classifier_pipeline.py:21-52``),
pre-taught on synthetic perfect matches (``active_learning.py:125-141``),
with convergence monitoring (uncertainty < 0.1 OR max improvement over the
last 5 queries < 0.01 after >= 10 labels — ``active_learning.py:53-66,
174-181``; constants ``config.py:3,6-9``).

This module reproduces that journey with a PROGRAMMATIC labeler (any
callable ``(record_1: dict, record_2: dict) -> 'y'|'n'|'s'|'f'``) so the fit
path is testable and automatable; passing ``labeler=None`` falls back to the
reference's console prompts verbatim. Differences, both deliberate:

- modAL/sklearn are absent in this environment, so the estimator is a
  ~40-line numpy IRLS logistic regression with standardization and balanced
  class weights — same semantics (single-class fit is a no-op, matching
  ``classifier_pipeline.py:47-52``), deterministic.
- With a programmatic labeler, convergence AUTO-finishes the loop (the
  reference prints "enter 'f' to stop" and waits for a human;
  a callable has no console to read).

The learned model exports plain (mean, std, coef, intercept) so scoring runs
JVM-side as a Column expression over the `similarities` array — the trained
scorer never needs Python at predict scale (see ``score_expr``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# reference deduplipy/config.py:3,6-9
N_QUERIES = 999
MIN_NR_ENTRIES = 10
UNCERTAINTY_IMPROVEMENT_THRESHOLD = 0.01
UNCERTAINTY_THRESHOLD = 0.1


def input_assert(value: str, choices: list[str]) -> str:
    """Validator for labeler/console responses (re-derivation of
    ``utils_active_learning.py:4-20``): lowercases and enforces membership.
    Console mode re-prompts; programmatic mode raises (a callable returning
    garbage would loop forever)."""
    out = value.lower()
    if out not in choices:
        raise ValueError(
            f"Wrong input! Your input should be one of the following: "
            f"{', '.join(choices)}"
        )
    return out


def _console_labeler(rec_1: dict, rec_2: dict) -> str:
    """The reference's interactive prompt (active_learning.py:68-95),
    minus 'p' (previous) which needs loop state and stays in the loop."""
    print("Is this a match? (y)es, (n)o, (s)kip, (f)inish")
    print("->", rec_1)
    print("->", rec_2)
    while True:
        try:
            return input_assert(input(""), ["y", "n", "s", "f"])
        except ValueError as e:
            print(e)


class NumpyLogit:
    """StandardScaler + balanced logistic regression, numpy-only.

    IRLS (Newton) with a small L2 ridge for conditioning — deterministic,
    adequate for the <=10k x few-features active-learning sample. Mirrors
    the reference ClassifierPipeline's no-op fit on single-class y
    (classifier_pipeline.py:47-52)."""

    def __init__(self, l2: float = 1.0, max_iter: int = 50, tol: float = 1e-8):
        self.l2 = l2
        self.max_iter = max_iter
        self.tol = tol
        self.mean_: np.ndarray | None = None
        self.std_: np.ndarray | None = None
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0
        self.fitted = False

    def fit(self, X: np.ndarray, y: np.ndarray) -> "NumpyLogit":
        X = np.asarray(X, dtype=float)
        y = np.asarray(y, dtype=float)
        if len(set(y.tolist())) == 1:
            return self                     # single-class: no-op fit
        self.mean_ = X.mean(axis=0)
        self.std_ = X.std(axis=0)
        self.std_[self.std_ == 0] = 1.0
        Z = (X - self.mean_) / self.std_
        n, d = Z.shape
        # class_weight='balanced': w_c = n / (k * n_c)
        pos = y.sum()
        w = np.where(y == 1, n / (2.0 * pos), n / (2.0 * (n - pos)))
        Zb = np.hstack([Z, np.ones((n, 1))])
        beta = np.zeros(d + 1)
        ridge = np.eye(d + 1) * self.l2
        ridge[d, d] = 0.0                   # don't penalize the intercept
        for _ in range(self.max_iter):
            p = 1.0 / (1.0 + np.exp(-Zb @ beta))
            g = Zb.T @ (w * (y - p)) - ridge @ beta
            s = np.maximum(w * p * (1 - p), 1e-10)
            H = (Zb * s[:, None]).T @ Zb + ridge
            step = np.linalg.solve(H, g)
            beta += step
            if np.abs(step).max() < self.tol:
                break
        self.coef_ = beta[:d]
        self.intercept_ = float(beta[d])
        self.fitted = True
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        if not self.fitted:
            raise RuntimeError("fit() with two classes first")
        Z = (np.asarray(X, dtype=float) - self.mean_) / self.std_
        p1 = 1.0 / (1.0 + np.exp(-(Z @ self.coef_ + self.intercept_)))
        return np.stack([1 - p1, p1], axis=1)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X)[:, 1] >= 0.5).astype(int)

    def params(self) -> dict:
        return {
            "mean": self.mean_.tolist(),
            "std": self.std_.tolist(),
            "coef": self.coef_.tolist(),
            "intercept": self.intercept_,
        }

    @classmethod
    def from_params(cls, p: dict) -> "NumpyLogit":
        m = cls()
        m.mean_ = np.asarray(p["mean"], dtype=float)
        m.std_ = np.asarray(p["std"], dtype=float)
        m.coef_ = np.asarray(p["coef"], dtype=float)
        m.intercept_ = float(p["intercept"])
        m.fitted = True
        return m


def score_expr(params: dict, sim_col: str = "similarities") -> Column:
    """sigmoid(intercept + sum_i coef_i * (sim[i]-mean_i)/std_i) as a pure
    Column expression — the learned scorer runs inside codegen, no UDF."""
    coef, mean, std = params["coef"], params["mean"], params["std"]
    z = F.lit(float(params["intercept"]))
    for i, (c, m, s) in enumerate(zip(coef, mean, std)):
        z = z + F.lit(float(c)) * (
            (F.element_at(F.col(sim_col), i + 1) - F.lit(float(m))) / F.lit(float(s))
        )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


class ActivePairLearner:
    """Uncertainty-sampling labeling loop over a collected pair sample.

    fit() input: pandas DataFrame with `{col}_1`/`{col}_2` per col,
    `similarities` (list of metric values) and `synthetic_perfect_match`
    (bool) — the same table the reference feeds modAL
    (deduplicator.py:135-137)."""

    def __init__(self, col_names: list[str], labeler=None,
                 uncertainty_threshold: float = UNCERTAINTY_THRESHOLD,
                 uncertainty_improvement_threshold: float = UNCERTAINTY_IMPROVEMENT_THRESHOLD,
                 min_nr_entries: int = MIN_NR_ENTRIES,
                 n_queries: int = N_QUERIES, verbose: int = 0) -> None:
        self.col_names = col_names
        self.labeler = labeler or _console_labeler
        self.auto_finish = labeler is not None
        self.uncertainty_threshold = uncertainty_threshold
        self.uncertainty_improvement_threshold = uncertainty_improvement_threshold
        self.min_nr_entries = min_nr_entries
        self.n_queries = n_queries
        self.verbose = verbose
        self.model = NumpyLogit()
        self.uncertainties: list[float] = []
        self.counter_total = 0
        self.counter_positive = 0
        self.counter_negative = 0
        self._X: list[list[float]] = []
        self._y: list[int] = []

    # reference active_learning.py:53-66
    def _last_uncertainty_improvement(self, last_n: int = 5) -> float | None:
        u = np.asarray(self.uncertainties)
        if len(u) >= last_n + 1:
            return float(np.abs(u[1:] - u[:-1])[-last_n:].max())
        return None

    def _teach(self, sims: list[float], label: int) -> None:
        self._X.append(list(sims))
        self._y.append(int(label))
        self.model.fit(np.asarray(self._X), np.asarray(self._y))

    def fit(self, pairs: pd.DataFrame) -> "ActivePairLearner":
        pairs = pairs.reset_index(drop=True)
        # synthetic-perfect pretraining (active_learning.py:125-141)
        synth = pairs[pairs["synthetic_perfect_match"]]
        for sims in synth["similarities"]:
            self._X.append(list(sims))
            self._y.append(1)
        if len(self._X):
            self.model.fit(np.asarray(self._X), np.asarray(self._y))
        X = pairs[~pairs["synthetic_perfect_match"]].reset_index(drop=True)
        sim_matrix = np.asarray(X["similarities"].tolist(), dtype=float)
        remaining = list(range(len(X)))
        cols_1 = [f"{c}_1" for c in self.col_names]
        cols_2 = [f"{c}_2" for c in self.col_names]
        for _ in range(self.n_queries):
            if not remaining:
                break
            # uncertainty sampling: most uncertain = proba closest to 0.5;
            # before the model has both classes, take the first candidate
            # (modAL's strategy also starts effectively arbitrary)
            if self.model.fitted:
                p = self.model.predict_proba(sim_matrix[remaining])[:, 1]
                qpos = int(np.argmin(np.abs(p - 0.5)))
                uncertainty = 1.0 - max(p[qpos], 1 - p[qpos])
                self.uncertainties.append(float(uncertainty))
            else:
                qpos, uncertainty = 0, None
            qidx = remaining[qpos]
            row = X.iloc[qidx]
            rec_1 = dict(zip(self.col_names, row[cols_1].tolist()))
            rec_2 = dict(zip(self.col_names, row[cols_2].tolist()))
            answer = input_assert(
                str(self.labeler(rec_1, rec_2)), ["y", "n", "s", "f", "1", "0"]
            )
            if answer == "f":
                break
            remaining.pop(qpos)
            if answer != "s":
                label = 1 if answer in ("y", "1") else 0
                self._teach(list(row["similarities"]), label)
                if label == 1:
                    self.counter_positive += 1
                else:
                    self.counter_negative += 1
            self.counter_total += 1
            # convergence monitor (active_learning.py:174-181)
            imp = self._last_uncertainty_improvement()
            if (self.counter_total >= self.min_nr_entries and imp is not None
                    and uncertainty is not None):
                converged = (uncertainty < self.uncertainty_threshold) or (
                    imp < self.uncertainty_improvement_threshold
                )
                if converged:
                    if self.verbose:
                        print(f"Classifier converged (uncertainty "
                              f"{uncertainty:.3f}, improvement {imp:.3f})")
                    if self.auto_finish:
                        break
        return self

    def predict(self, sims) -> np.ndarray:
        return self.model.predict(np.asarray(list(sims), dtype=float))

    def predict_proba(self, sims) -> np.ndarray:
        return self.model.predict_proba(np.asarray(list(sims), dtype=float))
