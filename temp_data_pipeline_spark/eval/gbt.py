"""Pure-numpy gradient-boosted regression trees (xgboost fallback).

The reference (src/tempdata/eval/models.py:177-259) trains
`xgb.XGBRegressor(objective="reg:squarederror", n_estimators=100,
learning_rate=0.1, max_depth=3, early_stopping_rounds=10)` on a small
collected train frame. xgboost is not installed in this container, so
this module re-implements the same second-order boosting recipe in
numpy so the `type: "xgboost"` factory path still trains and scores:

- squared-error objective → per-round gradients g = pred − y, h = 1;
- exact greedy splits with xgboost's gain
  0.5·(G_L²/(H_L+λ) + G_R²/(H_R+λ) − G²/(H+λ)) − γ and leaf weight
  −G/(H+λ) (λ = reg_lambda, γ = gamma — xgboost defaults 1.0 / 0.0);
- sparsity-aware splits: NaN rows are routed to whichever child gives
  the higher gain, and that learned default direction is stored per
  node (xgboost's missing-value handling);
- early stopping on the last eval set's RMSE with patience
  `early_stopping_rounds`, keeping the best iteration — mirroring
  XGBRegressor.fit(eval_set=...).

This is NOT bit-identical to xgboost (no histogram binning, no
column/row subsampling) but follows the same algorithm; on the small
(thousands of rows) train sets the eval framework uses, accuracy is
comparable. Train is driver-side (like the reference, which collects
to pandas regardless); scoring is vectorized numpy suitable for an
Arrow-batched pandas UDF with the fitted trees broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class _Node:
    feature: int = -1  # -1 → leaf
    threshold: float = 0.0
    default_left: bool = True  # NaN routing
    left: int = -1
    right: int = -1
    value: float = 0.0  # leaf weight (already learning-rate free)


@dataclass
class _Tree:
    nodes: list[_Node] = field(default_factory=list)

    def predict(self, x: np.ndarray) -> np.ndarray:
        """Vectorized traversal: x is (n, p) possibly containing NaN."""
        n = x.shape[0]
        idx = np.zeros(n, dtype=np.int64)
        out = np.zeros(n, dtype=np.float64)
        active = np.arange(n)
        while active.size:
            node_ids = idx[active]
            leaf_mask = np.array([self.nodes[i].feature < 0 for i in node_ids])
            leaves = active[leaf_mask]
            if leaves.size:
                out[leaves] = np.array([self.nodes[i].value for i in idx[leaves]])
            active = active[~leaf_mask]
            if not active.size:
                break
            node_ids = idx[active]
            feats = np.array([self.nodes[i].feature for i in node_ids])
            thrs = np.array([self.nodes[i].threshold for i in node_ids])
            defl = np.array([self.nodes[i].default_left for i in node_ids])
            vals = x[active, feats]
            isnan = np.isnan(vals)
            go_left = np.where(isnan, defl, vals < thrs)
            lefts = np.array([self.nodes[i].left for i in node_ids])
            rights = np.array([self.nodes[i].right for i in node_ids])
            idx[active] = np.where(go_left, lefts, rights)
        return out


def _build_tree(
    x: np.ndarray,
    g: np.ndarray,
    h: np.ndarray,
    max_depth: int,
    reg_lambda: float,
    gamma: float,
    min_child_weight: float,
) -> _Tree:
    tree = _Tree()

    def leaf(rows: np.ndarray) -> int:
        w = -g[rows].sum() / (h[rows].sum() + reg_lambda)
        tree.nodes.append(_Node(value=float(w)))
        return len(tree.nodes) - 1

    def best_split(rows: np.ndarray):
        G, H = g[rows].sum(), h[rows].sum()
        parent = G * G / (H + reg_lambda)
        best = (0.0, -1, 0.0, True)  # gain, feature, threshold, default_left
        for f in range(x.shape[1]):
            col = x[rows, f]
            nan_mask = np.isnan(col)
            Gm, Hm = g[rows][nan_mask].sum(), h[rows][nan_mask].sum()
            fin = ~nan_mask
            if fin.sum() < 2:
                continue
            vals = col[fin]
            gs, hs = g[rows][fin], h[rows][fin]
            order = np.argsort(vals, kind="mergesort")
            sv, sg, sh = vals[order], gs[order], hs[order]
            cg, ch = np.cumsum(sg), np.cumsum(sh)
            # split between distinct values only
            cut = np.nonzero(sv[1:] > sv[:-1])[0]
            if not cut.size:
                continue
            GLf, HLf = cg[cut], ch[cut]  # finite-left sums at each cut
            GRf, HRf = (cg[-1] - GLf), (ch[-1] - HLf)
            thr = (sv[cut] + sv[cut + 1]) / 2.0
            # try NaN → left and NaN → right (sparsity-aware)
            for default_left in (True, False):
                GL = GLf + (Gm if default_left else 0.0)
                HL = HLf + (Hm if default_left else 0.0)
                GR = GRf + (0.0 if default_left else Gm)
                HR = HRf + (0.0 if default_left else Hm)
                ok = (HL >= min_child_weight) & (HR >= min_child_weight)
                if not ok.any():
                    continue
                gain = 0.5 * (
                    GL**2 / (HL + reg_lambda) + GR**2 / (HR + reg_lambda) - parent
                ) - gamma
                gain = np.where(ok, gain, -np.inf)
                k = int(np.argmax(gain))
                if gain[k] > best[0]:
                    best = (float(gain[k]), f, float(thr[k]), default_left)
        return best

    def grow(rows: np.ndarray, depth: int) -> int:
        if depth >= max_depth or rows.size < 2:
            return leaf(rows)
        gain, f, thr, default_left = best_split(rows)
        if f < 0 or gain <= 0.0:
            return leaf(rows)
        col = x[rows, f]
        nan_mask = np.isnan(col)
        go_left = np.where(nan_mask, default_left, col < thr)
        node_id = len(tree.nodes)
        tree.nodes.append(_Node(feature=f, threshold=thr, default_left=default_left))
        tree.nodes[node_id].left = grow(rows[go_left], depth + 1)
        tree.nodes[node_id].right = grow(rows[~go_left], depth + 1)
        return node_id

    grow(np.arange(x.shape[0]), 0)
    return tree


class NumpyGBTRegressor:
    """Drop-in subset of `xgb.XGBRegressor` for reg:squarederror.

    Supported params (xgboost names): n_estimators, learning_rate,
    max_depth, reg_lambda, gamma, min_child_weight,
    early_stopping_rounds, base_score. Others are accepted and
    ignored so reference configs load unchanged.
    """

    def __init__(self, **params) -> None:
        self.n_estimators = int(params.get("n_estimators", 100))
        self.learning_rate = float(params.get("learning_rate", 0.1))
        self.max_depth = int(params.get("max_depth", 3))
        self.reg_lambda = float(params.get("reg_lambda", 1.0))
        self.gamma = float(params.get("gamma", 0.0))
        self.min_child_weight = float(params.get("min_child_weight", 1.0))
        self.early_stopping_rounds = params.get("early_stopping_rounds")
        self.base_score = params.get("base_score")  # None → mean(y), like xgboost>=2
        self.trees_: list[_Tree] = []
        self.best_iteration_: int | None = None

    def fit(
        self,
        X: np.ndarray,
        y: np.ndarray,
        eval_set: list[tuple[np.ndarray, np.ndarray]] | None = None,
    ) -> "NumpyGBTRegressor":
        x = np.asarray(X, dtype=np.float64)
        yv = np.asarray(y, dtype=np.float64)
        base = float(np.mean(yv)) if self.base_score is None else float(self.base_score)
        self.base_score_ = base
        pred = np.full(x.shape[0], base)
        self.trees_ = []

        ev = None
        if eval_set:
            ex, ey = eval_set[-1]  # xgboost early-stops on the LAST eval set
            ex = np.asarray(ex, dtype=np.float64)
            ey = np.asarray(ey, dtype=np.float64)
            ev_pred = np.full(ex.shape[0], base)
            best_rmse, best_round, stale = np.inf, 0, 0
            ev = True

        for rnd in range(self.n_estimators):
            g = pred - yv  # d/dpred 0.5(pred-y)^2
            h = np.ones_like(g)
            tree = _build_tree(
                x, g, h, self.max_depth, self.reg_lambda, self.gamma,
                self.min_child_weight,
            )
            self.trees_.append(tree)
            pred += self.learning_rate * tree.predict(x)
            if ev:
                ev_pred += self.learning_rate * tree.predict(ex)
                rmse = float(np.sqrt(np.mean((ev_pred - ey) ** 2)))
                if rmse < best_rmse - 1e-12:
                    best_rmse, best_round, stale = rmse, rnd, 0
                else:
                    stale += 1
                    if (
                        self.early_stopping_rounds
                        and stale >= self.early_stopping_rounds
                    ):
                        break
        if ev:
            self.best_iteration_ = best_round
            self.trees_ = self.trees_[: best_round + 1]
        else:
            self.best_iteration_ = len(self.trees_) - 1
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        x = np.asarray(X, dtype=np.float64)
        out = np.full(x.shape[0], self.base_score_)
        for tree in self.trees_:
            out += self.learning_rate * tree.predict(x)
        return out
