"""Forecaster models, Spark-first (reference eval/models.py).

The reference's extension point is a Python Protocol `Forecaster`
(`models.py:24-48`): fit on a train frame, produce per-row mu. Here
`predict_mu(df)` returns `df` with a `y_pred_f` column appended — the
Spark-native equivalent of an aligned ndarray.

Scale posture per model:
- Passthrough / Persistence: pure column expressions — zero shuffles,
  zero driver data.
- Ridge: closed-form normal equations. The Gram matrix X'X and moment
  vector X'y are computed DISTRIBUTEDLY via one aggregation pass
  (p² + p sums — p=5 default, 20 numbers collected), solved on the
  driver with numpy, scored as a column expression. Exactly
  reproduces sklearn `Ridge(alpha)` (centered, unpenalized
  intercept) without sklearn and without collecting the train set —
  this is the 100 TB-safe formulation.
- kNN: the reference caps k at n_train and fits on ~5k rows — the
  train matrix is broadcast and scoring is an Arrow-batched pandas
  UDF (brute-force per batch).
- XGBoost: real xgboost when importable, else the pure-numpy boosted
  trees in eval/gbt.py (same recipe and defaults); train collects the
  small frame like kNN, scoring is a broadcast + Arrow pandas UDF.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from temp_data_pipeline_spark.eval.config import ModelConfig


@runtime_checkable
class Forecaster(Protocol):
    def fit(self, df_train: DataFrame) -> None: ...

    def predict_mu(self, df: DataFrame) -> DataFrame: ...


class PassthroughForecaster:
    """y_pred = raw forecast column (reference models.py:51-79)."""

    def __init__(self, pred_col: str = "tmax_pred_f") -> None:
        self.pred_col = pred_col

    def fit(self, df_train: DataFrame) -> None:
        pass

    def predict_mu(self, df: DataFrame) -> DataFrame:
        return df.withColumn("y_pred_f", F.col(self.pred_col).cast("double"))


class PersistenceForecaster:
    """y_pred = yesterday's actual, NaN→0.0 (reference models.py:293-335)."""

    def __init__(self, lag_col: str = "tmax_actual_f_lag1") -> None:
        self.lag_col = lag_col

    def fit(self, df_train: DataFrame) -> None:
        pass

    def predict_mu(self, df: DataFrame) -> DataFrame:
        if self.lag_col not in df.columns:
            raise ValueError(f"Persistence requires {self.lag_col} column")
        return df.withColumn(
            "y_pred_f", F.coalesce(F.col(self.lag_col), F.lit(0.0)).cast("double")
        )


class RidgeForecaster:
    """Closed-form ridge regression (reference models.py:82-174).

    sklearn `Ridge(alpha)` centers X and y, penalizes only the
    coefficients, and solves (Xc'Xc + αI) w = Xc'y. We build Xc'Xc
    from raw second moments: Σxᵢxⱼ − n·μᵢ·μⱼ, aggregated in ONE Spark
    pass. Missing features are zero-filled before the moments
    (reference handle_missing="fill_zero").
    """

    DEFAULT_FEATURES = ["tmax_pred_f", "sin_doy", "cos_doy", "bias_7d", "bias_14d"]

    def __init__(self, alpha: float = 1.0, features: list[str] | None = None) -> None:
        self.alpha = alpha
        self.features = features or list(self.DEFAULT_FEATURES)
        self.coef_: np.ndarray | None = None
        self.intercept_: float | None = None

    def _feat_cols(self, df: DataFrame) -> list[str]:
        avail = [f for f in self.features if f in df.columns]
        if not avail:
            raise ValueError(
                f"No features found. Expected: {self.features}, got: {df.columns}"
            )
        return avail

    def fit(self, df_train: DataFrame, label_col: str = "tmax_actual_f") -> None:
        feats = self._feat_cols(df_train)
        x = [F.coalesce(F.col(f).cast("double"), F.lit(0.0)) for f in feats]
        y = F.col(label_col).cast("double")
        p = len(feats)

        aggs = [F.count(F.lit(1)).alias("n"), F.sum(y).alias("sy")]
        for i in range(p):
            aggs.append(F.sum(x[i]).alias(f"sx{i}"))
            aggs.append(F.sum(x[i] * y).alias(f"sxy{i}"))
            for j in range(i, p):
                aggs.append(F.sum(x[i] * x[j]).alias(f"sxx{i}_{j}"))
        row = df_train.agg(*aggs).first()  # one distributed pass, tiny collect

        n = row["n"]
        if n == 0:
            raise ValueError("Empty training set")
        mx = np.array([row[f"sx{i}"] / n for i in range(p)])
        my = row["sy"] / n
        gram = np.zeros((p, p))
        xty = np.zeros(p)
        for i in range(p):
            xty[i] = row[f"sxy{i}"] - n * mx[i] * my
            for j in range(i, p):
                gram[i, j] = gram[j, i] = row[f"sxx{i}_{j}"] - n * mx[i] * mx[j]
        w = np.linalg.solve(gram + self.alpha * np.eye(p), xty)
        self.coef_ = w
        self.intercept_ = float(my - mx @ w)
        self._fit_feats = feats

    def predict_mu(self, df: DataFrame) -> DataFrame:
        if self.coef_ is None:
            raise RuntimeError("Model not fitted. Call fit() first.")
        feats = self._feat_cols(df)
        expr = F.lit(self.intercept_)
        for f, c in zip(feats, self.coef_):
            expr = expr + F.lit(float(c)) * F.coalesce(F.col(f).cast("double"), F.lit(0.0))
        return df.withColumn("y_pred_f", expr)


class KNNForecaster:
    """Brute-force k-nearest-neighbors (reference models.py:338-380).

    Train matrix collected to the driver (the reference fits sklearn on
    the same collected set — train is thousands of rows) and broadcast;
    scoring is an Arrow-batched pandas UDF, Euclidean metric, uniform
    mean of the k nearest — matching sklearn KNeighborsRegressor
    defaults. k is capped at n_train.
    """

    DEFAULT_FEATURES = ["tmax_pred_f", "lead_hours", "sin_doy", "cos_doy"]

    def __init__(self, n_neighbors: int = 50, features: list[str] | None = None) -> None:
        self.n_neighbors = n_neighbors
        self.features = features or list(self.DEFAULT_FEATURES)
        self._train_x: np.ndarray | None = None
        self._train_y: np.ndarray | None = None

    def fit(self, df_train: DataFrame, label_col: str = "tmax_actual_f") -> None:
        feats = [f for f in self.features if f in df_train.columns]
        if not feats:
            raise ValueError(f"No features found. Expected: {self.features}")
        pdf = (
            df_train.select(
                *[F.coalesce(F.col(f).cast("double"), F.lit(0.0)).alias(f) for f in feats],
                F.col(label_col).cast("double").alias("_y"),
            )
            .toPandas()
        )
        self._fit_feats = feats
        self._train_x = pdf[feats].to_numpy()
        self._train_y = pdf["_y"].to_numpy()

    def predict_mu(self, df: DataFrame) -> DataFrame:
        if self._train_x is None:
            raise RuntimeError("Model not fitted. Call fit() first.")
        feats = self._fit_feats
        k = min(self.n_neighbors, len(self._train_y))
        spark = df.sparkSession
        bx = spark.sparkContext.broadcast(self._train_x)
        by = spark.sparkContext.broadcast(self._train_y)

        @F.pandas_udf(DoubleType())
        def knn_mu(*cols):
            import pandas as pd

            tx, ty = bx.value, by.value
            q = np.column_stack([c.fillna(0.0).to_numpy(dtype=float) for c in cols])
            # (batch, train) distance matrix; batches are Arrow-sized
            d2 = ((q[:, None, :] - tx[None, :, :]) ** 2).sum(axis=2)
            idx = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
            return pd.Series(ty[idx].mean(axis=1))

        return df.withColumn("y_pred_f", knn_mu(*[F.col(f) for f in feats]))


class XGBoostForecaster:
    """Gradient-boosted trees (reference models.py:177-259).

    Uses the real `xgboost.XGBRegressor` when the package is
    importable; otherwise falls back to the pure-numpy
    `NumpyGBTRegressor` (eval/gbt.py) which implements the same
    second-order boosting recipe (gain/leaf-weight formulas, NaN
    default-direction, early stopping on the last eval set) with the
    reference's defaults: objective reg:squarederror, n_estimators=100,
    learning_rate=0.1, max_depth=3, early_stopping_rounds=10.

    Spark posture mirrors KNNForecaster: the train frame is small
    (the reference collects it to pandas regardless), so fit() is a
    bounded driver-side collect; scoring broadcasts the fitted trees
    and runs an Arrow-batched pandas UDF — no per-row Python, no
    driver loop over the scored frame.
    """

    DEFAULT_FEATURES = [
        "tmax_pred_f", "sin_doy", "cos_doy", "bias_7d", "bias_14d", "lead_hours",
    ]
    DEFAULT_PARAMS = {
        "objective": "reg:squarederror",
        "n_estimators": 100,
        "learning_rate": 0.1,
        "max_depth": 3,
        "early_stopping_rounds": 10,
    }

    def __init__(
        self,
        features: list[str] | None = None,
        hyperparams: dict | None = None,
        **kw,
    ) -> None:
        self.features = features or list(self.DEFAULT_FEATURES)
        self.params = dict(self.DEFAULT_PARAMS)
        if hyperparams:
            self.params.update(hyperparams)
        self.params.update(kw)
        try:
            import xgboost as xgb

            self.model = xgb.XGBRegressor(**self.params)
            self._backend = "xgboost"
        except ImportError:
            from temp_data_pipeline_spark.eval.gbt import NumpyGBTRegressor

            self.model = NumpyGBTRegressor(**self.params)
            self._backend = "numpy"
        self._fit_feats: list[str] | None = None

    def _collect_xy(self, df: DataFrame, feats: list[str], label_col: str):
        pdf = df.select(
            *[F.col(f).cast("double").alias(f) for f in feats],
            F.col(label_col).cast("double").alias("_y"),
        ).toPandas()
        return pdf[feats].to_numpy(), pdf["_y"].to_numpy()

    def fit(
        self,
        df_train: DataFrame,
        label_col: str = "tmax_actual_f",
        eval_set: list[DataFrame] | None = None,
    ) -> None:
        feats = [f for f in self.features if f in df_train.columns]
        if not feats:
            raise ValueError(
                f"No features found. Expected: {self.features}, got: {df_train.columns}"
            )
        self._fit_feats = feats
        x, y = self._collect_xy(df_train, feats, label_col)
        ev = None
        if eval_set:
            ev = [self._collect_xy(d, feats, label_col) for d in eval_set]
        if ev is None and self._backend == "xgboost":
            # XGBRegressor requires an eval_set when early stopping is on
            self.model.set_params(early_stopping_rounds=None)
            self.model.fit(x, y)
        else:
            self.model.fit(x, y, eval_set=ev)

    def predict_mu(self, df: DataFrame) -> DataFrame:
        if self._fit_feats is None:
            raise RuntimeError("Model not fitted. Call fit() first.")
        feats = self._fit_feats
        spark = df.sparkSession
        bmodel = spark.sparkContext.broadcast(self.model)

        @F.pandas_udf(DoubleType())
        def gbt_mu(*cols):
            import pandas as pd

            q = np.column_stack([c.to_numpy(dtype=float) for c in cols])
            return pd.Series(bmodel.value.predict(q))

        return df.withColumn("y_pred_f", gbt_mu(*[F.col(f) for f in feats]))


def create_forecaster(cfg: ModelConfig) -> Forecaster:
    """Factory (reference models.py:262-290)."""
    if cfg.type == "passthrough":
        return PassthroughForecaster()
    if cfg.type == "persistence":
        return PersistenceForecaster()
    if cfg.type == "ridge":
        return RidgeForecaster(alpha=cfg.alpha, features=cfg.features)
    if cfg.type == "knn":
        return KNNForecaster(n_neighbors=cfg.n_neighbors, features=cfg.features)
    if cfg.type == "xgboost":
        return XGBoostForecaster(features=cfg.features, hyperparams=cfg.hyperparams)
    raise ValueError(f"Unknown forecaster type: {cfg.type}")
