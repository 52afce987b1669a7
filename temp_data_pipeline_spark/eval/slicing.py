"""Sliced metrics in ONE shuffle via GROUPING SETS (reference eval/slicing.py).

The reference runs 4 sequential pandas passes (month, season, lead
bucket, temp regime, `slicing.py:22-53`). Here the four slice keys are
derived columns and a single GROUPING SETS aggregation computes every
slice in one shuffle — the §4 physical-design win. Temperature-regime
cut points (q25/q75 of y_true_f) are exact interpolated percentiles
(`percentile`, matching np.percentile) computed in a prior cheap agg.

Slices with <10 rows are dropped (`slicing.py:72,100,129,152`), and
output labels/dict shape match the reference byte-for-byte so run
artifacts stay comparable.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.eval.metrics import (
    _metrics_from_row,
    forecast_metric_aggs,
)

SEASON_OF_MONTH = {
    12: "DJF", 1: "DJF", 2: "DJF",
    3: "MAM", 4: "MAM", 5: "MAM",
    6: "JJA", 7: "JJA", 8: "JJA",
    9: "SON", 10: "SON", 11: "SON",
}
LEAD_BUCKETS = [(0, 24), (24, 48), (48, 72), (72, 120)]
MIN_SLICE_ROWS = 10


def _season_expr():
    expr = F.lit(None).cast("string")
    for m, s in SEASON_OF_MONTH.items():
        expr = F.when(F.col("month") == m, F.lit(s)).otherwise(expr)
    return expr


def _lead_bucket_expr():
    expr = F.lit(None).cast("string")
    for lo, hi in LEAD_BUCKETS:
        expr = F.when(
            (F.col("lead_hours") >= lo) & (F.col("lead_hours") < hi),
            F.lit(f"{lo}-{hi}h"),
        ).otherwise(expr)
    return expr


def _regime_exprs(q25: float, q75: float):
    y = F.col("y_true_f")
    label = (
        F.when(y < q25, F.lit(f"cold (<{q25:.0f}°F)"))
        .when(y > q75, F.lit(f"hot (>{q75:.0f}°F)"))
        .otherwise(F.lit(f"normal ({q25:.0f}-{q75:.0f}°F)"))
    )
    return label


def compute_metrics_by_slice(
    predictions_df: DataFrame, exact_percentile: bool = True
) -> dict[str, dict[str, Any]]:
    """All four slice families in one GROUPING SETS pass.

    exact_percentile=True (default) reproduces the reference's
    np.percentile cut points exactly; False switches the regime cuts
    to the bounded-memory sketch (operators/quantiles.py) for
    100 TB-scale prediction frames — regime labels then shift by at
    most the sketch's ±0.01 % rank error.
    """
    cols = set(predictions_df.columns)
    has_month = "month" in cols
    has_lead = "lead_hours" in cols

    # regime cut points: exact interpolating percentiles == np.percentile
    fn = "percentile" if exact_percentile else "percentile_approx"
    qrow = predictions_df.agg(
        F.expr(f"{fn}(y_true_f, array(0.25D, 0.75D))").alias("q")
    ).first()
    q25, q75 = float(qrow["q"][0]), float(qrow["q"][1])

    df = predictions_df.withColumn("_regime", _regime_exprs(q25, q75))
    keys = ["_regime"]
    if has_month:
        df = df.withColumn("_month", F.col("month")).withColumn("_season", _season_expr())
        keys = ["_month", "_season"] + keys
    if has_lead:
        df = df.withColumn("_lead_bucket", _lead_bucket_expr())
        keys.append("_lead_bucket")

    e = (F.col("y_pred_f") - F.col("y_true_f")).cast("double")
    y = F.col("y_true_f").cast("double")
    df.createOrReplaceTempView("_slice_input")
    sets = ", ".join(f"({k})" for k in keys)
    agg_sql = ", ".join(
        [
            "COUNT(*) AS n_samples",
            "AVG(ABS(y_pred_f - y_true_f)) AS mae",
            "SQRT(AVG((y_pred_f - y_true_f) * (y_pred_f - y_true_f))) AS rmse",
            "AVG(y_pred_f - y_true_f) AS bias",
            "STDDEV_POP(y_pred_f - y_true_f) AS std_error",
            "SUM((y_pred_f - y_true_f) * (y_pred_f - y_true_f)) AS _ss_res",
            "VAR_POP(y_true_f) AS _var_y",
        ]
    )
    rows = df.sparkSession.sql(
        f"SELECT {', '.join(keys)}, {agg_sql} FROM _slice_input "
        f"GROUP BY GROUPING SETS ({sets})"
    ).collect()

    slices: dict[str, dict[str, Any]] = {}
    if has_month:
        slices["by_month"] = {}
        slices["by_season"] = {}
    if has_lead:
        slices["by_lead_bucket"] = {}
    slices["by_temp_regime"] = {}

    for row in rows:
        if row["n_samples"] < MIN_SLICE_ROWS:
            continue
        md = _metrics_from_row(row).to_dict()
        if has_month and row["_month"] is not None:
            slices["by_month"][str(row["_month"])] = md
        elif has_month and row["_season"] is not None:
            slices["by_season"][row["_season"]] = md
        elif has_lead and row["_lead_bucket"] is not None:
            slices["by_lead_bucket"][row["_lead_bucket"]] = md
        elif row["_regime"] is not None:
            slices["by_temp_regime"][row["_regime"]] = md

    # stable ordering to match the reference's sorted/fixed iteration
    if has_month:
        slices["by_month"] = dict(
            sorted(slices["by_month"].items(), key=lambda kv: int(kv[0]))
        )
        slices["by_season"] = {
            s: slices["by_season"][s]
            for s in ["DJF", "MAM", "JJA", "SON"]
            if s in slices["by_season"]
        }
    return slices
