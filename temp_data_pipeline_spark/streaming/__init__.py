"""Structured Streaming extension (SURVEY §2.10).

The reference is batch-only; its incremental model is
append-new-year-partition + idempotent re-run. This package is the
Spark-native streaming counterpart of that pipeline: file-source
ingest with watermarked dedup (≙ D1), stateless QC flagging (≙ P9/P10),
a stateful spike detector via applyInPandasWithState (≙ W1), tumbling
daily/hourly rollups (≙ A1), and cross-batch NEAR-dup ingest (SimHash
band index via foreachBatch — the streaming face of llm/dedup.py).
Every transformation is shared with the batch path where semantics
allow, and each streaming query is pinned against its batch
equivalent in tests.
"""

from temp_data_pipeline_spark.streaming.ingest import (
    flag_spikes_stateful,
    stream_dedup_documents,
    stream_hourly_obs,
)
from temp_data_pipeline_spark.streaming.neardup import (
    neardup_ingest_batch,
    stream_neardup_ingest,
)
from temp_data_pipeline_spark.streaming.rollups import (
    events_hourly_rollup,
    run_events_rollup_batchlike,
    stream_daily_tmax,
)

__all__ = [
    "events_hourly_rollup",
    "flag_spikes_stateful",
    "neardup_ingest_batch",
    "stream_dedup_documents",
    "run_events_rollup_batchlike",
    "stream_daily_tmax",
    "stream_hourly_obs",
    "stream_neardup_ingest",
]
