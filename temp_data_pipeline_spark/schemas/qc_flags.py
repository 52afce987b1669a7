"""Quality-control flag vocabulary (bitmask longs).

Same vocabulary as the reference (`src/tempdata/schemas/qc_flags.py:13-23`):
flag, never delete; flags propagate upward via bitwise OR (Spark's
built-in `bit_or` aggregate).
"""

QC_OK = 0

# Hourly-level flags
QC_MISSING_VALUE = 1 << 0  # temp value missing/null
QC_OUT_OF_RANGE = 1 << 1  # temp outside physical bounds
QC_SPIKE_DETECTED = 1 << 2  # sudden hour-to-hour change
QC_DUPLICATE_TS = 1 << 3  # duplicate (ts_utc, station_id)

# Daily aggregation flags
QC_LOW_COVERAGE = 1 << 4  # < min_coverage_hours valid hours
QC_INCOMPLETE_DAY = 1 << 5  # zero valid hours in the local day

ALL_HOURLY_FLAGS = (
    QC_MISSING_VALUE | QC_OUT_OF_RANGE | QC_SPIKE_DETECTED | QC_DUPLICATE_TS
)
ALL_DAILY_FLAGS = ALL_HOURLY_FLAGS | QC_LOW_COVERAGE | QC_INCOMPLETE_DAY
