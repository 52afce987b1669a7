"""Shared pytest fixtures: one SparkSession per test run.

local[*] with a small shuffle-partition count so window/agg tests run
fast; session timezone pinned UTC (correctness-bearing — see
temp_data_pipeline_spark/session.py).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    from temp_data_pipeline_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()
