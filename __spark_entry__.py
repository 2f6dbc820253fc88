"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in geoproc_spark/queries.py (engine operators) with
oracle SQL built from the shared-dialect synthesis layer
(geoproc_spark/synth.py) so Spark and DuckDB compute bit-identical values.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoproc_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan -> Arrow-UDF coordinate extraction -> cell encode ->
    covering-cell PIP join -> per-feature aggregate, on sf0.001."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    # static shared-dialect SQL + lazily-built VALUES oracles (numpy twins)
    return Q.all_oracle_sql()
