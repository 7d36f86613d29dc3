"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (Q5-style revenue-by-nation) at
sf0.001; `queries()` / `oracle_sql()` expose the full operator inventory
(SURVEY.md §2 + north-star data-pipeline ops) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_nexr_spark.operators.joins import join_multiway
from hive_nexr_spark.queries import collect_all
from hive_nexr_spark.queries.base import ensure_views

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    dfs = ensure_views(spark, _SMOKE_SF_DIR)
    return join_multiway(dfs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = collect_all()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    _, o = collect_all()
    return o
