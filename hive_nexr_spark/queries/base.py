"""Shared helpers for declared queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views

_last_key: tuple[int, str] | None = None
_last_dfs: dict[str, DataFrame] = {}


def ensure_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register testdata views once per (session, sf_dir) switch.

    Cheap memoization so a 60-query verify pass doesn't re-read parquet
    footers 600 times; re-registers when the driver switches scale factor.
    """
    global _last_key, _last_dfs
    key = (id(spark), sf_dir)
    if key != _last_key:
        _last_dfs = register_views(spark, sf_dir)
        _last_key = key
    return _last_dfs


def reset_database(spark: SparkSession, db: str) -> None:
    """DROP DATABASE ... CASCADE plus filesystem cleanup.

    The session catalog is in-memory, so a database created by a *previous*
    process is invisible to DROP yet its warehouse directory persists and
    blocks CREATE TABLE (LOCATION_ALREADY_EXISTS). Remove both."""
    import shutil

    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{db}.db", ignore_errors=True)


def sql_query(sql: str):
    """A declared query that is plain Spark SQL over the testdata views."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.sql(sql)

    run.__doc__ = sql
    return run
