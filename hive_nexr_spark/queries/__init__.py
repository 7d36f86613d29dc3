"""Declared query inventory — the driver-facing surface.

Each submodule exposes ``QUERIES: dict[str, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (DuckDB ANSI SQL). Keys are stable operator
names mapped 1:1 to SURVEY.md §2 inventory rows; entries without an oracle
are non-SQL-expressible ops (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from . import (
        datapipe_q, ddl_q, functions_q, relational, sources_q, streaming_q)

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod in (relational, functions_q, datapipe_q, streaming_q, ddl_q,
                sources_q):
        for k in mod.QUERIES:
            if k in queries:
                raise ValueError(f"duplicate query key {k!r}")
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    missing = set(oracle) - set(queries)
    if missing:
        raise ValueError(f"oracle without query: {missing}")
    return queries, oracle
