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
    """Assemble the inventory with modules interleaved round-robin.

    The verification driver evaluates queries in insertion order and may
    stop after a fixed budget (round 1 stopped at 50 of 85, covering only
    relational + part of functions). Interleaving one query per module per
    round keeps every module represented in any prefix of the dict, so a
    budget-capped sweep still exercises datapipe/streaming/DDL/sources.
    Within a module the declared order is preserved (most representative
    queries first).
    """
    from . import (
        datapipe_q, ddl_q, functions_q, qtest_q, relational, sources_q,
        streaming_q)

    mods = (relational, functions_q, datapipe_q, streaming_q, ddl_q,
            sources_q, qtest_q)
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    iters = [iter(mod.QUERIES.items()) for mod in mods]
    by_mod_oracle = [mod.ORACLE for mod in mods]
    while iters:
        nxt = []
        for it, orc in zip(iters, by_mod_oracle):
            try:
                k, fn = next(it)
            except StopIteration:
                continue
            if k in queries:
                raise ValueError(f"duplicate query key {k!r}")
            queries[k] = fn
            if k in orc:
                oracle[k] = orc[k]
            nxt.append((it, orc))
        if not nxt:
            break
        iters = [it for it, _ in nxt]
        by_mod_oracle = [orc for _, orc in nxt]
    all_oracle: dict[str, str] = {}
    for mod in mods:
        all_oracle.update(mod.ORACLE)
    missing = set(all_oracle) - set(queries)
    if missing:
        raise ValueError(f"oracle without query: {missing}")
    return queries, oracle
