"""Driver-contract invariants: entry() smoke, queries()/oracle_sql() shape."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns  # stable schema with named columns


def test_registry_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle is non-empty SQL text
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    """Every declared query must at least execute and return a schema at
    sf0.001 (full value checks run against DuckDB at sf0.01 via
    tools/verify_local.py)."""
    import pyspark.sql

    qs = entry_mod.queries()
    skip = {"events_window_stream"}  # exercised in test_streaming (slow path)
    for name, fn in qs.items():
        if name in skip:
            continue
        df = fn(spark, sf_dir)
        assert isinstance(df, pyspark.sql.DataFrame), name
        assert df.columns, name
        df.limit(5).collect()
