"""Oracle/engine dtype-compatibility lint (tools/oracle_dtype_lint.py).

Two driver-canon type bugs slipped past value-level local verification in
consecutive rounds (r6 qfile_udf_bitmap_or raw-array column, r7
events_json_props_stats DuckDB-HUGEINT-as-float64 vs Spark bigint).  This
test retires the class: every declared (query, oracle) pair must
materialize to hash-compatible pandas kinds on both sides.

The qfile_* pairs execute whole .q scripts (minutes of wall clock); they
run through the same lint in the pre-record sweep
(``python tools/oracle_dtype_lint.py``) rather than here — BENCH_NOTES
records that as part of the artifact-freshness discipline.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tools.oracle_dtype_lint import lint

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def test_lint_flags_the_r7_hugeint_bug(spark):
    """Canary: feeding the lint the UNFIXED r7 oracle (sum without CAST)
    must produce a sum_k kind-mismatch failure — proves the lint detects
    the class it exists for."""
    from hive_nexr_spark.queries import streaming_q

    fixed = streaming_q.ORACLE["events_json_props_stats"]
    assert "CAST(sum(k) AS BIGINT)" in fixed
    try:
        streaming_q.ORACLE["events_json_props_stats"] = fixed.replace(
            "CAST(sum(k) AS BIGINT)", "sum(k)")
        failures, checked = lint(SMOKE_SF_DIR, {"events_json_props_stats"})
    finally:
        streaming_q.ORACLE["events_json_props_stats"] = fixed
    assert checked == ["events_json_props_stats"]
    assert any("sum_k" in f and "kind mismatch" in f for f in failures)


@pytest.mark.slow
def test_declared_oracles_dtype_compatible(spark):
    """All non-qfile (query, oracle) pairs pass the kind lint at
    sf0.001 — no HUGEINT/float64 drift, no nested or decimal values
    reaching the driver's hash canon."""
    names = {n for n in entry_mod.oracle_sql() if not n.startswith("qfile_")}
    failures, checked = lint(SMOKE_SF_DIR, names)
    assert len(checked) == len(names)
    assert failures == []
