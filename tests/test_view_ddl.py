"""CREATE VIEW semantic validation (qtest._validate_view_ddl) — pinned
by create_view_failure5-9.q / alter_view_failure*.q error texts."""

from __future__ import annotations

import pytest

from hive_nexr_spark.sources.qtest import (_select_output_names,
                                           _validate_view_ddl)


def test_select_output_names():
    assert _select_output_names(
        "SELECT key, t.value, key + 1 AS k2, count(*) FROM t"
    ) == ["key", "value", "k2", None]
    assert _select_output_names("SELECT * FROM t") is None
    assert _select_output_names(
        "SELECT f(a, b) AS x, g(c) FROM t") == ["x", None]


def test_duplicate_output_column():
    with pytest.raises(ValueError, match="Duplicate column name: key"):
        _validate_view_ddl(
            "CREATE VIEW v(x,y) AS SELECT key, key FROM src", {})


def test_partitioned_on_discipline():
    reg: dict = {}
    # valid: pcol is the rightmost output; clause stripped, cols recorded
    out = _validate_view_ddl(
        "CREATE VIEW v PARTITIONED ON (value) AS "
        "SELECT key, value FROM src", reg)
    assert "PARTITIONED ON" not in out.upper()
    assert reg["v"] == ["value"]
    with pytest.raises(ValueError, match="Rightmost columns"):
        _validate_view_ddl(
            "CREATE VIEW v2 PARTITIONED ON (key) AS "
            "SELECT key, value FROM src", {})
    with pytest.raises(ValueError, match="At least one non-partitioning"):
        _validate_view_ddl(
            "CREATE VIEW v3 PARTITIONED ON (key) AS "
            "SELECT key FROM src", {})
    with pytest.raises(ValueError, match="Rightmost columns"):
        # order matters (create_view_failure9.q)
        _validate_view_ddl(
            "CREATE VIEW v4 PARTITIONED ON (value,key) AS "
            "SELECT key+1 as k2, key, value FROM src", {})
