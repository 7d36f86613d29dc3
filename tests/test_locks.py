"""Explicit lock manager semantics (lockmgr.py) — pinned by the
reference's own lock1-4.q goldens and lockneg1-5.q error texts."""

from __future__ import annotations

import pytest

from hive_nexr_spark.lockmgr import (EXCLUSIVE, SHARED, LockError,
                                     LockManager, object_name)


def test_object_names():
    assert object_name("t") == "default@t"
    assert object_name("t", [("ds", "2008-04-08"), ("hr", "11")]) == \
        "default@t@ds=2008-04-08/hr=11"


def test_shared_locks_stack_and_unlock_clears_all():
    lm = LockManager()
    lm.lock("default@t", SHARED)
    lm.lock("default@t", SHARED)  # second node, not a no-op (lock1.q)
    assert lm.show() == [("default@t", SHARED), ("default@t", SHARED)]
    lm.unlock("default@t", "t")   # one UNLOCK releases both
    assert lm.show() == []


def test_exclusive_conflicts_both_ways():
    lm = LockManager()
    lm.lock("default@t", SHARED)
    with pytest.raises(LockError, match="conflicting lock present for "
                                        "default@t mode EXCLUSIVE"):
        lm.lock("default@t", EXCLUSIVE)   # lockneg1.q
    lm2 = LockManager()
    lm2.lock("default@t", EXCLUSIVE)
    with pytest.raises(LockError, match="mode SHARED"):
        lm2.lock("default@t", SHARED)
    with pytest.raises(LockError, match="mode EXCLUSIVE"):
        lm2.lock("default@t", EXCLUSIVE)


def test_unlock_unlocked_errors_with_table_name():
    lm = LockManager()
    with pytest.raises(LockError, match="Table t is not locked "):
        lm.unlock("default@t@ds=1/hr=2", "t")  # lockneg3.q: TABLE name


def test_show_scoping_table_vs_partition():
    lm = LockManager()
    part = object_name("t", [("ds", "1")])
    lm.lock(object_name("t"), SHARED)
    lm.lock(part, EXCLUSIVE)
    # global: both, sorted; table scope: table-level only (lock2.q)
    assert lm.show() == [("default@t", SHARED), (part, EXCLUSIVE)]
    assert lm.show(object_name("t")) == [("default@t", SHARED)]
    assert lm.show(part) == [(part, EXCLUSIVE)]


def test_extended_appends_detail_rows():
    lm = LockManager()
    lm.lock("default@t", SHARED)
    rows = lm.show(extended=True)
    assert rows[0] == ("default@t", SHARED)
    assert rows[1][0].startswith("LOCK_QUERYID:")
    assert "LOCK_MODE:EXPLICIT" in rows[1][0]


def test_hiveql_lock_statements(spark, sf_dir):
    from hive_nexr_spark.hiveql import HiveQLSession

    hql = HiveQLSession(spark)
    spark.sql("CREATE TABLE IF NOT EXISTS _lock_t (k INT) USING parquet")
    try:
        assert hql.sql("LOCK TABLE _lock_t SHARED") is None
        rows = hql.sql("SHOW LOCKS").collect()
        assert ("default@_lock_t", "SHARED") in [tuple(r) for r in rows]
        rows = hql.sql("SHOW LOCKS _lock_t extended").collect()
        assert len(rows) == 2
        assert hql.sql("UNLOCK TABLE _lock_t") is None
        assert hql.sql("SHOW LOCKS").collect() == []
        with pytest.raises(LockError, match="not locked"):
            hql.sql("UNLOCK TABLE _lock_t")
        with pytest.raises(LockError, match="Table _nope_ not found"):
            hql.sql("SHOW LOCKS _nope_")
    finally:
        hql.locks.clear()
        spark.sql("DROP TABLE IF EXISTS _lock_t")


def test_show_extended_is_a_pure_read():
    """SHOW LOCKS EXTENDED must not mutate lock state: sequence ids are
    assigned at acquisition, so repeated calls return identical rows
    (round-7 advice fix — show() used to bump the sequence counter)."""
    from hive_nexr_spark.lockmgr import LockManager

    lm = LockManager()
    lm.lock("default@t1", "SHARED")
    lm.lock("default@t1", "SHARED")
    first = lm.show(extended=True)
    assert first == lm.show(extended=True) == lm.show(extended=True)
    # detail rows carry distinct per-lock ids
    details = [r for r in first if r[0].startswith("LOCK_QUERYID")]
    assert len(details) == 2 and details[0] != details[1]
