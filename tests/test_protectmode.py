"""Protect-mode semantics (HiveQLSession._protect_check) — pinned by the
reference's protectmode.q golden and protectmode_*.q negative errors."""

from __future__ import annotations

import pytest

from hive_nexr_spark.protectmode_errors import ProtectModeError


@pytest.fixture()
def hql(spark):
    from hive_nexr_spark.hiveql import HiveQLSession

    h = HiveQLSession(spark)
    spark.sql("DROP TABLE IF EXISTS _pm_t")
    spark.sql("CREATE TABLE _pm_t (col STRING) USING parquet"
              " PARTITIONED BY (p STRING)")
    spark.sql("ALTER TABLE _pm_t ADD PARTITION (p='p1')")
    spark.sql("ALTER TABLE _pm_t ADD PARTITION (p='p2')")
    yield h
    h.protect.clear()
    spark.sql("DROP TABLE IF EXISTS _pm_t")


def test_offline_table_blocks_any_query(hql):
    hql.sql("ALTER TABLE _pm_t ENABLE OFFLINE")
    with pytest.raises(ProtectModeError,
                       match="offline table or partition Table _pm_t"):
        hql.sql("SELECT * FROM _pm_t WHERE p='not_exist'")
    # DDL is never blocked by OFFLINE (protectmode.q drops p3 offline)
    hql.sql("ALTER TABLE _pm_t DROP PARTITION (p='p2')")
    hql.sql("ALTER TABLE _pm_t DISABLE OFFLINE")
    assert hql.sql("SELECT * FROM _pm_t").count() == 0


def test_offline_partition_blocks_only_that_partition(hql):
    hql.sql("ALTER TABLE _pm_t PARTITION (p='p1') ENABLE OFFLINE")
    assert hql.sql("SELECT * FROM _pm_t WHERE p='p2'").count() == 0
    with pytest.raises(ProtectModeError, match="Partition p=p1"):
        hql.sql("SELECT * FROM _pm_t WHERE p='p1'")
    with pytest.raises(ProtectModeError, match="Partition p=p1"):
        # no predicate → touches every partition incl. the offline one
        hql.sql("SELECT * FROM _pm_t")


def test_no_drop_scopes_to_exact_object(hql):
    hql.sql("ALTER TABLE _pm_t ENABLE NO_DROP")
    with pytest.raises(ProtectModeError,
                       match="_pm_t is protected from being dropped"):
        hql.sql("DROP TABLE _pm_t")
    # table-level NO_DROP does NOT block partition drops (protectmode.q)
    hql.sql("ALTER TABLE _pm_t DROP PARTITION (p='p2')")
    hql.sql("ALTER TABLE _pm_t DISABLE NO_DROP")
    hql.sql("ALTER TABLE _pm_t PARTITION (p='p1') ENABLE NO_DROP")
    with pytest.raises(ProtectModeError,
                       match="Partition p=p1 is protected"):
        hql.sql("ALTER TABLE _pm_t DROP PARTITION (p='p1')")
    # ... and partition-level NO_DROP does not block the table drop
    hql.sql("DROP TABLE _pm_t")
    assert not hql.protect  # registry purged with the table


def test_offline_blocks_ctas_and_create_view_reads(hql):
    """CTAS / CREATE VIEW AS SELECT compile a read of their source table
    — Hive's offline check covers every compiled query's ReadEntity
    inputs, not just SELECT-led statements (round-7 advice fix)."""
    hql.sql("ALTER TABLE _pm_t ENABLE OFFLINE")
    with pytest.raises(ProtectModeError, match="offline"):
        hql.sql("CREATE TABLE _pm_ctas AS SELECT * FROM _pm_t")
    with pytest.raises(ProtectModeError, match="offline"):
        hql.sql("CREATE VIEW _pm_v AS SELECT * FROM _pm_t")
    hql.sql("ALTER TABLE _pm_t DISABLE OFFLINE")
    hql.sql("CREATE TABLE _pm_ctas AS SELECT * FROM _pm_t")
    hql.spark.sql("DROP TABLE IF EXISTS _pm_ctas")
