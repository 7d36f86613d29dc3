"""Declared queries for streaming / windowed / DDL-surface operators."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..io import table_path
from ..streaming import ann_ingest as ai
from ..streaming import events as ev
from ..streaming import neardup as nd
from .base import ensure_views

_SCRATCH = "/tmp/hive_nexr_spark_scratch"


def _window_counts_batch(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return ev.window_counts_batch(dfs["events"])


def _window_counts_stream(spark, sf_dir):
    return ev.window_counts_stream(spark, sf_dir)


def _sessionize(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return ev.sessionize_batch(dfs["events"])


def _dynamic_partition_roundtrip(spark, sf_dir):
    """Dynamic-partition insert (`exec/FileSinkOperator.java:294-366`) →
    partition-pruned read-back. The write is `partitionBy(l_returnflag)`
    (Hive dynamic partitioning); the read filters one partition, which
    Spark prunes at the directory level."""
    dfs = ensure_views(spark, sf_dir)
    out = os.path.join(_SCRATCH, f"dynpart_{os.path.basename(sf_dir.rstrip('/'))}")
    (
        dfs["lineitem"]
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))


def _multi_insert_fanout(spark, sf_dir):
    """Multi-insert (one FROM, many INSERT — `Hive.g:1417`,
    `SemanticAnalyzer.genBodyPlan:5781`): single cached source scan fanned
    out to two sinks, then both read back."""
    dfs = ensure_views(spark, sf_dir)
    base = os.path.join(_SCRATCH, f"multiins_{os.path.basename(sf_dir.rstrip('/'))}")
    # Cache only for the duration of the fan-out writes, then unpersist:
    # Spark's CacheManager substitutes the InMemoryRelation into EVERY later
    # plan whose subtree matches the cached orders scan, which would silently
    # disable parquet filter pushdown for unrelated queries in this session.
    src = dfs["orders"].cache()
    try:
        hi = src.filter(F.col("o_totalprice") > 200000).select("o_orderkey", "o_totalprice")
        lo = src.filter(F.col("o_totalprice") <= 200000).select("o_orderkey", "o_totalprice")
        hi.write.mode("overwrite").parquet(base + "/hi")
        lo.write.mode("overwrite").parquet(base + "/lo")
    finally:
        src.unpersist()
    from ..functions.stable import dsum

    h = spark.read.parquet(base + "/hi").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    ).select(F.lit("hi").alias("sink"), "n", "total")
    l = spark.read.parquet(base + "/lo").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    ).select(F.lit("lo").alias("sink"), "n", "total")
    return h.unionAll(l)


def _virtual_columns(spark, sf_dir):
    """Virtual columns (`ql/metadata/VirtualColumn.java:34-35`):
    INPUT__FILE__NAME → input_file_name(). Normalized to the basename so
    the value is location-independent."""
    dfs = ensure_views(spark, sf_dir)
    return (
        dfs["lineitem"]
        .select(F.regexp_extract(F.input_file_name(), r"([^/]+\.parquet)", 1).alias("fname"))
        .groupBy("fname")
        .agg(F.count("*").alias("n"))
    )


def _bucketed_smb_join(spark, sf_dir):
    """Sort-merge-bucket join (`exec/SMBMapJoinOperator.java:51`,
    `optimizer/SortedMergeBucketMapJoinOptimizer.java:62`): both sides
    written `bucketBy(8, key).sortBy(key)`; Spark's SortMergeJoin then reads
    co-located buckets without an Exchange (verified in tests via the
    physical plan)."""
    dfs = ensure_views(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    # database-qualified: this write must not depend on the session's
    # current database (a qfile that USEs — or drops — its own db would
    # otherwise redirect/poison an unqualified saveAsTable)
    lt, ot = f"default.li_b_{tag}", f"default.ord_b_{tag}"
    for name, df, key in ((lt, dfs["lineitem"], "l_orderkey"),
                          (ot, dfs["orders"], "o_orderkey")):
        if not spark.catalog.tableExists(name):
            # a previous session may have left the managed location behind
            # without a catalog entry — clear it so saveAsTable can recreate
            import shutil

            loc = os.path.join(
                spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
                name.removeprefix("default."),
            )
            shutil.rmtree(loc, ignore_errors=True)
            (df.write.bucketBy(8, key).sortBy(key).mode("overwrite")
             .format("parquet").saveAsTable(name))
    li, o = spark.table(lt), spark.table(ot)
    from ..functions.stable import dsum

    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price"))
    )



def _stream_static_enrich(spark, sf_dir):
    return ev.stream_static_enrich(spark, sf_dir)


def _asof_join(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return ev.asof_enrich_batch(dfs["events"])


def _json_props_stats(spark, sf_dir):
    """Semi-structured extraction over the events `props` JSON column
    (`udf/UDFJson.java` get_json_object — JVM-side JSON path, no Python
    UDF): per-type stats of the extracted numeric field."""
    from pyspark.sql import functions as F

    e = ensure_views(spark, sf_dir)["events"]
    return (
        e.select("event_type",
                 F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("event_type")
        .agg(F.count("k").alias("n_with_k"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


def _dq_report(spark, sf_dir):
    from ..datapipe.quality_checks import dq_constraint_report

    return dq_constraint_report(ensure_views(spark, sf_dir))


def _anomaly_mad(spark, sf_dir):
    from ..datapipe.quality_checks import anomaly_mad

    return anomaly_mad(ensure_views(spark, sf_dir)["events"])


def _moving_avg(spark, sf_dir):
    from ..operators.windows import moving_average_range_frame

    return moving_average_range_frame(ensure_views(spark, sf_dir)["events"])


def _stream_decontaminate(spark, sf_dir):
    from ..streaming.decontaminate import stream_decontaminate

    return stream_decontaminate(spark, sf_dir)


def _table_changes(spark, sf_dir):
    from ..sources.snapshots import table_changes_diff

    return table_changes_diff(spark, sf_dir)


def _merge_upsert(spark, sf_dir):
    from ..sources.snapshots import merge_upsert_stats

    return merge_upsert_stats(spark, sf_dir)


def _cdc_mv(spark, sf_dir):
    from ..sources.snapshots import cdc_incremental_mv

    return cdc_incremental_mv(spark, sf_dir)


def _partition_evolution(spark, sf_dir):
    from ..sources.snapshots import partition_evolution_stats

    return partition_evolution_stats(spark, sf_dir)


def _time_travel(spark, sf_dir):
    from ..sources.snapshots import time_travel_versions

    return time_travel_versions(spark, sf_dir)


def _time_travel_delete(spark, sf_dir):
    from ..sources.snapshots import time_travel_delete

    return time_travel_delete(spark, sf_dir)


def _compaction(spark, sf_dir):
    from ..sources.snapshots import compaction_stats

    return compaction_stats(spark, sf_dir)


def _partition_compaction(spark, sf_dir):
    from ..sources.snapshots import partition_compaction_stats

    return partition_compaction_stats(spark, sf_dir)


def _branch_wap(spark, sf_dir):
    from ..sources.snapshots import branch_wap_stats

    return branch_wap_stats(spark, sf_dir)


def _schema_evolution(spark, sf_dir):
    from ..sources.snapshots import schema_evolution_stats

    return schema_evolution_stats(spark, sf_dir)


def _schema_rename_drop(spark, sf_dir):
    from ..sources.snapshots import schema_rename_drop_stats

    return schema_rename_drop_stats(spark, sf_dir)


def _binpack(spark, sf_dir):
    from ..sources.snapshots import binpack_stats

    return binpack_stats(spark, sf_dir)


QUERIES = {
    "events_window_batch": _window_counts_batch,
    "events_window_stream": _window_counts_stream,
    "sessionize_events": _sessionize,
    "dynamic_partition_roundtrip": _dynamic_partition_roundtrip,
    "multi_insert_fanout": _multi_insert_fanout,
    "virtual_columns": _virtual_columns,
    "bucketed_smb_join": _bucketed_smb_join,
    "events_stream_static_enrich": _stream_static_enrich,
    "events_stream_dedup": lambda spark, sf_dir: ev.stream_dedup(spark, sf_dir),
    "events_sessionize_stream": lambda spark, sf_dir: ev.sessionize_stream(spark, sf_dir),
    "events_stream_interval_join": lambda spark, sf_dir:
        ev.click_purchase_interval_join_stream(spark, sf_dir),
    "events_asof_join": _asof_join,
    "events_asof_join_tolerance": lambda spark, sf_dir:
        ev.asof_enrich_tolerance(ensure_views(spark, sf_dir)["events"]),
    "events_stream_asof": lambda spark, sf_dir:
        ev.stream_asof_enrich(spark, sf_dir),
    "events_cdc_merge": lambda spark, sf_dir: ev.cdc_merge_batch(
        ensure_views(spark, sf_dir)["events"]),
    "events_stream_cdc_upsert": lambda spark, sf_dir:
        ev.stream_cdc_upsert(spark, sf_dir),
    "events_stream_checkpoint_restart": lambda spark, sf_dir:
        ev.stream_checkpoint_restart(spark, sf_dir),
    "events_stream_late_drop": lambda spark, sf_dir:
        ev.stream_late_data_drop(spark, sf_dir),
    "events_json_props_stats": _json_props_stats,
    "events_mv_incremental": lambda spark, sf_dir: ev.mv_incremental_batch(
        ensure_views(spark, sf_dir)["events"]),
    "events_funnel": lambda spark, sf_dir: ev.funnel_stages(
        ensure_views(spark, sf_dir)["events"]),
    "events_retention_cohorts": lambda spark, sf_dir: ev.retention_cohorts(
        ensure_views(spark, sf_dir)["events"]),
    "events_scd2_history": lambda spark, sf_dir: ev.scd2_history(
        ensure_views(spark, sf_dir)["events"]),
    "events_stream_mv_maintain": lambda spark, sf_dir:
        ev.stream_mv_maintain(spark, sf_dir),
    "dq_constraint_report": lambda spark, sf_dir: _dq_report(spark, sf_dir),
    "events_anomaly_mad": lambda spark, sf_dir: _anomaly_mad(spark, sf_dir),
    "events_markov_transitions": lambda spark, sf_dir:
        ev.markov_transitions(ensure_views(spark, sf_dir)["events"]),
    "window_moving_avg_range": lambda spark, sf_dir: _moving_avg(
        spark, sf_dir),
    "table_time_travel": lambda spark, sf_dir: _time_travel(spark, sf_dir),
    "table_time_travel_delete": lambda spark, sf_dir:
        _time_travel_delete(spark, sf_dir),
    "table_compaction": lambda spark, sf_dir: _compaction(spark, sf_dir),
    "table_compact_partition": _partition_compaction,
    "table_compact_binpack": _binpack,
    "table_branch_wap": _branch_wap,
    "table_schema_evolution": _schema_evolution,
    "table_schema_rename_drop": _schema_rename_drop,
    "table_changes_diff": _table_changes,
    "table_merge_upsert": _merge_upsert,
    "table_cdc_incremental_mv": _cdc_mv,
    "table_partition_evolution": _partition_evolution,
    "events_user_paths_topk": lambda spark, sf_dir: ev.user_paths_topk(
        ensure_views(spark, sf_dir)["events"]),
    "events_stream_neardup": lambda spark, sf_dir:
        nd.stream_neardup(spark, sf_dir),
    "events_stream_decontaminate": lambda spark, sf_dir:
        _stream_decontaminate(spark, sf_dir),
    "similarity_stream_ann_ingest": lambda spark, sf_dir:
        ai.stream_ann_ingest(spark, sf_dir),
    "dedup_stream_ingest_gate": lambda spark, sf_dir:
        nd.stream_dedup_ingest(spark, sf_dir),
}

_WINDOW_SQL = """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""

ORACLE = {
    "events_stream_static_enrich": """
        SELECT c_mktsegment, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    "events_window_batch": _WINDOW_SQL,
    "events_window_stream": _WINDOW_SQL,
    "events_stream_dedup": """
        SELECT event_type, count(DISTINCT event_id) AS n_events
        FROM events GROUP BY event_type
    """,
    # session_window(ts, gap) merges an event into the previous session iff
    # ts <= prev_ts + gap at FULL timestamp precision (events exactly gap
    # apart share a session) — i.e. split only when the exact gap is
    # STRICTLY > 1800s. epoch_us gives exact integer microseconds, so the
    # boundary condition is bit-identical to Spark's internal micros.
    "events_sessionize_stream": """
        SELECT user_id, min(ts) AS sess_start, count(*) AS n_events
        FROM (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        ) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
            FROM events
          ) m
        ) s
        GROUP BY user_id, session_id
    """,
    "sessionize_events": """
        SELECT user_id, session_id, count(*) AS n_events,
               CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_s
        FROM (
          SELECT user_id, event_id, ts,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
          FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN floor(epoch(ts)) - floor(epoch(
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        )) > 1800 THEN 1 ELSE 0 END AS new_sess
            FROM events
          ) m
        ) s
        GROUP BY user_id, session_id
    """,
    # as-of join, window emulation (same UNION-WINDOW spec as the engine:
    # right side sorts before left at equal ts via the side marker, so a
    # simultaneous click IS visible to the purchase; integer microsecond
    # gaps are exact)
    "events_asof_join": """
        SELECT event_id, user_id, asof_event_id, gap_us FROM (
          SELECT event_id, user_id, side,
                 last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
                   OVER w AS asof_event_id,
                 epoch_us(ts) - last_value(
                     CASE WHEN side = 0 THEN epoch_us(ts) END IGNORE NULLS)
                   OVER w AS gap_us
          FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
            FROM events WHERE event_type IN ('click', 'purchase')
          ) m
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ) t WHERE side = 1
    """,
    "events_asof_join_tolerance": """
        SELECT event_id, user_id,
               CASE WHEN gap_us <= 600000000 THEN asof_event_id END
                 AS asof_event_id,
               CASE WHEN gap_us <= 600000000 THEN gap_us END AS gap_us,
               asof_event_id IS NOT NULL
                 AND NOT coalesce(gap_us <= 600000000, FALSE)
                 AS dropped_by_tolerance
        FROM (
          SELECT event_id, user_id, side,
                 last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
                   OVER w AS asof_event_id,
                 epoch_us(ts) - last_value(
                     CASE WHEN side = 0 THEN epoch_us(ts) END IGNORE NULLS)
                   OVER w AS gap_us
          FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
            FROM events WHERE event_type IN ('click', 'purchase')
          ) m
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ) t WHERE side = 1
    """,
    "dynamic_partition_roundtrip": """
        SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag
    """,
    "multi_insert_fanout": """
        SELECT 'hi' AS sink, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
        FROM orders WHERE o_totalprice > 200000
        UNION ALL
        SELECT 'lo' AS sink, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
        FROM orders WHERE o_totalprice <= 200000
    """,
    "virtual_columns": """
        SELECT 'lineitem.parquet' AS fname, count(*) AS n FROM lineitem
    """,
    "bucketed_smb_join": """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
}

ORACLE["events_json_props_stats"] = """
    SELECT event_type,
           count(k) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events) t
    GROUP BY event_type
"""

# CDC merge (streaming/events.py cdc_merge_batch): latest-per-key
# election on both sides, change wins, 'error' tombstone deletes
# top user event paths (streaming/events.py user_paths_topk):
# depth-truncated per-user sequences, global top-k with path tie-break
ORACLE["events_user_paths_topk"] = """
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 8 GROUP BY user_id
    ),
    counted AS (SELECT path, count(*) AS n FROM paths GROUP BY path)
    SELECT path, CAST(n AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rank
    FROM counted ORDER BY n DESC, path LIMIT 10
"""

# snapshot time travel (sources/snapshots.py): both versions must equal
# their slice-predicate recomputes — v1 must survive the v2 append
ORACLE["table_time_travel"] = """
    SELECT CAST(1 AS INT) AS version, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT CAST(2 AS INT), count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders
"""

# streaming decontamination gate (streaming/decontaminate.py): per
# arriving document, does its 4-gram shingle set overlap the broadcast
# benchmark (doc_id % 13 == 0) set — the stream twin of the
# pipeline_pretrain_e2e decontaminate stage; shingles are 16-hex md5
# slices of word 4-grams (the decontaminate_benchmark idiom)
ORACLE["events_stream_decontaminate"] = """
    WITH sh AS (
      SELECT doc_id, list_distinct([
               substr(md5(array_to_string(l[i:i+3], ' ')), 1, 16)
               for i in range(1, greatest(len(l) - 3, 1) + 1)
             ]) AS shs
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM documents) t
    ),
    bench AS (
      SELECT DISTINCT unnest(shs) AS shingle FROM sh WHERE doc_id % 13 = 0
    ),
    hits AS (
      SELECT DISTINCT e.doc_id
      FROM (SELECT doc_id, unnest(shs) AS shingle FROM sh) e
      JOIN bench b USING (shingle)
    )
    SELECT s.doc_id,
           s.doc_id IN (SELECT doc_id FROM hits) AS contaminated,
           CAST(len(shs) AS INT) AS n_shingles
    FROM sh s
"""

# snapshot DELETE lifecycle (sources/snapshots.py time_travel_delete):
# v1/v2 must return their PRE-delete contents (the tombstone is listed
# only from v3 on); v3 = all rows minus the deleted keys
ORACLE["table_time_travel_delete"] = """
    SELECT CAST(1 AS INT) AS version, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT CAST(2 AS INT), count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT CAST(3 AS INT), count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders WHERE o_orderkey % 5 <> 0
"""

# MERGE upsert (sources/snapshots.py merge_upsert_stats): v4 = the v3
# visible set minus old copies of % 7 == 0 keys, plus every % 7 == 0 row
# at price + 1000 — including the % 5 == 0 ∩ % 7 == 0 keys deleted at v3
# (reinsert-after-delete under sequenced tombstones)
ORACLE["table_merge_upsert"] = """
    WITH vis3 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 <> 0
    ),
    vis4 AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey, o_totalprice + 1000 FROM orders
      WHERE o_orderkey % 7 = 0
    )
    SELECT CAST(3 AS INT) AS version, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice,
           CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reinserted
    FROM vis3
    UNION ALL
    SELECT CAST(4 AS INT), count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE),
           CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM vis4
"""

# CDC-maintained MV (sources/snapshots.py cdc_incremental_mv): the
# oracle computes the v4 aggregate DIRECTLY from slice predicates — the
# hash match proves the engine's incremental fold (bootstrap + three
# CDC windows) equals a full recompute
ORACLE["table_cdc_incremental_mv"] = """
    WITH vis4 AS (
      SELECT o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderpriority, o_totalprice + 1000 FROM orders
      WHERE o_orderkey % 7 = 0
    )
    SELECT o_orderpriority, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice
    FROM vis4 GROUP BY o_orderpriority
"""

# compaction (sources/snapshots.py compaction_stats): v4's DATA must be
# bit-identical to v3's (layout changes, content doesn't — same
# aggregate both rows) while the manifest footprint collapses from
# (2 data dirs, 1 tombstone dir) to (1, 0) — deterministic by
# construction of the fixture's commit sequence
ORACLE["table_compaction"] = """
    SELECT CAST(3 AS INT) AS version, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice,
           CAST(2 AS INT) AS n_data_dirs,
           CAST(1 AS INT) AS n_tombstone_dirs
    FROM orders WHERE o_orderkey % 5 <> 0
    UNION ALL
    SELECT CAST(4 AS INT), count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE),
           CAST(1 AS INT), CAST(0 AS INT)
    FROM orders WHERE o_orderkey % 5 <> 0
"""

# watermark late-data drop (streaming/events.py stream_late_data_drop):
# append mode emits exactly the windows closed by the final watermark
# (end <= max_ts - 1h), counted over the ON-TIME rows only — the late
# batch (ts < max_ts - 3 days) is dropped by the watermark, so the
# oracle's on-time predicate IS the drop semantics
ORACLE["events_stream_late_drop"] = """
    WITH b AS (SELECT max(ts) AS mx FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
           count(*) AS n
    FROM events, b
    WHERE ts >= mx - INTERVAL 3 DAY
      AND time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
          <= mx - INTERVAL 1 HOUR
    GROUP BY 1, 2
"""

# partition-scoped compaction (sources/snapshots.py
# partition_compaction_stats): content identical v3 vs v4 for both
# scopes (the oracle recomputes from the slice predicates); the target
# partition's dir count collapses 2 → 1 while the tombstone stays
# listed for the untouched dirs — deterministic by fixture construction
ORACLE["table_compact_partition"] = """
    WITH vis AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT'
                  THEN 'target' ELSE 'rest' END AS scope,
             o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    agg AS (
      SELECT scope, count(*) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
               AS sum_totalprice
      FROM vis GROUP BY scope
    )
    SELECT CAST(3 AS INT) AS version, scope, n_rows, sum_totalprice,
           CAST(2 AS INT) AS n_target_dirs,
           CAST(1 AS INT) AS n_tombstone_dirs
    FROM agg
    UNION ALL
    SELECT CAST(4 AS INT), scope, n_rows, sum_totalprice,
           CAST(1 AS INT), CAST(1 AS INT)
    FROM agg
"""

# schema evolution (sources/snapshots.py schema_evolution_stats): v1
# reads with the original columns (AS-OF includes the schema, so
# n_with_channel = 0); v2's merged read surfaces o_channel with NULLs
# for the pre-evolution rows — n_with_channel = the delta row count
ORACLE["table_schema_evolution"] = """
    SELECT CAST(1 AS INT) AS version, count(*) AS n_rows,
           CAST(0 AS BIGINT) AS n_with_channel,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT CAST(2 AS INT), count(*),
           CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders
"""

# size-targeted binpack compaction (sources/snapshots.py binpack_stats):
# only the two sliver dirs rewrite (4 dirs -> 3); rows and sums are
# layout-invariant, so both versions aggregate the full orders table
ORACLE["table_compact_binpack"] = """
    SELECT CAST(4 AS INT) AS version, count(*) AS n_rows,
           CAST(4 AS INT) AS n_data_dirs,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders
    UNION ALL
    SELECT CAST(5 AS INT), count(*), CAST(3 AS INT),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders
"""

# rename+drop schema evolution via field IDs (sources/snapshots.py
# schema_rename_drop_stats): v2 pre-alter (7 cols, o_totalprice), v4
# rename surfaces the SAME values under o_amount (metadata-only — the
# sums are equal), v5 drop hides o_orderpriority (6 cols), v6 appends
# the %7 slice written physically under the new names — field-id
# resolution unifies it with the o_totalprice-named history
ORACLE["table_schema_rename_drop"] = """
    WITH t AS (
      SELECT count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(30,2))) AS s
      FROM orders
    ),
    s7 AS (
      SELECT count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(30,2))) AS s
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT CAST(2 AS INT) AS version, t.n AS n_rows,
           CAST(7 AS INT) AS n_cols, 'o_totalprice' AS value_col,
           CAST(t.s AS DOUBLE) AS sum_value FROM t
    UNION ALL
    SELECT CAST(4 AS INT), t.n, CAST(7 AS INT), 'o_amount',
           CAST(t.s AS DOUBLE) FROM t
    UNION ALL
    SELECT CAST(5 AS INT), t.n, CAST(6 AS INT), 'o_amount',
           CAST(t.s AS DOUBLE) FROM t
    UNION ALL
    SELECT CAST(6 AS INT), t.n + s7.n, CAST(6 AS INT), 'o_amount',
           CAST(t.s + s7.s AS DOUBLE) FROM t, s7
"""

# write-audit-publish over named refs (sources/snapshots.py
# branch_wap_stats): main_pre = v2 (full table, %5 keys still visible),
# staging = v3 (delete applied, zero bad keys — the audit), main_post =
# v3 after the fast-forward publish; snapshot isolation means main_pre
# keeps v2 content even though the branch has moved by collect time
ORACLE["table_branch_wap"] = """
    WITH v2 AS (SELECT o_orderkey, o_totalprice FROM orders),
    v3 AS (SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 5 <> 0),
    s2 AS (
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
               AS sum_totalprice,
             CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bad_keys
      FROM v2
    ),
    s3 AS (
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
               AS sum_totalprice,
             CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bad_keys
      FROM v3
    )
    SELECT 'main_pre' AS ref_label, CAST(2 AS INT) AS version,
           n_rows, sum_totalprice, n_bad_keys FROM s2
    UNION ALL
    SELECT 'staging', CAST(3 AS INT), n_rows, sum_totalprice, n_bad_keys
    FROM s3
    UNION ALL
    SELECT 'main_post', CAST(3 AS INT), n_rows, sum_totalprice,
           n_bad_keys FROM s3
"""

# first-order type-transition mining (streaming/events.py
# markov_transitions): per-user lead pairs, global conditional probs
ORACLE["events_markov_transitions"] = """
    WITH pairs AS (
      SELECT event_type AS cur_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    counted AS (
      SELECT cur_type, next_type, count(*) AS n FROM pairs
      WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    totals AS (SELECT cur_type, sum(n) AS tot FROM counted GROUP BY 1)
    SELECT c.cur_type, c.next_type, CAST(c.n AS BIGINT) AS n,
           round(c.n / CAST(t.tot AS DOUBLE), 6) AS prob
    FROM counted c JOIN totals t USING (cur_type)
"""

# trailing 7-day RANGE-frame moving average (operators/windows.py
# moving_average_range_frame) over user-daily decimal sums
ORACLE["window_moving_avg_range"] = """
    WITH daily AS (
      SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             date_diff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS epoch_day,
             sum(CAST(value AS DECIMAL(30,6))) AS s
      FROM events GROUP BY 1, 2, 3
    )
    SELECT user_id, day, CAST(s AS DOUBLE) AS day_sum,
           CAST(count(*) OVER w AS INT) AS trail_n_days,
           round(CAST(sum(s) OVER w AS DOUBLE)
                 / count(*) OVER w, 6) AS trail_avg
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

# MAD anomaly screen (datapipe/quality_checks.py anomaly_mad):
# median/MAD per event_type + k*mad outlier count; quantile_cont is the
# established percentile-parity function (agg_percentiles)
ORACLE["events_anomaly_mad"] = """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)
    ),
    stats AS (
      SELECT event_type, count(*) AS n, min(med) AS med,
             quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY 1
    ),
    outl AS (
      SELECT d.event_type, count(*) AS n_out
      FROM dev d JOIN stats s USING (event_type)
      WHERE d.ad > 3.0 * s.mad GROUP BY 1
    )
    SELECT s.event_type, CAST(s.n AS BIGINT) AS n,
           round(s.med, 6) AS median_value,
           round(s.mad, 6) AS mad,
           CAST(coalesce(o.n_out, 0) AS BIGINT) AS n_outliers
    FROM stats s LEFT JOIN outl o USING (event_type)
"""

# SCD Type 2 history (streaming/events.py scd2_history): purchase-event
# versions to validity intervals via lead() per user
ORACLE["events_scd2_history"] = """
    SELECT user_id, event_id AS version_id, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
           CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# Deequ-style constraint suite (datapipe/quality_checks.py): one
# aggregation pass per table + FK anti-join counts
ORACLE["dq_constraint_report"] = """
    SELECT 'orders' AS table_name, 'n_rows' AS constraint,
           CAST(count(*) AS DOUBLE) AS value FROM orders
    UNION ALL
    SELECT 'orders', 'orderkey_unique_ratio',
           round(count(DISTINCT o_orderkey) / CAST(count(*) AS DOUBLE), 6)
    FROM orders
    UNION ALL
    SELECT 'orders', 'totalprice_negative',
           CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
                AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'orders', 'custkey_null_frac',
           round(avg(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END), 6)
    FROM orders
    UNION ALL
    SELECT 'lineitem', 'n_rows', CAST(count(*) AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'quantity_range_violations',
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'discount_range_violations',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'events', 'n_rows', CAST(count(*) AS DOUBLE) FROM events
    UNION ALL
    SELECT 'events', 'props_null_frac',
           round(avg(CASE WHEN props IS NULL THEN 1.0 ELSE 0.0 END), 6)
    FROM events
    UNION ALL
    SELECT 'events', 'value_null_frac',
           round(avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6)
    FROM events
    UNION ALL
    SELECT 'events', 'event_type_null_frac',
           round(avg(CASE WHEN event_type IS NULL THEN 1.0 ELSE 0.0 END), 6)
    FROM events
    UNION ALL
    SELECT 'orders', 'custkey_fk_orphans', CAST(count(*) AS DOUBLE)
    FROM orders WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem', 'orderkey_fk_orphans', CAST(count(*) AS DOUBLE)
    FROM lineitem WHERE l_orderkey IS NOT NULL
      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""

# cohort retention (streaming/events.py retention_cohorts): first-signup
# cohorts x day offsets 0..7, distinct active members per cell
ORACLE["events_retention_cohorts"] = """
    WITH signups AS (
      SELECT user_id,
             min(strftime(CAST(ts AS DATE), '%Y-%m-%d')) AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_day, count(*) AS n_cohort FROM signups GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d FROM events
    ),
    grid AS (
      SELECT s.cohort_day,
             CAST(date_diff('day', CAST(s.cohort_day AS DATE),
                            CAST(a.d AS DATE)) AS INT) AS day_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN signups s USING (user_id)
      WHERE date_diff('day', CAST(s.cohort_day AS DATE),
                      CAST(a.d AS DATE)) BETWEEN 0 AND 7
      GROUP BY 1, 2
    )
    SELECT g.cohort_day, g.day_offset,
           CAST(g.n_active AS BIGINT) AS n_active,
           CAST(z.n_cohort AS BIGINT) AS n_cohort,
           round(g.n_active / CAST(z.n_cohort AS DOUBLE), 6) AS retention
    FROM grid g JOIN sizes z USING (cohort_day)
"""

# ordered funnel (streaming/events.py funnel_stages): first view, first
# click strictly after it, first purchase strictly after that
ORACLE["events_funnel"] = """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(1 + CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END AS INT)
             AS reached,
           CAST(floor(epoch(v.t1)) AS BIGINT) AS view_epoch,
           CAST(floor(epoch(c.t2)) AS BIGINT) AS click_epoch,
           CAST(floor(epoch(p.t3)) AS BIGINT) AS purchase_epoch
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""

# incremental MV maintenance (streaming/events.py mv_incremental_batch):
# the oracle is the FULL recompute — the op must be bit-equal to it even
# though its plan only merges partial aggregates
ORACLE["events_mv_incremental"] = """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                 / count(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
"""

ORACLE["events_cdc_merge"] = """
    WITH b1 AS (
      SELECT * FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 5 <> 4) t WHERE rn = 1
    ),
    c1 AS (
      SELECT * FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 5 = 4) t WHERE rn = 1
    )
    SELECT user_id,
           CASE WHEN c1.event_id IS NOT NULL
                THEN c1.event_id ELSE b1.event_id END AS last_event_id,
           CASE WHEN c1.event_id IS NOT NULL
                THEN c1.event_type ELSE b1.event_type END AS last_type,
           CASE WHEN c1.event_id IS NOT NULL
                THEN c1.value ELSE b1.value END AS last_value,
           CASE WHEN c1.event_id IS NOT NULL
                THEN 'change' ELSE 'base' END AS src
    FROM b1 FULL OUTER JOIN c1 USING (user_id)
    WHERE NOT (c1.event_id IS NOT NULL AND c1.event_type = 'error')
"""

# streaming CDC upsert: the batch twin IS the oracle (same merge spec)
ORACLE["events_stream_cdc_upsert"] = ORACLE["events_cdc_merge"]
# checkpoint-restart (r13): the ENGINE is killed mid-stream by an
# injected failure after batch kill_bid=1's sink append but before its
# checkpoint commit, then restarted from the checkpoint — Spark
# re-delivers batch 1 and the idempotent election landing absorbs the
# duplicate. The ORACLE is the UNINTERRUPTED batch merge (no crash
# anywhere in it) plus the deterministic landing arithmetic:
# n_land_attempts = #batches (slice = (event_id // 5) % 4, file order =
# batch order under maxFilesPerTrigger=1) holding the key's changes,
# + 1 for keys in the re-delivered batch 1. The hash match on the state
# columns IS killed-and-resumed == uninterrupted; the +1 visible in
# n_land_attempts IS the re-delivery having happened at the data level.
ORACLE["events_stream_checkpoint_restart"] = """
    WITH b1 AS (
      SELECT * FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 5 <> 4) t WHERE rn = 1
    ),
    c1 AS (
      SELECT * FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 5 = 4) t WHERE rn = 1
    ),
    att AS (
      SELECT user_id,
             CAST(count(DISTINCT slice)
                  + max(CASE WHEN slice = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_land_attempts
      FROM (SELECT user_id, (event_id // 5) % 4 AS slice
            FROM events WHERE event_id % 5 = 4) s
      GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN c1.event_id IS NOT NULL
                THEN c1.event_id ELSE b1.event_id END AS last_event_id,
           CASE WHEN c1.event_id IS NOT NULL
                THEN c1.event_type ELSE b1.event_type END AS last_type,
           CASE WHEN c1.event_id IS NOT NULL
                THEN c1.value ELSE b1.value END AS last_value,
           CASE WHEN c1.event_id IS NOT NULL
                THEN 'change' ELSE 'base' END AS src,
           COALESCE(att.n_land_attempts, 0) AS n_land_attempts
    FROM b1 FULL OUTER JOIN c1 USING (user_id)
    LEFT JOIN att USING (user_id)
    WHERE NOT (c1.event_id IS NOT NULL AND c1.event_type = 'error')
"""
# the streaming MV maintenance must equal the batch full recompute —
# same oracle as the batch delta-merge op
ORACLE["events_stream_mv_maintain"] = ORACLE["events_mv_incremental"]

ORACLE["events_stream_interval_join"] = """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT)
             AS gap_seconds
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


def _range_join_binned(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return ev.range_join_binned(dfs["events"])


QUERIES["events_range_join_binned"] = _range_join_binned
# point-in-interval range join: the oracle uses the NAIVE theta form
# (ts BETWEEN session bounds) — same result the binned equi-join +
# residual filter must produce; session spec identical to
# sessionize_events (second-truncated gap > 1800s)
ORACLE["events_range_join_binned"] = """
    WITH sess AS (
      SELECT user_id, event_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN floor(epoch(ts)) - floor(epoch(
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)
                    )) > 1800 THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE event_type <> 'error'
      ) m
    ),
    intervals AS (
      SELECT user_id, session_id, min(ts) AS t0, max(ts) AS t1
      FROM sess GROUP BY user_id, session_id
    )
    SELECT e.event_id, e.user_id, i.session_id,
           CAST(floor(epoch(e.ts)) - floor(epoch(i.t0)) AS BIGINT)
             AS offset_s
    FROM events e JOIN intervals i
      ON e.user_id = i.user_id AND e.ts >= i.t0 AND e.ts <= i.t1
    WHERE e.event_type = 'error'
"""


QUERIES["events_hypertable_rollup"] = lambda spark, sf_dir: \
    ev.hypertable_rollup_daily(spark, sf_dir)
# the oracle aggregates the RAW table directly — the rollup's two-tier
# re-aggregation must be indistinguishable (decimal partials make the
# re-sum exact)
ORACLE["events_hypertable_rollup"] = """
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""


# streaming MinHash near-dup (streaming/neardup.py): batch-twin oracle
# from the shared band-matcher generator (queries/datapipe_q.py — also
# the persisted-LSH-index oracles), planted arrivals vs the bounded
# original-documents index
from .datapipe_q import (_LSH_INCOMING, _LSH_ORIGINALS,  # noqa: E402
                         _lsh_match_sql)

ORACLE["events_stream_neardup"] = _lsh_match_sql(
    _LSH_ORIGINALS, _LSH_INCOMING)


# streaming dedup ingestion gate: per-arrival admission decisions against
# the FROZEN historical-corpus index — the pair matcher aggregated per
# arriving doc, every arrival carried through (admitted = no match)
_GATE_ARRIVALS = _LSH_INCOMING + """
      UNION ALL
      SELECT doc_id, text FROM documents
      WHERE doc_id >= 200 AND doc_id < 250
"""
ORACLE["dedup_stream_ingest_gate"] = f"""
    WITH pairs AS ({_lsh_match_sql(_LSH_ORIGINALS, _GATE_ARRIVALS)}),
    bpairs AS ({_lsh_match_sql(_GATE_ARRIVALS, _GATE_ARRIVALS)}),
    arrivals AS ({_GATE_ARRIVALS}),
    m AS (
      SELECT doc_b AS doc_id, CAST(count(*) AS INT) AS n_index_matches,
             max(jaccard) AS best_jaccard
      FROM pairs GROUP BY doc_b
    ),
    bm AS (
      SELECT doc_b AS doc_id,
             CAST(count(DISTINCT doc_a) AS INT) AS n_batch_matches,
             min(doc_a) AS batch_dup_of
      FROM bpairs WHERE doc_a <> doc_b GROUP BY doc_b
    )
    SELECT a.doc_id,
           coalesce(m.n_index_matches, 0) AS n_index_matches,
           round(coalesce(m.best_jaccard, 0.0), 6) AS best_jaccard,
           CAST(CASE WHEN m.doc_id IS NULL THEN 1 ELSE 0 END AS INT)
             AS admitted,
           coalesce(bm.n_batch_matches, 0) AS n_batch_matches,
           bm.batch_dup_of
    FROM arrivals a LEFT JOIN m ON a.doc_id = m.doc_id
    LEFT JOIN bm ON a.doc_id = bm.doc_id
"""


# streaming ANN ingest shares the batch add-batch lifecycle's oracle
# (residual/IVFADC form since r10): frozen-artifact residual encoding is
# deterministic, so arrival path (build vs stream micro-batch) cannot
# change the index contents
from .datapipe_q import _ivf_pq_residual_sql as _ivf_pq_sql_gen  # noqa: E402

ORACLE["similarity_stream_ann_ingest"] = _ivf_pq_sql_gen(
    train_pred="vec_id < 10 OR vec_id % 2 = 0")


# manifest-diff CDC read (sources/snapshots.py changes_between): the
# v1->v2 window is a pure append (inserts = the delta slice), v2->v3 a
# merge-on-read delete (deletes = the tombstoned keys' rows); computed
# engine-side from added dirs/tombstones only, never a content diff

# streaming as-of vs the static click index (streaming/events.py
# stream_asof_enrich): the index holds ALL clicks, so arrival order
# cannot matter and the result equals the batch union-window as-of
ORACLE["events_stream_asof"] = ORACLE["events_asof_join"]

ORACLE["table_changes_diff"] = """
    SELECT CAST(1 AS INT) AS from_version, CAST(2 AS INT) AS to_version,
           'insert' AS change_type, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT CAST(1 AS INT), CAST(2 AS INT), 'delete',
           CAST(0 AS BIGINT), 0.0
    UNION ALL
    SELECT CAST(2 AS INT), CAST(3 AS INT), 'insert',
           CAST(0 AS BIGINT), 0.0
    UNION ALL
    SELECT CAST(2 AS INT), CAST(3 AS INT), 'delete', count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders WHERE o_orderkey % 5 = 0
"""

# partition-spec evolution (sources/snapshots.py
# partition_evolution_stats): one month predicate, three layouts — the
# legacy unpartitioned slice, the month()-partitioned delta (directory
# pruning, plan-asserted), and their union
ORACLE["table_partition_evolution"] = """
    SELECT 'legacy_unpartitioned' AS layout, count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders WHERE o_orderkey % 3 <> 0
      AND strftime(o_orderdate, '%Y-%m') = '1997-06'
    UNION ALL
    SELECT 'evolved_partitioned', count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders WHERE o_orderkey % 3 = 0
      AND strftime(o_orderdate, '%Y-%m') = '1997-06'
    UNION ALL
    SELECT 'combined', count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
    FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1997-06'
"""
