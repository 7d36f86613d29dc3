"""Declared queries for the DDL/session-command surface (SURVEY §2.13,
§2.12) and the HiveQL dialect facade.

Each query drives the catalog/session machinery end-to-end (CREATE/ALTER/
SHOW/DESCRIBE/INSERT/CTAS/VIEW, CREATE TEMPORARY FUNCTION, TABLESAMPLE
rewrite) and ends in a SELECT whose result an SQL oracle can reproduce from
the base tables — so the surface is hash-checked, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..hiveql import HiveQLSession
from .base import ensure_views, reset_database

_DB = "nexr_ddl"


def _tag(sf_dir: str) -> str:
    import os

    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


def _ddl_catalog_roundtrip(spark, sf_dir):
    """DDL surface (`parse/DDLSemanticAnalyzer.java:185-362`,
    `exec/DDLTask.java`): database → CTAS → ALTER ADD COLUMNS → view →
    INSERT INTO → SHOW/DESCRIBE → final verifiable SELECT."""
    ensure_views(spark, sf_dir)
    db = f"{_DB}_{_tag(sf_dir)}"
    reset_database(spark, db)
    spark.sql(f"CREATE DATABASE {db}")
    # CTAS (`SemanticAnalyzer.java:7203-7207` schema-from-query)
    spark.sql(
        f"CREATE TABLE {db}.nation_copy USING parquet AS "
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    )
    spark.sql(f"ALTER TABLE {db}.nation_copy ADD COLUMNS (note STRING)")
    # INSERT INTO with explicit values (append path)
    spark.sql(
        f"INSERT INTO {db}.nation_copy VALUES (900, 'ATLANTIS', 0, 'added')"
    )
    spark.sql(
        f"CREATE VIEW {db}.low_regions AS "
        f"SELECT * FROM {db}.nation_copy WHERE n_regionkey < 3"
    )
    # SHOW/DESCRIBE are metadata ops — exercised, result not part of the hash
    assert spark.sql(f"SHOW TABLES IN {db}").count() >= 2
    assert spark.sql(f"DESCRIBE TABLE {db}.nation_copy").count() >= 4
    return spark.sql(
        f"SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name "
        f"FROM {db}.low_regions GROUP BY n_regionkey"
    )


def _temp_function_surface(spark, sf_dir):
    """CREATE TEMPORARY FUNCTION (`parse/FunctionSemanticAnalyzer.java`,
    `exec/FunctionTask.java:45`) through the HiveQL facade: binds the Hive
    hash class to the Python ObjectInspectorUtils string-hash
    implementation, then uses it in SQL. Row-at-a-time UDF — acceptable here because the surface under test
    is registration, not throughput (the fast path is
    functions.hive_compat.hive_hash, pure Column ops)."""
    ensure_views(spark, sf_dir)
    hql = HiveQLSession(spark)
    hql.sql(
        "CREATE TEMPORARY FUNCTION nexr_hash AS "
        "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFHash'"
    )
    return hql.sql(
        "SELECT n_name, nexr_hash(n_name) AS h FROM nation"
    )


def _hiveql_bucket_sample(spark, sf_dir):
    """TABLESAMPLE(BUCKET x OUT OF y ON col) (`Hive.g:1653`) — rejected by
    Spark's parser, rewritten by HiveQLSession to the reference's bucket
    predicate (`optimizer/SamplePruner.java:57` semantics)."""
    ensure_views(spark, sf_dir)
    hql = HiveQLSession(spark)
    return hql.sql(
        "SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty "
        "FROM lineitem TABLESAMPLE(BUCKET 4 OUT OF 10 ON l_orderkey) "
        "GROUP BY l_returnflag"
    )


def _hiveql_multi_insert(spark, sf_dir):
    """Multi-insert FROM-first syntax (`Hive.g:1417`,
    `SemanticAnalyzer.genBodyPlan:5781`) — natively parsed by Spark; driven
    through the facade into two tables, then both read back."""
    ensure_views(spark, sf_dir)
    db = f"{_DB}_mi_{_tag(sf_dir)}"
    reset_database(spark, db)
    hql = HiveQLSession(spark)
    hql.sql(f"CREATE DATABASE {db}")
    hql.sql(f"CREATE TABLE {db}.hi (k BIGINT, p DOUBLE) USING parquet")
    hql.sql(f"CREATE TABLE {db}.lo (k BIGINT, p DOUBLE) USING parquet")
    hql.sql(f"""
        FROM orders
        INSERT OVERWRITE TABLE {db}.hi
          SELECT o_orderkey, o_totalprice WHERE o_totalprice > 200000
        INSERT OVERWRITE TABLE {db}.lo
          SELECT o_orderkey, o_totalprice WHERE o_totalprice <= 200000
    """)
    return hql.sql(f"""
        SELECT 'hi' AS sink, count(*) AS n,
               CAST(sum(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS total
        FROM {db}.hi
        UNION ALL
        SELECT 'lo' AS sink, count(*) AS n,
               CAST(sum(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS total
        FROM {db}.lo
    """)


def _export_import_roundtrip(spark, sf_dir):
    """EXPORT/IMPORT as SQL statements through the dialect facade
    (`parse/ExportSemanticAnalyzer.java`, `parse/ImportSemanticAnalyzer.java`,
    grammar `Hive.g:1171`): EXPORT writes the table data plus a replayable
    schema descriptor; IMPORT recreates the table from them in a second
    database and the result is verified against the source."""
    ensure_views(spark, sf_dir)
    db = f"{_DB}_exp_{_tag(sf_dir)}"
    reset_database(spark, db)
    spark.sql(f"CREATE DATABASE {db}")
    spark.sql(
        f"CREATE TABLE {db}.supplier_src USING parquet AS "
        "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"
    )
    hql = HiveQLSession(spark)
    export_path = f"exports/roundtrip_{_tag(sf_dir)}"
    hql.sql(f"EXPORT TABLE {db}.supplier_src TO '{export_path}'")
    spark.sql(f"DROP TABLE {db}.supplier_src")
    hql.sql(f"IMPORT TABLE {db}.supplier_imported FROM '{export_path}'")

    return spark.sql(
        f"SELECT s_nationkey, count(*) AS n, "
        f"CAST(sum(CAST(s_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal "
        f"FROM {db}.supplier_imported GROUP BY s_nationkey"
    )


def _msck_repair_partitions(spark, sf_dir):
    """MSCK REPAIR TABLE (`parse/DDLSemanticAnalyzer.java` metastore-check
    dispatch; `ql/metadata/CheckResult.java` lists the missing partitions a
    repair registers): partition directories materialized directly on the
    filesystem — bypassing the catalog, as an external loader would — are
    discovered and registered, and only then become queryable."""
    dfs = ensure_views(spark, sf_dir)
    db = f"{_DB}_msck_{_tag(sf_dir)}"
    reset_database(spark, db)
    spark.sql(f"CREATE DATABASE {db}")
    spark.sql(
        f"CREATE TABLE {db}.nation_parts "
        "(n_nationkey INT, n_name STRING, n_regionkey INT) "
        "USING parquet PARTITIONED BY (n_regionkey)"
    )
    hql = HiveQLSession(spark)
    loc = hql._table_location(f"{db}.nation_parts")
    nation = dfs["nation"].select("n_nationkey", "n_name", "n_regionkey")
    for r in range(5):
        (nation.filter(F.col("n_regionkey") == r).drop("n_regionkey")
         .write.mode("overwrite").parquet(f"{loc}/n_regionkey={r}"))
    assert spark.sql(f"SHOW PARTITIONS {db}.nation_parts").count() == 0
    # Hive-0.8 check-only spelling routes to the same repair
    hql.sql(f"MSCK TABLE {db}.nation_parts")
    assert spark.sql(f"SHOW PARTITIONS {db}.nation_parts").count() == 5
    return spark.sql(
        f"SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name "
        f"FROM {db}.nation_parts GROUP BY n_regionkey"
    )


def _load_data_roundtrip(spark, sf_dir):
    """LOAD DATA INPATH (`parse/LoadSemanticAnalyzer.java`, `Hive.g:302`):
    stage parquet files outside the warehouse, file-move them into a table
    (append), then LOAD ... OVERWRITE to replace — the reference's two load
    modes — and verify the final content."""
    import shutil

    dfs = ensure_views(spark, sf_dir)
    db = f"{_DB}_load_{_tag(sf_dir)}"
    reset_database(spark, db)
    hql = HiveQLSession(spark)
    hql.sql(f"CREATE DATABASE {db}")
    # clone the exact parquet schema with a zero-row CTAS
    hql.sql(
        f"CREATE TABLE {db}.nation_loaded USING parquet AS "
        "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE 1 = 0"
    )
    staging = f"/tmp/hive_nexr_spark_scratch/load_stage_{_tag(sf_dir)}"
    shutil.rmtree(staging, ignore_errors=True)
    dfs["nation"].select("n_nationkey", "n_name", "n_regionkey").coalesce(
        1
    ).write.mode("overwrite").parquet(staging)
    # append twice, then OVERWRITE back to a single copy
    hql.sql(f"LOAD DATA INPATH '{staging}' INTO TABLE {db}.nation_loaded")
    hql.sql(f"LOAD DATA INPATH '{staging}' INTO TABLE {db}.nation_loaded")
    assert spark.table(f"{db}.nation_loaded").count() == 2 * dfs["nation"].count()
    hql.sql(
        f"LOAD DATA INPATH '{staging}' OVERWRITE INTO TABLE {db}.nation_loaded"
    )
    return spark.sql(
        f"SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name "
        f"FROM {db}.nation_loaded GROUP BY n_regionkey"
    )


def _analyze_table_stats(spark, sf_dir):
    """ANALYZE TABLE ... COMPUTE STATISTICS (+ FOR COLUMNS)
    (`exec/StatsTask.java`, `parse/DDLSemanticAnalyzer.java` analyze
    branch): Spark's native statement; table + column stats land in the
    catalog and feed Catalyst's cost-based optimizer (the same role
    StatsTask's row/byte counts play for the reference's planner). The
    query asserts stats became visible, then returns a verifiable
    aggregate."""
    ensure_views(spark, sf_dir)
    db = f"{_DB}_stats_{_tag(sf_dir)}"
    reset_database(spark, db)
    spark.sql(f"CREATE DATABASE {db}")
    spark.sql(
        f"CREATE TABLE {db}.supplier_stats USING parquet AS "
        "SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier"
    )
    spark.sql(f"ANALYZE TABLE {db}.supplier_stats COMPUTE STATISTICS")
    spark.sql(
        f"ANALYZE TABLE {db}.supplier_stats COMPUTE STATISTICS "
        "FOR COLUMNS s_suppkey, s_nationkey"
    )
    stats = [
        r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {db}.supplier_stats").collect()
        if (r.col_name or "").strip() == "Statistics"
    ]
    assert stats and "rows" in stats[0], f"no row stats in catalog: {stats}"
    col_stats = spark.sql(
        f"DESCRIBE TABLE EXTENDED {db}.supplier_stats s_suppkey"
    ).collect()
    assert any(
        r.info_name == "distinct_count" and r.info_value not in (None, "NULL")
        for r in col_stats
    ), f"no column stats: {col_stats}"
    return spark.sql(
        f"SELECT s_nationkey, count(*) AS n FROM {db}.supplier_stats "
        "GROUP BY s_nationkey"
    )


def _alter_concatenate_merge(spark, sf_dir):
    """ALTER TABLE ... CONCATENATE (`ql/io/rcfile/merge/BlockMergeTask.java`):
    fragment a table into many small files (the classic many-reducer
    output problem the reference's merge task exists for), compact via the
    facade, assert the file count dropped, and verify content unchanged."""
    import os

    ensure_views(spark, sf_dir)
    db = f"{_DB}_cat_{_tag(sf_dir)}"
    reset_database(spark, db)
    hql = HiveQLSession(spark)
    hql.sql(f"CREATE DATABASE {db}")
    spark.table("orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).repartition(24).write.mode("overwrite").saveAsTable(f"{db}.orders_frag")

    loc = hql._table_location(f"{db}.orders_frag")

    def n_files():
        return sum(
            1 for f in os.listdir(loc)
            if os.path.isfile(os.path.join(loc, f)) and not f.startswith(("_", "."))
        )

    before = n_files()
    hql.sql(f"ALTER TABLE {db}.orders_frag CONCATENATE")
    after = n_files()
    assert before == 24 and after < before, f"merge did not shrink: {before}->{after}"
    return spark.sql(
        f"SELECT o_orderstatus, count(*) AS n, "
        f"CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price "
        f"FROM {db}.orders_frag GROUP BY o_orderstatus"
    )


def _stateful_user_stats(spark, sf_dir):
    from ..streaming.events import user_stats_stateful_stream

    ensure_views(spark, sf_dir)
    return user_stats_stateful_stream(spark, sf_dir)


def _ngrams(spark, sf_dir):
    from ..operators.aggregates import top_ngrams

    dfs = ensure_views(spark, sf_dir)
    return top_ngrams(dfs["documents"])


def _context_ngrams(spark, sf_dir):
    from ..operators.aggregates import context_ngrams

    dfs = ensure_views(spark, sf_dir)
    return context_ngrams(dfs["documents"])


QUERIES = {
    "ddl_catalog_roundtrip": _ddl_catalog_roundtrip,
    "create_temp_function": _temp_function_surface,
    "hiveql_bucket_sample": _hiveql_bucket_sample,
    "hiveql_multi_insert": _hiveql_multi_insert,
    "load_data_roundtrip": _load_data_roundtrip,
    "msck_repair_partitions": _msck_repair_partitions,
    "analyze_table_stats": _analyze_table_stats,
    "alter_concatenate_merge": _alter_concatenate_merge,
    "agg_ngrams": _ngrams,
    "agg_context_ngrams": _context_ngrams,
    "export_import_roundtrip": _export_import_roundtrip,
    "events_stateful_user_stats": _stateful_user_stats,
}

ORACLE = {
    "ddl_catalog_roundtrip": """
        SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        FROM (
          SELECT n_nationkey, n_name, n_regionkey FROM nation
          UNION ALL SELECT 900, 'ATLANTIS', 0
        ) t WHERE n_regionkey < 3 GROUP BY n_regionkey
    """,
    # ObjectInspectorUtils string hashCode in DuckDB: fold
    # h = (h*31 + byte) mod 2^32 over ASCII, seed 0
    # codepoints, then reinterpret as signed int32.
    "create_temp_function": """
        SELECT n_name,
          CAST(CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END AS INT) AS h
        FROM (
          SELECT n_name,
            list_reduce(
              list_prepend(CAST(0 AS HUGEINT),
                           [CAST(unicode(c) AS HUGEINT)
                            for c in string_split(n_name, '')]),
              (a, b) -> (a * 31 + b) % 4294967296
            ) AS h
          FROM nation
        ) t
    """,
    "hiveql_bucket_sample": """
        SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem WHERE l_orderkey % 10 = 3
        GROUP BY l_returnflag
    """,
    "load_data_roundtrip": """
        SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        FROM nation GROUP BY n_regionkey
    """,
    "analyze_table_stats": """
        SELECT s_nationkey, count(*) AS n FROM supplier GROUP BY s_nationkey
    """,
    "alter_concatenate_merge": """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderstatus
    """,
    "hiveql_multi_insert": """
        SELECT 'hi' AS sink, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
        FROM orders WHERE o_totalprice > 200000
        UNION ALL
        SELECT 'lo' AS sink, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
        FROM orders WHERE o_totalprice <= 200000
    """,
    "agg_ngrams": """
        WITH grams AS (
          SELECT unnest([
                   array_to_string(l[i:i+1], ' ')
                   for i in range(1, greatest(len(l) - 1, 1) + 1)
                 ]) AS gram
          FROM (SELECT string_split(lower(text), ' ') AS l FROM documents) t
        )
        SELECT gram, freq, rank FROM (
          SELECT gram, count(*) AS freq,
                 row_number() OVER (ORDER BY count(*) DESC, gram) AS rank
          FROM grams GROUP BY gram
        ) r WHERE rank <= 10
    """,
    "export_import_roundtrip": """
        SELECT s_nationkey, count(*) AS n,
               CAST(sum(CAST(s_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal
        FROM supplier GROUP BY s_nationkey
    """,
    "msck_repair_partitions": """
        SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        FROM nation GROUP BY n_regionkey
    """,
    "events_stateful_user_stats": """
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events GROUP BY user_id
    """,
    "agg_context_ngrams": """
        WITH pairs AS (
          SELECT unnest([l[i] for i in range(1, greatest(len(l) - 1, 1) + 1)]) AS w1,
                 unnest([l[i+1] for i in range(1, greatest(len(l) - 1, 1) + 1)]) AS w2
          FROM (SELECT string_split(lower(text), ' ') AS l FROM documents) t
        )
        SELECT w2 AS gram, freq, rank FROM (
          SELECT w2, count(*) AS freq,
                 row_number() OVER (ORDER BY count(*) DESC, w2) AS rank
          FROM pairs WHERE w1 = 'the' AND w2 IS NOT NULL
          GROUP BY w2
        ) r WHERE rank <= 10
    """,
}
