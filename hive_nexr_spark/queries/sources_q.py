"""Declared queries for source/sink formats (SURVEY §2.2)."""

from __future__ import annotations

from ..sources import formats as fmt
from .base import ensure_views


def _textfile_roundtrip(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.textfile_roundtrip(spark, dfs["orders"], sf_dir)


def _regex_serde(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.regex_serde_extract(spark, dfs["orders"], sf_dir)


def _jdbc_external_table(spark, sf_dir):
    """External storage handler stand-in (reference:
    `hbase-handler/src/java/org/apache/hadoop/hive/hbase/HBaseStorageHandler.java:63`):
    the reference maps a Hive table onto an external KV store; the
    Spark-native analogue is the JDBC datasource. Round-trips nation
    through an embedded Derby database (driver ships in Spark's jars) and
    reads it back as a *partitioned* JDBC scan — partitionColumn splits
    the external read into parallel range queries, the shape that scales
    to a sharded external store (filters are pushed into the remote SQL)."""
    import uuid

    from pyspark.sql import functions as F

    dfs = ensure_views(spark, sf_dir)
    url = (
        "jdbc:derby:/tmp/hive_nexr_spark_scratch/"
        f"derby_ext_{uuid.uuid4().hex[:8]};create=true"
    )
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    dfs["nation"].select("n_nationkey", "n_name", "n_regionkey").write.jdbc(
        url, "nation_ext", mode="overwrite", properties=props
    )
    back = spark.read.jdbc(
        url,
        "nation_ext",
        column="n_nationkey",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
        properties=props,
    )
    return (
        back.filter(F.col("n_regionkey") < 3)
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"), F.min("n_name").alias("first_name"))
    )


def _orc_roundtrip(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.orc_roundtrip(spark, dfs["lineitem"], sf_dir)


def _json_lines_roundtrip(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.json_lines_roundtrip(spark, dfs["customer"], sf_dir)


def _json_ingest_quarantine(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.json_ingest_quarantine(spark, dfs["documents"], sf_dir)


def _parquet_schema_evolution(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.parquet_schema_evolution(spark, dfs["documents"], sf_dir)


QUERIES = {
    "textfile_roundtrip": _textfile_roundtrip,
    "regex_serde_extract": _regex_serde,
    "jdbc_external_table": _jdbc_external_table,
    "orc_roundtrip": _orc_roundtrip,
    "json_lines_roundtrip": _json_lines_roundtrip,
    "json_ingest_quarantine": _json_ingest_quarantine,
    "parquet_schema_evolution": _parquet_schema_evolution,
}

ORACLE = {
    # quarantine ingest: the corruption plant is a pure doc_id predicate,
    # so the accounting derives straight from the source table
    "json_ingest_quarantine": """
        SELECT CAST(count(*) FILTER (doc_id % 17 <> 0) AS BIGINT)
                 AS n_clean,
               CAST(count(*) FILTER (doc_id % 17 = 0) AS BIGINT)
                 AS n_quarantined,
               CAST(sum(doc_id) FILTER (doc_id % 17 <> 0) AS BIGINT)
                 AS clean_id_sum,
               CAST(sum(n_chars) FILTER (doc_id % 17 <> 0) AS BIGINT)
                 AS clean_chars_sum
        FROM documents
    """,
    # mergeSchema read: early batches lack lang -> '<missing>' group
    "parquet_schema_evolution": """
        SELECT CASE WHEN doc_id % 2 = 1 THEN lang
                    ELSE '<missing>' END AS lang_or_missing,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum
        FROM documents GROUP BY 1
    """,
    # both roundtrip through files on the Spark side; the oracle is the
    # same aggregate straight off the source table — lossless (de)serialization
    # is exactly what's being asserted
    "textfile_roundtrip": """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderstatus
    """,
    "regex_serde_extract": """
        SELECT o_orderpriority, count(*) AS n, max(o_orderkey) AS max_key,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderpriority
    """,
    "jdbc_external_table": """
        SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        FROM nation WHERE n_regionkey < 3 GROUP BY n_regionkey
    """,
    "orc_roundtrip": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                 AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
                 AS sum_price
        FROM lineitem WHERE l_returnflag <> 'N'
        GROUP BY l_returnflag, l_linestatus
    """,
    "json_lines_roundtrip": """
        SELECT c_mktsegment, count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
                 AS sum_bal,
               CAST(0 AS BIGINT) AS n_missing
        FROM customer GROUP BY c_mktsegment
    """,
}
