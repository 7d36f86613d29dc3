"""Source/sink format operators (SURVEY §2.2).

The reference's storage formats are SerDes projected over raw bytes at scan
time (schema-on-read): LazySimpleSerDe delimited text
(`serde2/lazy/LazySimpleSerDe.java:62`, Hive's default ^A/\\x01 field
delimiter), RegexSerDe (`contrib/src/java/org/apache/hadoop/hive/contrib/
serde2/RegexSerDe.java:73`), columnar RCFile (`ql/io/RCFile.java:148`).

Spark-first mapping: delimited text is `spark.read/write.csv(sep='\\x01')`
with an explicit schema (the same declared-schema-over-bytes model);
RegexSerDe is `spark.read.text` + one `regexp_extract` per column (JVM
codegen, not a Python UDF); RCFile's columnar role is played by parquet
everywhere else in this repo. Both readers here are schema-on-read: bad
rows/fields surface as NULL, never as errors — Hive semantics.

Scale: text scan parallelism is per-file-split (Spark splits uncompressed
text by `spark.sql.files.maxPartitionBytes`), and the regex/projection work
is embarrassingly parallel map-side codegen; no shuffle until the consumer
aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType)

from ..functions.stable import dsum

_SCRATCH = "/tmp/hive_nexr_spark_scratch"


def _tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def textfile_roundtrip(spark: SparkSession, orders: DataFrame,
                       sf_dir: str) -> DataFrame:
    """TextFile sink + scan: write orders as ^A-delimited text (Hive's
    default LazySimpleSerDe layout, `serde2/lazy/LazySimpleSerDe.java:62`;
    output format `ql/io/HiveIgnoreKeyTextOutputFormat.java`), then read it
    back by projecting the declared schema onto the bytes and aggregate."""
    out = f"{_SCRATCH}/textfile_{_tag(sf_dir)}"
    src = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    (
        src.write.mode("overwrite")
        .option("sep", "\x01")
        .option("emptyValue", "")
        .csv(out)
    )
    schema = StructType([
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderpriority", StringType()),
    ])
    back = (
        spark.read.schema(schema)
        .option("sep", "\x01")
        .option("mode", "PERMISSIVE")  # bad fields → NULL, Hive-style
        .csv(out)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        dsum("o_totalprice").alias("sum_price"),
    )


def regex_serde_extract(spark: SparkSession, orders: DataFrame,
                        sf_dir: str) -> DataFrame:
    """RegexSerDe scan (`contrib/.../serde2/RegexSerDe.java:73`): raw text
    lines parsed into typed columns by one capture group per column.
    Lines are rendered from orders, written as raw text, re-read with
    `spark.read.text`, and split by `regexp_extract` — all JVM-side
    expression codegen (no Python), exactly the SerDe's
    input.regex="(...)\\\\|(...)\\\\|(...)" contract."""
    out = f"{_SCRATCH}/regexserde_{_tag(sf_dir)}"
    lines = orders.select(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderpriority"),
            F.col("o_totalprice").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    pat = r"^([^|]*)\|([^|]*)\|([^|]*)$"
    raw = spark.read.text(out)
    parsed = raw.select(
        F.regexp_extract("value", pat, 1).cast("long").alias("o_orderkey"),
        F.regexp_extract("value", pat, 2).alias("o_orderpriority"),
        F.regexp_extract("value", pat, 3).cast("double").alias("o_totalprice"),
    )
    return parsed.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.max("o_orderkey").alias("max_key"),
        dsum("o_totalprice").alias("sum_price"),
    )


def orc_roundtrip(spark: SparkSession, lineitem: DataFrame,
                  sf_dir: str) -> DataFrame:
    """ORC sink + scan — the modern columnar twin of the reference's
    RCFile path (`ql/io/RCFileOutputFormat.java` / `orc` landed in Hive
    right after 0.8): write a lineitem projection as ORC with a
    partition column, read it back, and aggregate with a pushed filter.
    Spark's native ORC reader gives predicate pushdown + column pruning
    exactly like parquet (`.explain` shows PushedFilters on the ORC
    scan), so the format swap costs nothing in plan quality."""
    out = f"{_SCRATCH}/orc_{_tag(sf_dir)}"
    src = lineitem.select("l_orderkey", "l_returnflag", "l_linestatus",
                          "l_quantity", "l_extendedprice")
    (src.write.mode("overwrite").partitionBy("l_returnflag").orc(out))
    back = spark.read.orc(out)
    return (
        back.filter(F.col("l_returnflag") != "N")  # partition-pruned
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"),
             dsum("l_quantity").alias("sum_qty"),
             dsum("l_extendedprice").alias("sum_price"))
    )


def json_lines_roundtrip(spark: SparkSession, customer: DataFrame,
                         sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema-on-read scan — the reference's JSON
    SerDe story (`get_json_object` over string columns; here the whole
    row IS json). Write customer as newline-delimited JSON, read it back
    with an explicit schema (schema-on-read: missing/extra fields
    tolerate as NULL, LazySimpleSerDe-style), and aggregate."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    out = f"{_SCRATCH}/jsonl_{_tag(sf_dir)}"
    src = customer.select("c_custkey", "c_mktsegment", "c_acctbal")
    src.write.mode("overwrite").json(out)
    schema = StructType([
        StructField("c_custkey", LongType()),
        StructField("c_mktsegment", StringType()),
        StructField("c_acctbal", DoubleType()),
        # schema-on-read: a column the files don't carry reads as NULL
        StructField("c_missing", StringType()),
    ])
    back = spark.read.schema(schema).json(out)
    return (
        back.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"),
             dsum("c_acctbal").alias("sum_bal"),
             F.count("c_missing").alias("n_missing"))
    )


def json_ingest_quarantine(spark: SparkSession, documents: DataFrame,
                           sf_dir: str) -> DataFrame:
    """Corrupt-record QUARANTINE ingest — the production JSON-lines
    landing pattern (a 100 TB crawl drop always contains malformed
    lines; the pipeline must load what parses and account for what
    doesn't, never abort): rows are serialized to JSON lines with a
    deterministic corruption planted (doc_id % 17 == 0 lines truncated
    mid-object), then read back in Spark's PERMISSIVE mode with
    `columnNameOfCorruptRecord` — parse failures land intact in the
    quarantine column instead of killing the job.

    Output: one accounting row (n_clean, n_quarantined, clean_id_sum,
    clean_chars_sum) — the ingest report a pipeline logs per batch.

    100 TB shape: the quarantine path is a per-row projection in the
    scan itself (no second pass, no driver involvement); clean and
    quarantined rows flow from the same read."""
    from ..scratch import process_scratch_dir

    out = process_scratch_dir("quarantine")
    payload = F.to_json(F.struct("doc_id", "n_chars", "lang"))
    lines = documents.select(
        F.when(F.col("doc_id") % 17 == 0, F.substring(payload, 1, 10))
        .otherwise(payload).alias("value"))
    lines.write.mode("overwrite").text(out)

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("n_chars", LongType()),
        StructField("lang", StringType()),
        StructField("_quarantine", StringType()),
    ])
    back = (spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_quarantine")
            .json(out))
    return back.agg(
        F.count(F.when(F.col("_quarantine").isNull(), 1))
        .alias("n_clean"),
        F.count("_quarantine").alias("n_quarantined"),
        F.sum(F.when(F.col("_quarantine").isNull(), F.col("doc_id")))
        .alias("clean_id_sum"),
        F.sum(F.when(F.col("_quarantine").isNull(), F.col("n_chars")))
        .alias("clean_chars_sum"),
    )


def parquet_schema_evolution(spark: SparkSession, documents: DataFrame,
                             sf_dir: str) -> DataFrame:
    """Schema-EVOLUTION read (`mergeSchema`) — the lakehouse reality
    that ingestion batches gain columns over time: batch 1 lands
    (doc_id, n_chars), batch 2 lands (doc_id, n_chars, lang); a merged
    read surfaces the union schema with NULLs where early batches lack
    the column, and aggregation proceeds as if the table were always
    wide. The Hive-0.8 analogue is ALTER TABLE ADD COLUMNS over
    partitioned text tables (`DDLSemanticAnalyzer`), which this engine
    also runs in the qfile corpus — this op pins the columnar-format
    merge behavior.

    Output: (lang_or_missing, n, chars_sum) per group."""
    from ..scratch import process_scratch_dir

    out = process_scratch_dir("evolve")
    (documents.filter(F.col("doc_id") % 2 == 0)
     .select("doc_id", "n_chars")
     .write.mode("overwrite").parquet(f"{out}/batch=1"))
    (documents.filter(F.col("doc_id") % 2 == 1)
     .select("doc_id", "n_chars", "lang")
     .write.mode("overwrite").parquet(f"{out}/batch=2"))
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return (
        back.groupBy(F.coalesce("lang", F.lit("<missing>"))
                     .alias("lang_or_missing"))
        .agg(F.count("*").alias("n"),
             F.sum("n_chars").alias("chars_sum"))
    )
