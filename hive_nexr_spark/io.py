"""Testdata loaders / catalog registration.

Plays the role of the reference's table-directory + SerDe scan path
(`exec/MapOperator.java:62`, `serde2/lazy/LazySimpleSerDe.java:62`): here a
table is a parquet file (columnar like RCFile, `ql/io/RCFile.java:148`, but
with pushdown + column pruning for free) registered as a temp view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(table_path(sf_dir, name))
    return _fix_nanos_ts(df)


def _fix_nanos_ts(df: DataFrame) -> DataFrame:
    """Convert TIMESTAMP(NANOS) columns (read as long via
    ``spark.sql.legacy.parquet.nanosAsLong``) to microsecond timestamps.

    The conversion is JVM-side (`timestamp_micros(x div 1000)`) and lossless
    for the testdata generator's whole-microsecond values; the DuckDB oracle
    reads the same file natively as TIMESTAMP_NS with identical values.
    """
    from pyspark.sql import functions as F  # local import keeps module light
    from pyspark.sql.types import LongType

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table and register it as a temp view.

    Views are re-registered per call, so one SparkSession can serve queries
    against multiple scale factors sequentially (the driver does sf0.001
    smoke then sf0.01 correctness).
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = _fix_nanos_ts(spark.read.parquet(path))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
