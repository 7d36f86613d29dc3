"""Event-stream operators: tumbling-window aggregation and sessionization.

Batch and streaming variants compute the same result; the batch form is the
oracle-checked query, the streaming form runs the identical aggregation
through `readStream` → memory sink (exercised here and in tests).

Scale: windowed aggregation shuffles on (window, event_type) — bounded
cardinality; sessionization shuffles on user_id. Watermarks bound state for
late data on a real stream.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import dsum


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming file source over the events table.

    The file source needs a *directory* (its basePath); `pathGlobFilter`
    narrows it to the events file. The schema is taken from a batch read of
    the same file (ts arrives as long nanos under
    `spark.sql.legacy.parquet.nanosAsLong`) and converted to a microsecond
    timestamp — same as the batch path in `io._fix_nanos_ts`.
    """
    from ..io import _fix_nanos_ts, table_path

    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(os.path.abspath(sf_dir))
    )
    return _fix_nanos_ts(stream)


def window_counts_batch(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window counts per event_type (batch form)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", 6).alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "sum_value")
    )


def window_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation as `window_counts_batch` through Structured
    Streaming: file source → watermarked tumbling window → memory sink.
    `complete` output mode so every window is emitted even when no later
    data advances the watermark past it."""
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", 6).alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "sum_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks when the gap to the
    previous event of the same user exceeds `gap_minutes`."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    marked = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > gap_s,
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
             ).alias("duration_s"),
        )
    )


def sessionize_stream(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via session_window (native stateful op)."""
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        stream.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("sw.start").alias("sess_start"), "n_events")
    )
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
