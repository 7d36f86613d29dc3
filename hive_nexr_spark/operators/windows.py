"""Window functions — absent in the reference (Hive gained OVER in 0.11;
SURVEY §2.5: only contrib `UDFRowSequence.java:32` exists as a stateful row
counter). Free in Spark; exposed as engine extensions, plus the row_sequence
parity shim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(customer: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group via ranked window — the scalable top-k idiom (no
    global sort; each group ranks inside its shuffle partition)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


def running_aggregate(orders: DataFrame) -> DataFrame:
    """Running sum + lag/lead over an ordered per-key frame."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("running_total"),
            F.lag("o_totalprice", 1).over(w).alias("prev_price"),
            F.row_number().over(w).alias("seq"),
        )
    )


def row_sequence(nation: DataFrame) -> DataFrame:
    """Parity for contrib UDFRowSequence (`contrib/.../UDFRowSequence.java:32`):
    a deterministic row number. The reference's version numbers rows in task
    order (non-deterministic across runs); we expose the deterministic form
    over an explicit total order.

    The unpartitioned window forces a single-partition sort — acceptable
    ONLY because nation is a 25-row dimension; for a large input, assign
    global sequence numbers with zipWithIndex-style arithmetic
    (per-partition row_number + partition offset) instead."""
    w = Window.orderBy("n_nationkey")
    return nation.select(
        F.row_number().over(w).alias("seq"), "n_nationkey", "n_name"
    )


def moving_average_range_frame(events: DataFrame,
                               days: int = 7) -> DataFrame:
    """Time-series moving aggregate with a RANGE frame: per user, the
    trailing `days`-day mean and count of daily event-value sums —
    RANGE BETWEEN (days-1) PRECEDING AND CURRENT ROW over epoch-day
    ordering, the physical shape rows-frames cannot express when days
    are sparse (a ROWS frame would span calendar gaps).

    Output: (user_id, day, day_sum, trail_n_days, trail_avg) with day a
    STRING and day_sum/trail_avg from exact decimal accumulation.

    100 TB shape: the daily pre-aggregation reduces the corpus to
    O(users x days) BEFORE the window (map-side combined), and the
    window partitions by user_id — per-user state only, no global sort.
    """
    from pyspark.sql import Window

    day_str = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    daily = (
        events.groupBy("user_id", day_str.alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("s"))
        .select("user_id", "day",
                F.datediff(F.col("day").cast("date"),
                           F.lit("1970-01-01").cast("date"))
                .alias("epoch_day"),
                "s")
    )
    w = (Window.partitionBy("user_id").orderBy("epoch_day")
         .rangeBetween(-(days - 1), 0))
    return daily.select(
        "user_id", "day",
        F.col("s").cast("double").alias("day_sum"),
        F.count("*").over(w).cast("int").alias("trail_n_days"),
        # cast the exact decimal sum to double BEFORE dividing — decimal
        # division scale rules differ between engines, double/int doesn't
        F.round(F.sum("s").over(w).cast("double")
                / F.count("*").over(w), 6).alias("trail_avg"),
    )
