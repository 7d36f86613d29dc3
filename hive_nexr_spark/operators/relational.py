"""Core relational operators: scan / filter / project / limit / distinct /
union / sort / distribute / cluster / sample.

Reference: `exec/TableScanOperator.java:50`, `exec/FilterOperator.java:35`,
`exec/SelectOperator.java:34`, `exec/LimitOperator.java:31`,
`exec/UnionOperator.java:38`, `exec/ReduceSinkOperator.java:52` (SORT BY /
DISTRIBUTE BY / CLUSTER BY key+partition evaluators `:61-111`),
`parse/TableSample.java:32` + `optimizer/SamplePruner.java:57`.

Spark-first: all of these are single DataFrame combinators whose physical
form (pushed filters, pruned columns, TakeOrderedAndProject for top-k,
range-partitioned parallel ORDER BY instead of Hive's 1-reducer total sort)
is strictly better than the reference's MR plans at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stable import dsum


def scan_project(lineitem: DataFrame) -> DataFrame:
    """Projection with expressions — column pruning reaches the parquet scan
    (ReadSchema contains only the 4 referenced columns)."""
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.upper("l_returnflag").alias("flag"),
    )


def filter_predicate(lineitem: DataFrame) -> DataFrame:
    """Conjunctive/disjunctive predicates — pushed to the parquet reader
    (PushedFilters in the scan node)."""
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")


def orderby_limit(orders: DataFrame) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (no global single-reducer
    sort; the reference forces numReducers=1, `SemanticAnalyzer.java:3137`).
    Tie-broken on the unique key so the row set is deterministic."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


def distinct_rows(lineitem: DataFrame) -> DataFrame:
    return lineitem.select("l_returnflag", "l_linestatus").distinct()


def union_all(orders: DataFrame) -> DataFrame:
    """UNION ALL (`Hive.g:1334`, positional schema reconciliation
    `UnionOperator.java:38`) — duplicates preserved."""
    a = orders.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", F.lit("big").alias("bucket"))
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("finished").alias("bucket"))
    return a.unionAll(b).groupBy("bucket").agg(F.count("*").alias("n"))


def union_distinct(orders: DataFrame) -> DataFrame:
    """UNION DISTINCT — absent in 0.8 (only UNION ALL); Spark extension."""
    a = orders.filter(F.col("o_totalprice") > 250000).select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.union(b).distinct()


def sort_by(lineitem: DataFrame) -> DataFrame:
    """SORT BY — per-partition order only (ReduceSink keyEval
    `ReduceSinkOperator.java:61`); content equals the plain projection, which
    is what an order-insensitive comparison checks."""
    return (
        lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
        .sortWithinPartitions("l_quantity")
    )


def distribute_cluster_by(lineitem: DataFrame) -> DataFrame:
    """DISTRIBUTE BY hash-partitions on the expression
    (`ReduceSinkOperator.java:72` partitionEval); CLUSTER BY adds the
    partition-local sort. Content is partition-invariant."""
    return (
        lineitem.repartition(F.col("l_returnflag"))
        .sortWithinPartitions("l_returnflag", "l_orderkey")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price"))
    )


def sample_bucket(lineitem: DataFrame) -> DataFrame:
    """TABLESAMPLE(BUCKET 4 OUT OF 10 ON l_orderkey) (`Hive.g:1653`,
    `TableSample.java:32`): deterministic modulus filter on the bucketing
    expression — the same rows any engine selects."""
    return (
        lineitem.filter(F.pmod(F.col("l_orderkey"), F.lit(10)) == 3)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )


def sample_percent(lineitem: DataFrame) -> DataFrame:
    """TABLESAMPLE(n PERCENT) (`parse/SplitSample.java`) → Bernoulli
    `df.sample`; seeded but engine-specific row choice → no SQL oracle
    (driver rows-only check)."""
    return (
        lineitem.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )


def subquery_from(orders: DataFrame) -> DataFrame:
    """Subquery in FROM — the only subquery form Hive 0.8 supports
    (`Hive.g` subQuerySource)."""
    per_cust = orders.groupBy("o_custkey").agg(
        dsum("o_totalprice").alias("cust_total"),
        F.count("*").alias("n_orders"),
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_cust"),
        dsum("cust_total").alias("sum_total"),
    )
