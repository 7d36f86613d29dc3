"""Join operators.

Reference semantics: reduce-side common join over tagged co-shuffled rows
(`exec/CommonJoinOperator.java:617-646` null-bitvector outer logic, semi-join
short-circuit `:673`; join kinds `plan/JoinDesc.java:34-39`), map-side
broadcast-hash join (`exec/MapJoinOperator.java:51`,
`optimizer/MapJoinProcessor.java:86`), sort-merge-bucket join
(`exec/SMBMapJoinOperator.java:51`), runtime skew join
(`optimizer/physical/SkewJoinResolver.java:47`).

Spark-first mapping: `df.join(..., how)` — Catalyst plans SortMergeJoin for
large equi-joins (the common join), BroadcastHashJoin below
`spark.sql.autoBroadcastJoinThreshold` or under an explicit `F.broadcast`
hint (the map join), and AQE converts / splits skewed partitions at runtime
(the conditional + skew-join resolvers, for free). At 100 TB the dimension
tables (region/nation/supplier) stay broadcast-able; fact-fact joins shuffle
on the join key with AQE-coalesced partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stable import dsum, revenue_sum


def join_inner(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Equi inner join lineitem ⋈ orders (fact-fact shuffle join)."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


def join_left_outer(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT OUTER with a sparse right side so NULL rows actually appear
    (null-bitvector path, `CommonJoinOperator.java:617-646`)."""
    big = orders.filter(F.col("o_orderkey") % 100 == 0)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_orderkey").alias("n_matched"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


def join_right_outer(orders: DataFrame, customer: DataFrame) -> DataFrame:
    big = orders.filter(F.col("o_orderkey") % 100 == 0)
    return (
        big.join(customer, big.o_custkey == customer.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_orderkey").alias("n_matched"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


def join_full_outer(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """FULL OUTER join of two per-nation aggregates with partially
    overlapping key ranges → NULLs on both sides."""
    c = (
        customer.filter(F.col("c_nationkey") < 15)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        supplier.filter(F.col("s_nationkey") >= 10)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.col("n_cust"),
        F.col("n_supp"),
    )


def join_left_semi(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI (existence) join — `JoinDesc.java:39`, grammar `Hive.g:1625`."""
    big = orders.filter(F.col("o_totalprice") > 300000.0)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("sum_bal"))
    )


def join_left_anti(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI — beyond 0.8 parity (reference would need NOT IN rewrite);
    free in Spark, included for completeness."""
    big = orders.filter(F.col("o_totalprice") > 300000.0)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )


def join_broadcast(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                   nation: DataFrame) -> DataFrame:
    """Explicit map-join: broadcast the dimension chain
    (`/*+ MAPJOIN */` hint, `MapJoinProcessor.java:86`) so the fact table
    never shuffles for the dimension lookup — the 100 TB-safe shape."""
    dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(revenue_sum(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"))
    )


def join_multiway(dfs: dict[str, DataFrame]) -> DataFrame:
    """Q5-style 5-way join (the flagship): fact tables shuffle-join on
    their keys, dimensions broadcast."""
    li, o, c = dfs["lineitem"], dfs["orders"], dfs["customer"]
    n, r = dfs["nation"], dfs["region"]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        .groupBy("r_name", "n_name")
        .agg(
            revenue_sum(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def join_theta(nation: DataFrame) -> DataFrame:
    """Theta join: cartesian + residual non-equi predicate
    (`joinCond` residual filters; cartesian blocked only in strict mode,
    `SemanticAnalyzer.java:4723-4725`)."""
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_name") < F.col("n2.n_name")),
        )
        .select(
            F.col("n1.n_regionkey").alias("regionkey"),
            F.col("n1.n_name").alias("name_a"),
            F.col("n2.n_name").alias("name_b"),
        )
    )


def uniquejoin_preserve(dfs: dict[str, DataFrame]) -> DataFrame:
    """UNIQUEJOIN ... PRESERVE (`Hive.g:1595-1614`, `JoinDesc.java:38`,
    `CommonJoinOperator.java:754`): multiway full-outer-style join keyed on
    one expression per alias, preserving unmatched rows from PRESERVE'd
    aliases. Composed from full-outer joins on the join key."""
    c = dfs["customer"].groupBy(F.col("c_nationkey").alias("k")).agg(F.count("*").alias("n_cust"))
    s = dfs["supplier"].groupBy(F.col("s_nationkey").alias("k")).agg(F.count("*").alias("n_supp"))
    n = dfs["nation"].filter(F.col("n_nationkey") < 20).select(
        F.col("n_nationkey").alias("k"), F.col("n_name"))
    left = c.join(s, "k", "full")
    return (
        left.join(n, "k", "full")
        .select(
            F.col("k").alias("nationkey"),
            "n_cust",
            "n_supp",
            "n_name",
        )
    )


def join_skew_split(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Hot-key split join — the compile-time face of Hive's skew join
    (`optimizer/physical/SkewJoinResolver.java:47`,
    `optimizer/physical/GenMRSkewJoinProcessor.java:107`: skewed keys go to
    side-files joined by a follow-up map-join job).

    Spark-first: AQE already splits skewed shuffle partitions at runtime;
    this operator is the *explicit* variant for catastrophic single-key skew
    that exceeds even a split partition. Plan: (1) one cheap count-by-key
    pass nominates heavy hitters (deterministic top-k: count desc, key asc);
    (2) hot keys join via broadcast of the matching orders rows (a map join
    touching only those keys); (3) the cold remainder takes the normal
    shuffle path; (4) UNION ALL. At 100 TB the hot-key list is tiny (it is a
    top-k), the broadcast side is bounded by k × rows-per-key on the *dim*
    side, and no executor ever materializes the hot key's full partition.

    The result (revenue per order priority) is split-invariant, so the SQL
    oracle is the plain join — correctness of the mechanism, not the split,
    is what's asserted.
    """
    k = 64
    # top-k is O(k) rows by construction — a driver-side literal list keeps
    # the hot/cold tagging a pure map-side filter (no extra joins/shuffles;
    # this is a k-element IN-list, not a data-sized collect)
    hot_keys = [
        r.l_orderkey
        for r in (
            lineitem.groupBy("l_orderkey")
            .agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l_orderkey"))
            .limit(k)
            .collect()
        )
    ]
    is_hot = F.col("l_orderkey").isin(hot_keys)
    ord_hot = orders.filter(F.col("o_orderkey").isin(hot_keys))
    joined_hot = lineitem.filter(is_hot).join(
        F.broadcast(ord_hot), F.col("l_orderkey") == F.col("o_orderkey"))
    joined_cold = lineitem.filter(~is_hot).join(
        orders, F.col("l_orderkey") == F.col("o_orderkey"))
    both = joined_hot.select("o_orderpriority", "l_extendedprice", "l_discount")\
        .unionAll(joined_cold.select("o_orderpriority", "l_extendedprice", "l_discount"))
    return (
        both.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            revenue_sum(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
        )
    )


def tpch_q3_variant(dfs: dict[str, DataFrame],
                    cut: str = "1998-01-01",
                    segment: str = "BUILDING") -> DataFrame:
    """TPC-H Q3 VARIANT (shipping priority): top-10 unshipped orders by
    revenue for one market segment — the canonical filter → 3-way join →
    agg → top-k composition.

    Named `_variant` because it deviates from the published spec (do NOT
    compare against published answer sets): the testdata's orders table
    has no o_shippriority column, so that output column is omitted, and
    both date predicates default to `cut`=1998-01-01 (spec: 1995-03-15)
    so the result is non-empty at every test sf. Parameterize `cut` /
    `segment` to rerun at other substitution points.

    100 TB shape: the segment filter prunes customer BEFORE its
    broadcast; both date filters push to the parquet scans; revenue
    accumulates in exact decimal (functions/stable.py); the top-10 is
    TakeOrderedAndProject with a full (revenue, date, orderkey)
    tie-break so the LIMIT is deterministic.
    """
    from ..functions.stable import revenue_sum

    li, o, c = dfs["lineitem"], dfs["orders"], dfs["customer"]
    odate = F.date_format("o_orderdate", "yyyy-MM-dd")
    return (
        li.filter(F.col("l_shipdate") > cut)
        .join(o.filter(F.col("o_orderdate") < cut),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(
            c.filter(F.col("c_mktsegment") == segment)
            .select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", odate.alias("o_orderdate"))
        .agg(revenue_sum(F.col("l_extendedprice"),
                         F.col("l_discount")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def tpch_q18_variant(dfs: dict[str, DataFrame],
                     threshold: int = 150) -> DataFrame:
    """TPC-H Q18 VARIANT (large-volume customers): the 100 largest
    orders whose total line quantity exceeds a threshold, with customer
    context — the canonical HAVING-subquery semi-join → top-k
    composition.

    Named `_variant` because the quantity threshold defaults to 150
    rather than the spec's 300 (the testdata's max per-order quantity is
    ~378, so 150 keeps the result non-empty at every test sf — do NOT
    compare against published answer sets); parameterize `threshold` to
    run the spec point. The spec's ORDER BY o_totalprice DESC,
    o_orderdate LIMIT 100 IS applied (with an o_orderkey tie-break so
    the cut is deterministic).

    100 TB shape: the qualifying-orderkey set comes from ONE map-side-
    combined groupBy over lineitem (keys only through the shuffle); it
    semi-join-filters orders BEFORE the customer join; quantity sums are
    exact decimal; the LIMIT compiles to TakeOrderedAndProject, never a
    global sort.
    """
    li, o, c = dfs["lineitem"], dfs["orders"], dfs["customer"]
    qty = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)"))
                .alias("q"))
           .filter(F.col("q") > threshold))
    return (
        o.join(qty.select("l_orderkey", "q"),
               F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )
