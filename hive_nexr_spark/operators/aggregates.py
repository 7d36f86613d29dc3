"""Aggregation operators.

Reference: `exec/GroupByOperator.java:66` (hash + sort modes, partial/final
`:103-111`, memory-pressure flush `:828-844,899`), UDAF library registered in
`exec/FunctionRegistry.java:377-403`, skewed 2-MR plan
(`SemanticAnalyzer.java:3293` genGroupByPlan2MR).

Spark-first mapping: `groupBy().agg()` — Catalyst always plans partial
(map-side combine) + final HashAggregate, which is the reference's
PARTIAL1/FINAL mode pair for free; spills are handled by
UnsafeExternalSorter. At 100 TB the only extra care is key skew, which AQE
handles, and which `salted_groupby` demonstrates explicitly as the manual
fallback (the reference's `hive.groupby.skewindata` two-stage plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.stable import charge_sum, dmean, dsum, revenue_sum


def tpch_q1(lineitem: DataFrame) -> DataFrame:
    """Pricing-summary aggregate: 2 group cols × 8 aggregates
    (sum/avg/count — `GenericUDAFSum.java:41`, `GenericUDAFAverage.java:48`,
    `GenericUDAFCount.java:44`)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            revenue_sum(F.col("l_extendedprice"), F.col("l_discount")).alias("sum_disc_price"),
            charge_sum(
                F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            dmean("l_extendedprice").alias("avg_price"),
            dmean("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def multi_distinct(lineitem: DataFrame) -> DataFrame:
    """Multiple DISTINCT aggregates in one group-by
    (`SemanticAnalyzer.java:2533` distinct-field union plan)."""
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_part"),
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.countDistinct("l_partkey", "l_suppkey").alias("nd_part_supp"),
        F.count("*").alias("n_rows"),
    )


def stats_aggregates(lineitem: DataFrame) -> DataFrame:
    """Statistical UDAFs (`GenericUDAFStd/Variance/Covariance/Correlation`,
    registry :384-393). Results rounded: Spark and any oracle use different
    single-pass variance algorithms, identical only to ~1e-12 relative."""
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_pop("l_quantity"), 6).alias("std_qty"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("stds_qty"),
            F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("vars_qty"),
            F.round(F.covar_pop("l_quantity", "l_discount"), 9).alias("covp"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 9).alias("covs"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 9).alias("corr_qp"),
        )
    )


def minmax_collect(orders: DataFrame) -> DataFrame:
    """min/max over numeric/string/timestamp + collect_set
    (`GenericUDAFMax/Min`, `GenericUDAFCollectSet.java:41`). collect_set is
    order-insensitive; serialize sorted to a string for stable comparison."""
    return orders.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.min("o_orderpriority").alias("min_prio"),
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("prio_set"),
    )


def salted_groupby(lineitem: DataFrame) -> DataFrame:
    """Skew-resistant two-stage aggregation: stage 1 aggregates on
    (key, salt) — spreading a hot key over N reducers — stage 2 merges
    partials. This is `hive.groupby.skewindata`'s 2-MR plan
    (`SemanticAnalyzer.java:3293`) expressed as two groupBys; on Spark, AQE
    usually makes this unnecessary, but it is the manual pattern for
    pathological keys at 100 TB. Result is identical to a plain groupBy."""
    salted = lineitem.withColumn("_salt", (F.col("l_orderkey") % 8).cast("int"))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum("l_quantity").alias("_sum_qty"),
        F.count("*").alias("_cnt"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("_sum_qty").alias("sum_qty"),
            F.sum("_cnt").alias("n_rows"),
        )
    )


def grouping_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP with grouping() — absent in Hive 0.8 (SURVEY §2.4), free in
    Spark; exposed as an extension."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "g_rf",
            "g_ls",
        )
    )


def percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact percentile over integer input (`udf/UDAFPercentile.java:44`) —
    linear interpolation at (n-1)*p, the percentile_cont definition Hive,
    Spark, and DuckDB share."""
    q = F.col("l_quantity").cast("long")
    return lineitem.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.5)).alias("p50"),
        F.percentile(q, F.lit(0.9)).alias("p90"),
    )


def percentile_approx_hist(lineitem: DataFrame) -> DataFrame:
    """Approximate percentile + histogram_numeric — the reference's
    Ben-Haim/Tom-Tov streaming histogram (`GenericUDAFPercentileApprox.java:70`,
    `NumericHistogram.java:35,128-146`). Approximation is engine-specific →
    no SQL oracle (rows-only); correctness is bounded-error by construction.
    histogram_numeric's struct array is serialized to a string for a stable
    schema."""
    return lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("ap99"),
        F.expr(
            "aggregate(histogram_numeric(l_quantity, 5), '', (s, x) -> s || round(x.x, 2) || ':' || x.y || ';')"
        ).alias("hist"),
    )


def quantile_binned_sketch(lineitem: DataFrame,
                           qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                           nbins: int = 4096) -> DataFrame:
    """PORTABLE approximate quantiles via a fixed-bin histogram sketch —
    the hash-verified member of the approximate-percentile family, the
    upgrade `agg_hll_portable` gave approximate distincts: unlike
    `percentile_approx` (Ben-Haim/Tom-Tov, engine-specific merge order →
    rows-only check), every number here reproduces bit-for-bit in the
    SQL oracle. Two passes: (1) exact (min, max, n) one-row aggregate,
    broadcast; (2) integer per-bin counts — a LINEAR sketch (shards/
    micro-batches merge by cell addition, the Count-Min property) with
    state bounded by `nbins` regardless of data size. The q-quantile
    estimate is the lower edge of the bin where the cumulative count
    crosses ceil(q·n); its error is bounded by one bin width
    (range/nbins) BY CONSTRUCTION, and the output carries the MEASURED
    |est − exact| per q against the exact interpolated percentile (the
    established `agg_percentiles` parity surface) — the evaluation
    harness, bounded cost, like the ANN recall columns.

    Output: (q, est, exact, abs_err, bin_width), one row per quantile.

    100 TB shape: two corpus scans (both map-side combined: a 1-row
    min/max/count and a ≤nbins-row bin count), a ≤nbins-row window on
    the driver-scale bin table, broadcast stats everywhere; the exact
    baseline is one JVM percentile aggregate kept for the error
    measurement — drop it and the sketch alone is strictly two cheap
    passes. Degenerate range (mx == mn) is the caller's precondition."""
    x = F.col("l_extendedprice").cast("double")
    stats = lineitem.agg(F.min(x).alias("mn"), F.max(x).alias("mx"),
                         F.count(x).alias("n"))
    binned = (
        lineitem.crossJoin(F.broadcast(stats))
        .select(F.least(
            F.lit(nbins - 1),
            F.floor((x - F.col("mn")) / (F.col("mx") - F.col("mn"))
                    * nbins)).cast("bigint").alias("bin"))
    )
    counts = binned.groupBy("bin").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("c").over(wcum))
    qrows = stats.select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        "mn", "mx", "n",
    ).select("q", "mn", "mx",
             F.ceil(F.col("q") * F.col("n")).cast("bigint").alias("r"))
    width = (F.col("mx") - F.col("mn")) / F.lit(float(nbins))
    est = (
        qrows.join(F.broadcast(cum), F.col("cum") >= F.col("r"))
        .groupBy("q", "mn", "mx")
        .agg(F.min("bin").alias("bin"))
        .select("q", (F.col("mn") + F.col("bin") * width).alias("est"),
                width.alias("bin_width"))
    )
    exact_row = lineitem.agg(*[
        F.percentile(x, F.lit(float(q))).alias(f"e{i}")
        for i, q in enumerate(qs)])
    exact = exact_row.select(F.explode(F.array(*[
        F.struct(F.lit(float(q)).alias("q"),
                 F.col(f"e{i}").alias("exact"))
        for i, q in enumerate(qs)])).alias("s")).select("s.q", "s.exact")
    return (
        est.join(F.broadcast(exact), "q")
        .select("q", F.round("est", 6).alias("est"),
                F.round("exact", 6).alias("exact"),
                F.round(F.abs(F.col("est") - F.col("exact")), 6)
                .alias("abs_err"),
                F.round("bin_width", 6).alias("bin_width"))
    )


def top_ngrams(documents: DataFrame, n: int = 2, k: int = 10) -> DataFrame:
    """ngrams(sentences(text), n, k) parity (`GenericUDAFnGrams.java:63` +
    `NGramEstimator.java`): top-k word n-grams by frequency.

    The reference estimates under memory pressure; at Spark scale the exact
    computation is a flat explode → count → top-k, all shuffle-parallel
    (no driver-side state), so we compute exactly. Ties broken on the gram
    text for determinism.

    The top-k is orderBy().limit(k) — planned as TakeOrderedAndProject,
    which keeps a k-row heap per partition and merges on the driver. A
    row_number window over *all* distinct grams would funnel the entire
    distinct-gram space (billions of rows on a 100 TB corpus) through a
    single WindowExec partition; the window here runs only over the k
    surviving rows to assign ranks."""
    from pyspark.sql import Window

    # tokens materialized as a column so the lambda slices a bound array —
    # split() inlined into the lambda would re-tokenize per gram position
    grams = documents.select(
        F.split(F.lower(F.col("text")), " ").alias("toks")
    ).select(
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(toks) - {n - 1}, 1)), "
                f"i -> concat_ws(' ', slice(toks, i, {n})))"
            )
        ).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("freq"))
    topk = counts.orderBy(F.col("freq").desc(), F.col("gram")).limit(k)
    w = Window.orderBy(F.col("freq").desc(), F.col("gram"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "gram", "freq", "rank"
    )


def context_ngrams(documents: DataFrame, context: str = "the", k: int = 10) -> DataFrame:
    """context_ngrams(sentences(text), array('the', null), k) parity
    (`GenericUDAFContextNGrams.java`): top-k words following a context
    token (null = wildcard slot). Top-k via orderBy().limit(k)
    (TakeOrderedAndProject) — see top_ngrams for why a global row_number
    window would not survive a 100 TB corpus."""
    from pyspark.sql import Window

    pairs = documents.select(
        F.split(F.lower(F.col("text")), " ").alias("toks")
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 1)), "
                "i -> struct(element_at(toks, i) AS w1, "
                "element_at(toks, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = (
        pairs.filter((F.col("w1") == context) & F.col("w2").isNotNull())
        .groupBy("w2")
        .agg(F.count("*").alias("freq"))
    )
    topk = counts.orderBy(F.col("freq").desc(), F.col("w2")).limit(k)
    w = Window.orderBy(F.col("freq").desc(), F.col("w2"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("w2").alias("gram"), "freq", "rank"
    )


def approx_count_distinct(lineitem: DataFrame) -> DataFrame:
    """HyperLogLog++ distinct estimate — absent in 0.8 (SURVEY §2.4), the
    scale path for 100 TB cardinality estimation. No oracle (estimator is
    engine-specific); exactness tested against countDistinct in unit tests."""
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_nd_part"),
        F.count("*").alias("n_rows"),
    )


def histogram_bins(lineitem: DataFrame) -> DataFrame:
    """Deterministic fixed-width histogram — the SQL-exact face of Hive's
    `histogram_numeric` (`GenericUDAFHistogramNumeric.java:65`). The
    Ben-Haim/Tom-Tov sketch is merge-order-dependent, so the portable
    equivalent is fixed bins: a single shuffle on ~O(bins) keys, fully
    map-side-combined — at 100 TB this aggregates to a handful of rows."""
    bucket = F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("long")
    return (
        lineitem.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 5000.0 + 2500.0).alias("bin_center"),
            "n",
        )
    )


def histogram_numeric_sketch(lineitem: DataFrame) -> DataFrame:
    """Hive's actual `histogram_numeric` (Ben-Haim & Tom-Tov streaming
    histogram, `NumericHistogram.java:35`, merge at `:128-146`) via the
    Spark builtin of the same name. Bin placement is merge-order-dependent
    by construction, hence no SQL oracle (rows-only check): the estimator's
    contract is approximate. Exposed for parity with registry line
    `FunctionRegistry.java:394`."""
    return (
        lineitem.groupBy("l_returnflag")
        .agg(F.expr("histogram_numeric(l_quantity, 10)").alias("hist"))
        .select(
            "l_returnflag",
            F.explode("hist").alias("bin"),
        )
        .select("l_returnflag", F.col("bin.x").alias("x"), F.col("bin.y").alias("y"))
    )


def grouping_sets_agg(lineitem: DataFrame) -> DataFrame:
    """GROUPING SETS ((rf,ls),(rf),()) — generalization of the ROLLUP
    extension (absent in Hive 0.8, SURVEY §2.4; Hive gained it in 0.10).
    Catalyst expands to a single Expand+HashAggregate: one shuffle, not one
    job per set (the Hive-era equivalent was N UNION ALL scans)."""
    return (
        lineitem.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.grouping("l_returnflag").alias("g_rf"),
            F.grouping("l_linestatus").alias("g_ls"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
            "g_rf",
            "g_ls",
        )
    )
