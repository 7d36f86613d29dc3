"""Relational-core declared queries (SURVEY §2.1-2.8) + DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import aggregates as agg
from ..operators import joins as J
from ..operators import relational as R
from ..operators import windows as W
from .base import ensure_views, sql_query


def _bind(builder, *tables):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        dfs = ensure_views(spark, sf_dir)
        if tables == ("__all__",):
            return builder(dfs)
        return builder(*[dfs[t] for t in tables])

    run.__doc__ = builder.__doc__
    return run


QUERIES = {
    # --- scan / filter / project / limit (§2.1) ---
    "scan_project": _bind(R.scan_project, "lineitem"),
    "filter_predicate": _bind(R.filter_predicate, "lineitem"),
    "orderby_limit": _bind(R.orderby_limit, "orders"),
    "distinct_rows": _bind(R.distinct_rows, "lineitem"),
    "subquery_from": _bind(R.subquery_from, "orders"),
    # --- joins (§2.3) ---
    "join_inner": _bind(J.join_inner, "lineitem", "orders"),
    "join_left_outer": _bind(J.join_left_outer, "customer", "orders"),
    "join_right_outer": _bind(J.join_right_outer, "orders", "customer"),
    "join_full_outer": _bind(J.join_full_outer, "customer", "supplier"),
    "join_left_semi": _bind(J.join_left_semi, "customer", "orders"),
    "join_left_anti": _bind(J.join_left_anti, "customer", "orders"),
    "join_broadcast": _bind(J.join_broadcast, "lineitem", "orders", "customer", "nation"),
    "join_multiway": _bind(J.join_multiway, "__all__"),
    "tpch_q3_variant": _bind(J.tpch_q3_variant, "__all__"),
    "tpch_q18_variant": _bind(J.tpch_q18_variant, "__all__"),
    "join_theta": _bind(J.join_theta, "nation"),
    "join_skew_split": _bind(J.join_skew_split, "lineitem", "orders"),
    "uniquejoin_preserve": _bind(J.uniquejoin_preserve, "__all__"),
    # --- aggregation (§2.4) ---
    "agg_q1": _bind(agg.tpch_q1, "lineitem"),
    "agg_multi_distinct": _bind(agg.multi_distinct, "lineitem"),
    "agg_stats": _bind(agg.stats_aggregates, "lineitem"),
    "agg_minmax_collect": _bind(agg.minmax_collect, "orders"),
    "agg_salted_skew": _bind(agg.salted_groupby, "lineitem"),
    "agg_rollup": _bind(agg.grouping_rollup, "lineitem"),
    "agg_percentiles": _bind(agg.percentiles, "lineitem"),
    "agg_quantile_binned": _bind(agg.quantile_binned_sketch, "lineitem"),
    "agg_percentile_approx": _bind(agg.percentile_approx_hist, "lineitem"),
    "agg_approx_count_distinct": _bind(agg.approx_count_distinct, "lineitem"),
    "agg_histogram_bins": _bind(agg.histogram_bins, "lineitem"),
    "agg_histogram_numeric": _bind(agg.histogram_numeric_sketch, "lineitem"),
    "agg_grouping_sets": _bind(agg.grouping_sets_agg, "lineitem"),
    # --- sort / distribute / cluster / sample (§2.6, §2.8) ---
    "sort_by": _bind(R.sort_by, "lineitem"),
    "distribute_cluster_by": _bind(R.distribute_cluster_by, "lineitem"),
    "sample_bucket": _bind(R.sample_bucket, "lineitem"),
    "sample_percent": _bind(R.sample_percent, "lineitem"),
    # --- set ops (§2.7) ---
    "union_all": _bind(R.union_all, "orders"),
    "union_distinct": _bind(R.union_distinct, "orders"),
    # --- windows (§2.5 extension) ---
    "window_topk_per_group": _bind(W.topk_per_group, "customer"),
    "window_running_agg": _bind(W.running_aggregate, "orders"),
    "window_row_sequence": _bind(W.row_sequence, "nation"),
    # --- HiveQL SQL surface: having, case, string-number coercion (§7.3) ---
    "having_filter": sql_query("""
        SELECT l_suppkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_suppkey HAVING sum(l_quantity) > 5000
    """),
    "string_number_coercion": sql_query("""
        SELECT count(*) AS n, sum(o_totalprice) AS sum_price
        FROM orders WHERE CAST(o_orderkey AS STRING) = '42'
    """),
}


ORACLE = {
    "tpch_q3_variant": """
        SELECT l_orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                 AS o_orderdate,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "tpch_q18_variant": """
        WITH big AS (
          SELECT l_orderkey,
                 sum(CAST(l_quantity AS DECIMAL(30,2))) AS q
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(l_quantity AS DECIMAL(30,2))) > 150
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                 AS o_orderdate,
               o_totalprice, CAST(q AS DOUBLE) AS sum_qty
        FROM big JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
    "scan_project": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price,
               upper(l_returnflag) AS flag
        FROM lineitem
    """,
    "filter_predicate": """
        SELECT l_orderkey, l_quantity, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "orderby_limit": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "distinct_rows": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "subquery_from": """
        SELECT n_orders, count(*) AS n_cust,
               CAST(sum(CAST(cust_total AS DECIMAL(30,2))) AS DOUBLE) AS sum_total
        FROM (
          SELECT o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS cust_total,
                 count(*) AS n_orders
          FROM orders GROUP BY o_custkey
        ) t GROUP BY n_orders
    """,
    "join_inner": """
        SELECT o_orderpriority, count(*) AS n_lines, sum(l_quantity) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    "join_left_outer": """
        SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_matched,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 100 = 0) o
          ON c_custkey = o.o_custkey
        GROUP BY c_mktsegment
    """,
    "join_right_outer": """
        SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_matched,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM (SELECT * FROM orders WHERE o_orderkey % 100 = 0) o
        RIGHT JOIN customer ON o.o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "join_full_outer": """
        SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey, n_cust, n_supp
        FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
              WHERE c_nationkey < 15 GROUP BY c_nationkey) c
        FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier
              WHERE s_nationkey >= 10 GROUP BY s_nationkey) s
          ON c.c_nationkey = s.s_nationkey
    """,
    "join_left_semi": """
        SELECT c_mktsegment, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        GROUP BY c_mktsegment
    """,
    "join_left_anti": """
        SELECT c_mktsegment, count(*) AS n_cust
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        GROUP BY c_mktsegment
    """,
    "join_broadcast": """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "join_multiway": """
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY r_name, n_name
    """,
    "join_theta": """
        SELECT n1.n_regionkey AS regionkey, n1.n_name AS name_a, n2.n_name AS name_b
        FROM nation n1 JOIN nation n2
          ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
    """,
    "uniquejoin_preserve": """
        SELECT coalesce(cs.k, n.k) AS nationkey, n_cust, n_supp, n_name
        FROM (
          SELECT coalesce(c.k, s.k) AS k, n_cust, n_supp
          FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
          FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
            ON c.k = s.k
        ) cs
        FULL JOIN (SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey < 20) n
          ON cs.k = n.k
    """,
    "agg_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
                        (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
                    AS DOUBLE) AS sum_charge,
               avg(l_quantity) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
                 / count(l_extendedprice) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE)
                 / count(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "agg_multi_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS nd_part,
               count(DISTINCT l_suppkey) AS nd_supp,
               count(DISTINCT (l_partkey, l_suppkey)) AS nd_part_supp,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_stats": """
        SELECT l_returnflag,
               round(stddev_pop(l_quantity), 6) AS std_qty,
               round(stddev_samp(l_quantity), 6) AS stds_qty,
               round(var_pop(l_quantity), 6) AS varp_qty,
               round(var_samp(l_quantity), 6) AS vars_qty,
               round(covar_pop(l_quantity, l_discount), 9) AS covp,
               round(covar_samp(l_quantity, l_discount), 9) AS covs,
               round(corr(l_quantity, l_extendedprice), 9) AS corr_qp
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_minmax_collect": """
        SELECT o_orderstatus,
               min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
               min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
               min(o_orderpriority) AS min_prio,
               array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS prio_set
        FROM orders GROUP BY o_orderstatus
    """,
    "agg_salted_skew": """
        SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_rollup": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(l_quantity) AS sum_qty,
               grouping(l_returnflag) AS g_rf,
               grouping(l_linestatus) AS g_ls
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_histogram_bins": """
        SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
               CAST(floor(l_extendedprice / 5000.0) AS BIGINT) * 5000.0 + 2500.0 AS bin_center,
               count(*) AS n
        FROM lineitem GROUP BY 1
    """,
    "agg_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS n_rows,
               grouping(l_returnflag) AS g_rf,
               grouping(l_linestatus) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "join_skew_split": """
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS p50,
               quantile_cont(CAST(l_quantity AS BIGINT), 0.9) AS p90
        FROM lineitem GROUP BY l_returnflag
    """,
    # binned-histogram quantile sketch: identical two-pass construction
    # (exact min/max/n, integer bin counts, lower-edge estimate at
    # ceil(q*n)) with exact quantile_cont as the measured-error baseline
    "agg_quantile_binned": """
        WITH st AS (
          SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
                 max(CAST(l_extendedprice AS DOUBLE)) AS mx,
                 count(*) AS n
          FROM lineitem
        ),
        b AS (
          SELECT least(4095, CAST(floor(
                   (CAST(l_extendedprice AS DOUBLE) - st.mn)
                   / (st.mx - st.mn) * 4096) AS BIGINT)) AS bin
          FROM lineitem, st
        ),
        c AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
        cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM c),
        ranks AS (
          SELECT q, CAST(ceil(q * st.n) AS BIGINT) AS r, st.mn, st.mx
          FROM (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE])
                  AS q) qs, st
        ),
        est AS (
          SELECT q, mn, mx, min(bin) AS bin
          FROM ranks JOIN cum ON cum.cum >= ranks.r
          GROUP BY q, mn, mx
        ),
        ex AS (
          SELECT 0.5::DOUBLE AS q,
                 quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)
                   AS exact FROM lineitem
          UNION ALL
          SELECT 0.9::DOUBLE,
                 quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9)
          FROM lineitem
          UNION ALL
          SELECT 0.99::DOUBLE,
                 quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99)
          FROM lineitem
        )
        SELECT e.q,
               round(e.mn + e.bin * ((e.mx - e.mn) / 4096.0), 6) AS est,
               round(x.exact, 6) AS exact,
               round(abs((e.mn + e.bin * ((e.mx - e.mn) / 4096.0))
                         - x.exact), 6) AS abs_err,
               round((e.mx - e.mn) / 4096.0, 6) AS bin_width
        FROM est e JOIN ex x ON e.q = x.q
    """,
    "sort_by": "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "distribute_cluster_by": """
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "sample_bucket": """
        SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem WHERE l_orderkey % 10 = 3
        GROUP BY l_returnflag
    """,
    "union_all": """
        SELECT bucket, count(*) AS n FROM (
          SELECT o_orderkey, 'big' AS bucket FROM orders WHERE o_totalprice > 250000
          UNION ALL
          SELECT o_orderkey, 'finished' AS bucket FROM orders WHERE o_orderstatus = 'F'
        ) u GROUP BY bucket
    """,
    "union_distinct": """
        SELECT o_custkey FROM orders WHERE o_totalprice > 250000
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "window_topk_per_group": """
        SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer
        ) t WHERE rn <= 3
    """,
    "window_running_agg": """
        SELECT o_custkey, o_orderkey,
               sum(o_totalprice) OVER w AS running_total,
               lag(o_totalprice, 1) OVER w AS prev_price,
               row_number() OVER w AS seq
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "window_row_sequence": """
        SELECT row_number() OVER (ORDER BY n_nationkey) AS seq, n_nationkey, n_name
        FROM nation
    """,
    "having_filter": """
        SELECT l_suppkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_suppkey HAVING sum(l_quantity) > 5000
    """,
    "string_number_coercion": """
        SELECT count(*) AS n, sum(o_totalprice) AS sum_price
        FROM orders WHERE CAST(o_orderkey AS VARCHAR) = '42'
    """,
    # sample_percent: engine-specific row choice → rows-only check.
    # agg_percentiles note: ap50 column is approximate → excluded from oracle
    # (kept comparable by dropping it? no — oracle omits the whole query if
    # columns differ; instead percentile_approx is declared separately below).
}
