"""Multi-dimensional data-layout operators: Z-order (Morton) clustering.

A 100 TB table is pruned at the SCAN, not the executor: parquet
min/max footer stats skip whole files, but only for columns the data is
physically clustered on. Linear sort orders cluster ONE column; a
Z-order key interleaves the bits of several, so range predicates on ANY
of the interleaved dimensions map to a bounded number of contiguous
key ranges (Morton 1966; the technique behind DataBricks/Iceberg
Z-ordering — public). The write path is then simply
``df.repartitionByRange(F.col("zkey")).sortWithinPartitions("zkey")
.write.parquet(...)`` — plain Spark, every file covering a small
rectangle of the key space in BOTH dimensions.

The reference engine's answer to multi-dim locality was static bucket
DDL (`CLUSTERED BY ... INTO n BUCKETS`, one dimension); this module is
the multi-dimensional extension a modern lakehouse layout job needs.

Everything here is exact integer arithmetic (rank normalization by
integer division, bit-twiddling interleave), so the SQL oracle
reproduces the layout bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Morton spread masks for 8-bit inputs -> 16-bit interleaved keys
# (classic bit-twiddling constants: 0x0F0F, 0x3333, 0x5555)
_SPREAD = ((4, 3855), (2, 13107), (1, 21845))


def _spread_bits(c: Column) -> Column:
    """Spread an 8-bit integer's bits to even positions of a 16-bit int
    (b7..b0 -> 0b0 b7 0 b6 ... 0 b0) via the constant-time mask chain —
    a pure projection, no UDF."""
    for shift, mask in _SPREAD:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def _spread_sql(expr: str) -> str:
    """The identical mask chain as a DuckDB SQL fragment."""
    for shift, mask in _SPREAD:
        expr = f"(({expr} | ({expr} << {shift})) & {mask})"
    return expr


def zorder_layout_stats(events: DataFrame,
                        bucket_bits: int = 4) -> DataFrame:
    """Z-order the events table on (user_id, value) and report per-file
    clustering stats: each of the 2^`bucket_bits` leading-z-bit buckets
    (one bucket ~ one file/range-partition of the layout write) with its
    row count and the min/max RANK it spans in each dimension.

    The payoff shows in the stats themselves: every bucket covers a
    narrow rank rectangle in BOTH dimensions, which is exactly what lets
    parquet footer min/max prune files for predicates on either column.

    Plan shape (asserted in tests/test_plans.py): ONE corpus scan; the
    per-dimension bounds ride in as a broadcast 1-row aggregate; rank
    normalization + bit interleave are pure projections (whole-stage
    codegen, no UDF); the only corpus-wide Exchange is the final
    O(buckets)-row map-side-combined groupBy. The layout write itself
    (`repartitionByRange(zkey)`) adds the one range shuffle any re-sort
    costs — the analysis here never pays it.
    """
    # exact integer dimension values: user_id as-is, value in cents via
    # decimal (never double*100 — fp rounding differs across engines)
    base = events.select(
        "event_id",
        F.col("user_id").alias("x"),
        (F.col("value").cast("decimal(30,2)") * 100)
        .cast("bigint").alias("y"),
    )
    bounds = base.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    withb = base.crossJoin(F.broadcast(bounds))
    # integer-division rank normalization into [0, 256)
    xi = F.expr("((x - xmin) * 256) div (xmax - xmin + 1)").alias("xi")
    yi = F.expr("((y - ymin) * 256) div (ymax - ymin + 1)").alias("yi")
    ranked = withb.select("event_id", xi, yi)
    zkey = (_spread_bits(F.col("xi"))
            .bitwiseOR(F.shiftleft(_spread_bits(F.col("yi")), 1)))
    keyed = ranked.select(
        "event_id", "xi", "yi", zkey.alias("zkey"),
        F.shiftright(zkey, 16 - bucket_bits).alias("zbucket"),
    )
    return (
        keyed.groupBy("zbucket")
        .agg(F.count("*").alias("n_events"),
             F.min("xi").alias("min_x"), F.max("xi").alias("max_x"),
             F.min("yi").alias("min_y"), F.max("yi").alias("max_y"))
    )


def zorder_oracle_sql(bucket_bits: int = 4) -> str:
    """DuckDB oracle: the identical integer rank + Morton interleave."""
    sx = _spread_sql("xi")
    sy = _spread_sql("yi")
    return f"""
    WITH base AS (
      SELECT event_id, user_id AS x,
             CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT) AS y
      FROM events
    ),
    bounds AS (
      SELECT min(x) AS xmin, max(x) AS xmax,
             min(y) AS ymin, max(y) AS ymax FROM base
    ),
    ranked AS (
      SELECT event_id,
             ((x - xmin) * 256) // (xmax - xmin + 1) AS xi,
             ((y - ymin) * 256) // (ymax - ymin + 1) AS yi
      FROM base, bounds
    ),
    keyed AS (
      SELECT event_id, xi, yi,
             ({sx} | ({sy} << 1)) AS zkey
      FROM ranked
    )
    SELECT zkey >> {16 - bucket_bits} AS zbucket,
           count(*) AS n_events,
           min(xi) AS min_x, max(xi) AS max_x,
           min(yi) AS min_y, max(yi) AS max_y
    FROM keyed GROUP BY 1
    """
