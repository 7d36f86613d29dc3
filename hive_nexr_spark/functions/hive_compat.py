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
    """Expose the parity functions to SQL so the SQL surface matches the
    Column API (`exec/FunctionRegistry.java` registry rows; the reference
    reaches them via `parse/FunctionSemanticAnalyzer.java`).

    * ``hive_hash_str`` — Text.hashCode parity (string form).
    * ``field``        — `FunctionRegistry.java:276`, variadic; Hive
      compares mixed types numerically (string col vs int literal →
      DOUBLE), mirrored by the numeric-fallback equality.
    * ``ewah_bitmap_and/or/empty`` — `:349-351`, javaewah-serialized
      bitmaps (see functions/ewah.py; golden-output verified).
    * ``ewah_bitmap``  — `:348`, the bitmap-building aggregate.

    ``create_union`` (`:413`) is NOT registered here: its return struct
    type depends on the argument types, which a registered UDF cannot
    express — the HiveQL facade rewrites calls to ``named_struct``
    instead (hiveql._rewrite_create_union), keeping it JVM-side.

    These are catalog/test-surface functions, not data-path hot loops —
    plain Python UDFs are acceptable (SURVEY §2.9); the engine's own
    operators never call them.
    """
    from . import ewah

    spark.udf.register(
        "hive_hash_str",
        lambda s: _py_text_hash(s),
        "int",
    )
    spark.udf.register("field", _py_field, "int")
    spark.udf.register("ewah_bitmap_and", ewah.bitmap_and, "array<bigint>")
    spark.udf.register("ewah_bitmap_or", ewah.bitmap_or, "array<bigint>")
    spark.udf.register("ewah_bitmap_empty", ewah.bitmap_empty, "boolean")
    try:
        spark.udf.register("ewah_bitmap", _make_ewah_bitmap_agg())
    except Exception:
        pass  # pandas/arrow unavailable — scalar bitmap ops still work


def _make_ewah_bitmap_agg():
    """Build the grouped-agg pandas UDF at MODULE scope: pandas_udf
    resolves the `pd.Series` type hint in the defining function's global
    namespace, so `pd` must be importable there (a function-local import
    silently breaks the hint lookup)."""
    import pandas  # noqa: F401 — must exist in module globals for hints
    globals().setdefault("pd", pandas)
    from pyspark.sql.functions import pandas_udf

    from . import ewah

    @pandas_udf("array<bigint>")
    def _ewah_bitmap_agg(positions: "pd.Series") -> list:
        # Series -> scalar type hint = grouped-agg pandas UDF
        return ewah.bitmap_from_positions(positions.dropna().tolist())

    return _ewah_bitmap_agg


def _py_field(*args) -> int:
    """field(x, a1, ...) → 1-based index of the first ai equal to x, 0 if
    none; NULL never matches (`udf_field.q` golden behavior). Mixed-type
    comparisons coerce to double, as Hive's common-comparison-type rule
    does for string-vs-numeric pairs."""
    if not args or args[0] is None:
        return 0
    x = args[0]

    def eq(a, b) -> bool:
        if b is None:
            return False
        if type(a) is type(b):
            return a == b
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False

    for i, a in enumerate(args[1:], 1):
        if eq(x, a):
            return i
    return 0


def _py_text_hash(s: str | None) -> int | None:
    if s is None:
        return None
    h = 1
    for b in s.encode("utf-8"):
        sb = b - 256 if b > 127 else b
        h = (h * 31 + sb) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h
