"""HiveQL-0.8 dialect facade over SparkSession.

The reference compiles HiveQL (`ql/src/java/org/apache/hadoop/hive/ql/parse/Hive.g`)
through Driver.run (`ql/Driver.java:895`). Spark SQL is HiveQL's descendant,
so almost every 0.8 statement parses verbatim — verified natively supported:
multi-insert ``FROM src INSERT ... INSERT ...`` (`Hive.g:1417`),
SORT/DISTRIBUTE/CLUSTER BY (`Hive.g:1751-1773`), LATERAL VIEW
(`Hive.g:1632`), TRANSFORM ... USING (`Hive.g:1445`), ``SET k=v``
(`processors/SetProcessor.java`), DDL (`parse/DDLSemanticAnalyzer.java`).

This facade handles the few 0.8-isms Spark rejects or routes elsewhere:

* ``TABLESAMPLE(BUCKET x OUT OF y [ON cols])`` (`Hive.g:1653`,
  `parse/TableSample.java:32`) — Spark's parser refuses the ON form;
  rewritten to a ``pmod(hash_expr, y) = x-1`` filter, which is exactly the
  reference's bucket pruning semantics (`optimizer/SamplePruner.java:57`)
  expressed as a predicate (and, on a table actually bucketed by those
  cols, prunable to a file subset).
* ``TABLESAMPLE(n PERCENT)`` (`parse/SplitSample.java`) — rewritten to
  Spark's ``TABLESAMPLE (n PERCENT)`` (supported, just spelled the same —
  passthrough; kept for completeness).
* ``CREATE TEMPORARY FUNCTION name AS 'java.class'``
  (`parse/FunctionSemanticAnalyzer.java`) — the Java class can't be loaded
  in a Python engine; the class name is looked up in a registry of known
  Hive function classes and bound to our Python/Column implementation via
  ``spark.udf.register``.
* ``ADD FILE/JAR/ARCHIVE`` / ``LIST`` / ``DELETE``
  (`processors/AddResourceProcessor.java`) — FILE routes to
  ``sparkContext.addFile``; JAR/ARCHIVE are recorded and ignored (no JVM
  classes to load).

Everything else goes straight to ``spark.sql`` — by design, not omission:
Catalyst's parse→analyze→optimize pipeline replaces Driver.compile
(SURVEY.md §3.1).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

def _register_text_hash(spark: SparkSession, name: str) -> None:
    from .functions.hive_compat import _py_text_hash

    spark.udf.register(name, _py_text_hash, "int")


# Known Hive UDF classes → python registration (CREATE TEMPORARY FUNCTION).
# Each value registers the implementation under the user's chosen name.
_KNOWN_FUNCTION_CLASSES = {
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDFHash": _register_text_hash,
}

_BUCKET_SAMPLE = re.compile(
    r"(?P<kw>FROM|JOIN)\s+(?P<table>[\w.`]+)(?:\s+(?P<alias>(?!TABLESAMPLE)\w+))?"
    r"\s+TABLESAMPLE\s*\(\s*BUCKET\s+"
    r"(?P<x>\d+)\s+OUT\s+OF\s+(?P<y>\d+)(?:\s+ON\s+(?P<on>[^)]+))?\s*\)",
    re.IGNORECASE,
)

_TEMP_FUNCTION = re.compile(
    r"^\s*CREATE\s+TEMPORARY\s+FUNCTION\s+(?P<name>\w+)\s+AS\s+"
    r"'(?P<cls>[\w.]+)'\s*$",
    re.IGNORECASE,
)

_ADD_RESOURCE = re.compile(
    r"^\s*(?P<verb>ADD|LIST|DELETE)\s+(?P<kind>FILE|JAR|ARCHIVE)S?\b(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)


class HiveQLSession:
    """Drop-in `sql()` entry point with Hive-0.8 dialect compatibility.

    >>> hql = HiveQLSession(spark)
    >>> hql.sql("SELECT * FROM lineitem TABLESAMPLE(BUCKET 4 OUT OF 10 ON l_orderkey)")
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.resources: list[tuple[str, str]] = []

    # -- public --------------------------------------------------------

    def sql(self, statement: str) -> DataFrame | None:
        """Run one HiveQL statement; returns a DataFrame for queries,
        None for session commands handled locally."""
        stmt = statement.strip().rstrip(";")

        m = _TEMP_FUNCTION.match(stmt)
        if m:
            self._create_temp_function(m.group("name"), m.group("cls"))
            return None

        m = _ADD_RESOURCE.match(stmt)
        if m:
            return self._resource_cmd(
                m.group("verb").upper(), m.group("kind").upper(), m.group("rest").strip()
            )

        return self.spark.sql(self._rewrite(stmt))

    # -- rewrites ------------------------------------------------------

    def _rewrite(self, stmt: str) -> str:
        return _BUCKET_SAMPLE.sub(self._rewrite_bucket_sample, stmt)

    @staticmethod
    def _rewrite_bucket_sample(m: re.Match) -> str:
        kw = m.group("kw")
        table, alias = m.group("table"), m.group("alias") or m.group("table").strip("`")
        x, y, on = int(m.group("x")), int(m.group("y")), m.group("on")
        if on is None:
            # BUCKET sampling without ON means "by the table's bucket files";
            # on unbucketed parquet the reference falls back to rand() — we
            # use a deterministic spread over an internal row id instead.
            cond = f"pmod(monotonically_increasing_id(), {y}) = {x - 1}"
        else:
            # Hive buckets by hash(cols) % y; for ints hash = value
            # (`ObjectInspectorUtils.hashCode`), matching pmod directly.
            cols = ", ".join(c.strip() for c in on.split(","))
            expr = cols if "," not in on else f"hash({cols})"
            cond = f"pmod({expr}, {y}) = {x - 1}"
        return f"{kw} (SELECT * FROM {table} WHERE {cond}) {alias}"

    # -- session commands ----------------------------------------------

    def _create_temp_function(self, name: str, cls: str) -> None:
        factory = _KNOWN_FUNCTION_CLASSES.get(cls)
        if factory is None:
            raise ValueError(
                f"unknown function class {cls!r}: JVM UDF classes cannot be "
                "loaded in a Python engine; add a mapping in "
                "hiveql._KNOWN_FUNCTION_CLASSES or register via "
                "spark.udf.register directly"
            )
        factory(self.spark, name)

    def _resource_cmd(self, verb: str, kind: str, rest: str) -> DataFrame | None:
        if verb == "ADD":
            if kind == "FILE" and rest:
                self.spark.sparkContext.addFile(rest)
            self.resources.append((kind, rest))
            return None
        if verb == "LIST":
            rows = [(k, r) for k, r in self.resources if k == kind]
            return self.spark.createDataFrame(rows or [(kind, "")], ["kind", "resource"])
        self.resources = [(k, r) for k, r in self.resources if not (k == kind and r == rest)]
        return None
