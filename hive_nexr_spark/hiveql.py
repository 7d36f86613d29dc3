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
* ``LOAD DATA [LOCAL] INPATH '...' [OVERWRITE] INTO TABLE t``
  (`parse/LoadSemanticAnalyzer.java`, grammar `Hive.g:302`) — Spark SQL
  only supports the statement for Hive-serde tables (absent without a Hive
  metastore), so the facade implements the reference's actual semantics —
  a file-level move into the table directory with NO data parsing
  (`LoadSemanticAnalyzer.java` plans a MoveTask) — as copy-into-location +
  ``REFRESH TABLE``.
* ``ALTER TABLE t CONCATENATE`` (`ql/io/rcfile/merge/BlockMergeTask.java`)
  — small-file compaction: rewrite the table's files at a target block
  size and swap them in, preserving content byte-for-byte.

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

_LOAD_DATA = re.compile(
    r"^\s*LOAD\s+DATA\s+(?P<local>LOCAL\s+)?INPATH\s+"
    r"'(?P<path>[^']+)'\s+(?P<overwrite>OVERWRITE\s+)?INTO\s+TABLE\s+"
    r"(?P<table>[\w.`]+)\s*$",
    re.IGNORECASE,
)

_CONCATENATE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+CONCATENATE\s*$",
    re.IGNORECASE,
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

        m = _LOAD_DATA.match(stmt)
        if m:
            self._load_data(
                m.group("path"), m.group("table"), bool(m.group("overwrite"))
            )
            return None

        m = _CONCATENATE.match(stmt)
        if m:
            self._concatenate(m.group("table"))
            return None

        return self.spark.sql(self._rewrite(stmt))

    # -- rewrites ------------------------------------------------------

    def _rewrite(self, stmt: str) -> str:
        return _BUCKET_SAMPLE.sub(self._rewrite_bucket_sample, stmt)

    def _rewrite_bucket_sample(self, m: re.Match) -> str:
        kw = m.group("kw")
        table, alias = m.group("table"), m.group("alias") or m.group("table").strip("`")
        x, y, on = int(m.group("x")), int(m.group("y")), m.group("on")
        if on is None:
            # BUCKET sampling without ON means "by the table's bucket files";
            # on unbucketed parquet the reference falls back to rand() — we
            # use a deterministic spread over an internal row id instead.
            # CAVEAT: monotonically_increasing_id is layout-stable only —
            # the selected subset is deterministic for a fixed file layout
            # and partition count, but changes if either does. That matches
            # the reference's contract (its file-offset sampling is equally
            # layout-dependent) without rand()'s run-to-run instability.
            cond = f"pmod(monotonically_increasing_id(), {y}) = {x - 1}"
        else:
            # Hive buckets rows by (hashCode(cols) & Integer.MAX_VALUE) % y
            # (`ObjectInspectorUtils.getBucketHashCode`), where the combined
            # hash folds h = h*31 + hashCode(col_i) in 32-bit int arithmetic.
            # Emit the exact per-type Java hashCode as a SQL expression
            # (bigint accumulator wrapped mod 2^32, so it is ANSI-safe and
            # identical to int32 overflow), instead of Spark's murmur3
            # hash() which would select a different row subset.
            cols = [c.strip() for c in on.split(",")]
            h = "0"
            for c in cols:
                h = f"pmod(({h}) * 31 + ({self._java_hash_sql(table, c)}), 4294967296)"
            cond = f"pmod(({h}) & 2147483647, {y}) = {x - 1}"
        return f"{kw} (SELECT * FROM {table} WHERE {cond}) {alias}"

    def _java_hash_sql(self, table: str, col: str) -> str:
        """SQL expression for Java/Hive hashCode of one column, by type
        (`serde2/objectinspector/ObjectInspectorUtils.java` hashCode):
        int → value; bigint → (int)(v ^ v>>>32); boolean → 1231/1237;
        string → Text.hashCode (h=31h+byte, seed 1). All emitted on a
        BIGINT accumulator (the caller wraps mod 2^32), so the expression
        is exact on ANSI sessions. Unsupported types are rejected loudly
        rather than silently sampling the wrong rows."""
        dtypes = dict(self.spark.table(table.strip("`")).dtypes)
        typ = dtypes.get(col)
        if typ is None:
            raise ValueError(f"TABLESAMPLE ON column {col!r} not in {table}")
        if typ in ("tinyint", "smallint", "int"):
            return f"cast({col} as bigint)"
        if typ == "bigint":
            return f"(cast({col} as bigint) ^ shiftrightunsigned(cast({col} as bigint), 32))"
        if typ == "boolean":
            return f"if({col}, 1231, 1237)"
        if typ == "string":
            return (
                f"aggregate(filter(split({col}, ''), x -> x != ''), "
                f"cast(1 as bigint), "
                f"(acc, ch) -> pmod(acc * 31 + ascii(ch), 4294967296))"
            )
        raise ValueError(
            f"TABLESAMPLE ON column {col!r} of type {typ!r} is not supported "
            "(reference buckets on primitive/string keys; add the Java "
            "hashCode for this type to _java_hash_sql)"
        )

    # -- data movement commands ----------------------------------------

    def _table_location(self, table: str) -> str:
        rows = self.spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        for r in rows:
            if (r.col_name or "").strip() == "Location":
                loc = r.data_type.strip()
                if loc.startswith("file:"):
                    loc = loc[len("file:"):]
                return loc
        raise ValueError(f"no Location in DESCRIBE FORMATTED {table}")

    def _load_data(self, path: str, table: str, overwrite: bool) -> None:
        """LOAD DATA [LOCAL] INPATH (`parse/LoadSemanticAnalyzer.java`,
        `Hive.g:302`): a *file-level* move into the table directory — the
        reference plans a MoveTask and never parses the data. Implemented
        as copy (non-destructive to the source) + REFRESH so Spark's file
        index picks up the new files. OVERWRITE clears existing data files
        first, as the reference does. The loaded files must match the
        table's storage format — same contract as Hive."""
        import os
        import shutil
        import uuid

        loc = self._table_location(table)
        os.makedirs(loc, exist_ok=True)
        if overwrite:
            for f in os.listdir(loc):
                fp = os.path.join(loc, f)
                if os.path.isfile(fp):
                    os.remove(fp)
                else:
                    shutil.rmtree(fp)
        src = path[len("file:"):] if path.startswith("file:") else path
        files = (
            [os.path.join(src, f) for f in sorted(os.listdir(src))
             if not f.startswith(("_", "."))]
            if os.path.isdir(src) else [src]
        )
        for f in files:
            # unique target names: LOAD must append alongside files already
            # in the table, never silently replace same-named ones
            base = os.path.basename(f)
            shutil.copy2(f, os.path.join(loc, f"load_{uuid.uuid4().hex[:8]}_{base}"))
        self.spark.sql(f"REFRESH TABLE {table}")

    def _concatenate(self, table: str) -> None:
        """ALTER TABLE ... CONCATENATE (`ql/io/rcfile/merge/BlockMergeTask.java`):
        small-file compaction. Rewrites the table's data files coalesced to
        ~128 MB targets into a staging dir, then swaps them in — the same
        rewrite-and-move the reference's merge task performs. Content is
        preserved exactly; only the file layout changes."""
        import math
        import os
        import shutil

        loc = self._table_location(table)
        files = [
            os.path.join(loc, f) for f in os.listdir(loc)
            if os.path.isfile(os.path.join(loc, f)) and not f.startswith(("_", "."))
        ]
        total = sum(os.path.getsize(f) for f in files)
        target = max(1, math.ceil(total / (128 * 1024 * 1024)))
        if len(files) <= target:
            return
        staging = loc.rstrip("/") + "_concat_staging"
        shutil.rmtree(staging, ignore_errors=True)
        # read via the files (not the catalog table) so the rewrite cannot
        # observe its own half-swapped output
        self.spark.read.parquet(loc).coalesce(target).write.mode(
            "overwrite"
        ).parquet(staging)
        for f in files:
            os.remove(f)
        for f in os.listdir(staging):
            if not f.startswith(("_", ".")):
                shutil.move(os.path.join(staging, f), os.path.join(loc, f))
        shutil.rmtree(staging, ignore_errors=True)
        self.spark.sql(f"REFRESH TABLE {table}")

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
