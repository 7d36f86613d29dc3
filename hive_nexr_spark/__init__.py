"""hive_nexr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference engine (a Hive 0.8 fork).

Architecture (SURVEY.md §7): Spark SQL / DataFrame API carries ~90% of the
semantic surface natively; this package supplies

* ``session``    — a SparkSession factory pinned to Hive-0.8-compatible
                   semantics (ANSI off, UTC, AQE on).
* ``io``         — testdata loaders / view registration.
* ``engine``     — ``HiveQLSession`` facade (dialect shim + function registry).
* ``operators``  — DataFrame builders for the operator inventory (joins,
                   aggregation, sort/distribute/cluster, sampling, union).
* ``functions``  — the Hive scalar/UDAF function surface that is not a Spark
                   builtin (hive hash parity, field, create_union, ngrams, ...).
* ``sources``    — text (ctrl-A delimited), regex-serde, partitioned/bucketed
                   parquet read/write paths.
* ``streaming``  — Structured Streaming ops over the ``events`` table.
* ``datapipe``   — large-scale training-data pipeline ops: dedup (exact,
                   minhash-LSH, simhash, n-gram jaccard), similarity search,
                   multimodal column plumbing, text analysis.
"""

__version__ = "0.1.0"
