"""Snapshot / time-travel table lifecycle (Iceberg-style, minimal).

The lakehouse pattern behind `SELECT ... AS OF <version>`: every commit
writes an IMMUTABLE data directory plus a manifest that lists ALL data
directories visible at that version — readers resolve a version by
reading its manifest and scanning exactly the listed directories, so
old versions stay readable after appends (append = new delta dir + new
manifest; no rewrite of existing data). The reference era's nearest
analogue is INSERT OVERWRITE into a dated partition; the manifest
indirection is what makes point-in-time reads cheap and atomic.

The engine mechanics are real: manifests are JSON files on disk, delta
dirs are parquet, readers use `spark.read.parquet(*dirs)` over the
manifest's list. Only the catalog (a scratch dir instead of a metastore
table-property chain) is simplified.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _commit(base: str, version: int, new_dir: str | None) -> list[str]:
    """Append-only commit: manifest v<N> = v<N-1> dirs + the new delta
    dir. Returns the committed dir list."""
    prev: list[str] = []
    if version > 1:
        with open(os.path.join(base, f"v{version - 1}.json")) as fh:
            prev = json.load(fh)["dirs"]
    dirs = prev + ([new_dir] if new_dir else [])
    with open(os.path.join(base, f"v{version}.json"), "w") as fh:
        json.dump({"version": version, "dirs": dirs}, fh)
    return dirs


def read_version(spark: SparkSession, base: str, version: int) -> DataFrame:
    """`AS OF` read: scan exactly the manifest's directory list."""
    with open(os.path.join(base, f"v{version}.json")) as fh:
        dirs = json.load(fh)["dirs"]
    return spark.read.parquet(*dirs)


def time_travel_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 2-version snapshot table from orders (v1 = the
    o_orderkey % 3 != 0 slice; v2 = v1 + the remaining slice appended as
    a DELTA dir — v1's files untouched), then time-travel-read BOTH
    versions and report (version, n_rows, sum_totalprice) each — the
    check that old snapshots survive appends bit-for-bit.

    The oracle recomputes both versions from the slice predicates
    directly; any mutation of v1 data during the v2 commit would break
    the v1 row.
    """
    from ..scratch import process_scratch_dir

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    base = process_scratch_dir("snap")
    os.makedirs(base, exist_ok=True)

    v1_dir = os.path.join(base, "data_v1")
    orders.filter(F.col("o_orderkey") % 3 != 0).write.parquet(v1_dir)
    _commit(base, 1, v1_dir)

    delta_dir = os.path.join(base, "data_v2_delta")
    orders.filter(F.col("o_orderkey") % 3 == 0).write.parquet(delta_dir)
    _commit(base, 2, delta_dir)

    def stats(version: int) -> DataFrame:
        return read_version(spark, base, version).agg(
            F.lit(version).alias("version"),
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double").alias("sum_totalprice"),
        ).select("version", "n_rows", "sum_totalprice")

    return stats(1).unionByName(stats(2))
