"""Declared queries for source/sink formats (SURVEY §2.2)."""

from __future__ import annotations

from ..sources import formats as fmt
from .base import ensure_views


def _textfile_roundtrip(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.textfile_roundtrip(spark, dfs["orders"], sf_dir)


def _regex_serde(spark, sf_dir):
    dfs = ensure_views(spark, sf_dir)
    return fmt.regex_serde_extract(spark, dfs["orders"], sf_dir)


QUERIES = {
    "textfile_roundtrip": _textfile_roundtrip,
    "regex_serde_extract": _regex_serde,
}

ORACLE = {
    # both roundtrip through files on the Spark side; the oracle is the
    # same aggregate straight off the source table — lossless (de)serialization
    # is exactly what's being asserted
    "textfile_roundtrip": """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderstatus
    """,
    "regex_serde_extract": """
        SELECT o_orderpriority, count(*) AS n, max(o_orderkey) AS max_key,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderpriority
    """,
}
