"""Streaming benchmark-DECONTAMINATION gate: arriving documents are
checked against the benchmark n-gram shingle set BEFORE admission — the
stream twin of the `pipeline_pretrain_e2e` decontaminate stage (the last
batch pipeline stage that lacked one; the GPT-3-style n-gram overlap
scrub is public, Brown et al. 2020 appendix C).

The reference has no streaming (SURVEY §2.11); batch-side its nearest
analogue is a semi-join filter.

Scale design (100 TB corpus, unbounded stream):
- The benchmark shingle set is STATIC and small (eval suites are
  megabytes at any corpus scale): it rides as one broadcast array, so
  the per-document gate is `arrays_overlap` — a pure per-row projection,
  ZERO streaming aggregation state (the `events_stream_neardup` rule).
- Per-micro-batch work is proportional to the batch: one shingle
  projection + one broadcast overlap test per row. Raw text never enters
  an Exchange.
- Emitting (doc_id, contaminated, n_shingles) rather than dropping rows
  keeps the sink append-only and auditable; the admission filter is the
  consumer's `WHERE NOT contaminated`.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe._cache import tracked_persist
from ..datapipe.curation import _shingles


def _bench_shingles(docs: DataFrame, n: int,
                    benchmark_mod: int) -> DataFrame:
    """The benchmark slice's distinct shingle set as ONE row carrying a
    sorted array — the broadcast literal of the gate (sorted only for a
    deterministic plan; `arrays_overlap` is order-blind)."""
    # collect_set replaces distinct+collect_list (r14): same sorted
    # distinct array bit-for-bit, one aggregation instead of a distinct
    # shuffle (whose reduce ran at core-count partitions) feeding a
    # second; map-side partials hold the per-partition distinct set,
    # bounded by the benchmark slice (eval suites are small at any
    # corpus scale — the module contract above)
    return (
        docs.filter(F.col("doc_id") % benchmark_mod == 0)
        .select(F.explode(_shingles(F.col("text"), n)).alias("shingle"))
        .agg(F.array_sort(F.collect_set("shingle")).alias("_bench"))
    )


def _gate(docs: DataFrame, bench: DataFrame, n: int) -> DataFrame:
    """Shared batch/stream gate: per document, does its shingle set
    overlap the broadcast benchmark set? Stateless per-row projection —
    works unchanged on a streaming `docs`."""
    return (
        docs.crossJoin(F.broadcast(bench))
        .select(
            "doc_id",
            F.arrays_overlap(_shingles(F.col("text"), n),
                             F.col("_bench")).alias("contaminated"),
            F.size(_shingles(F.col("text"), n)).alias("n_shingles"),
        )
    )


def stream_decontaminate(spark: SparkSession, sf_dir: str, n: int = 4,
                         benchmark_mod: int = 13) -> DataFrame:
    """The streaming op: document stream → broadcast-overlap gate →
    (doc_id, contaminated, n_shingles) landed in a memory sink. Exactly
    one output row per arriving document (stateless projection, no
    at-least-once duplication concern beyond the source's)."""
    from ..queries.base import ensure_views
    from .neardup import read_documents_stream

    docs = ensure_views(spark, sf_dir)["documents"]
    bench = tracked_persist(_bench_shingles(docs, n, benchmark_mod))
    stream = read_documents_stream(spark, sf_dir)
    gated = _gate(stream.select("doc_id", "text"), bench, n)
    name = f"stream_decon_{uuid.uuid4().hex[:8]}"
    q = (gated.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def decontaminate_batch_twin(spark: SparkSession, sf_dir: str, n: int = 4,
                             benchmark_mod: int = 13) -> DataFrame:
    """Identical gate over the batch documents table — the value oracle
    for the streaming path (same builder functions, batch input)."""
    from ..queries.base import ensure_views

    docs = ensure_views(spark, sf_dir)["documents"]
    bench = _bench_shingles(docs, n, benchmark_mod)
    return _gate(docs.select("doc_id", "text"), bench, n)
