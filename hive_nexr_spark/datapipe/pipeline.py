"""End-to-end pretraining-data pipeline composed as ONE lazy Spark plan.

The individual stages — C4-style quality/language cleaning, exact
dedup, GPT-3-style n-gram decontamination, concat-and-chunk sequence
packing — each exist as standalone declared operators. A production run
executes them as one job, and the composition is where the 100 TB
shuffle discipline actually gets decided: what is computed in the scan
projection, what rides a digest-keyed shuffle, what broadcasts.

Stage plumbing here follows `textops.prepare_corpus`'s rule — document
TEXT never moves after the scan projection. Quality, language, token
count, the md5 digest, and the contamination shingles are all computed
in projections over the (single) corpus scan; every later stage keys on
the 16-byte digest or on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .curation import _shingles
from .dedup import with_synthetic_dups
from .textops import _lang_pred, _quality_exprs


def pretrain_pipeline(documents: DataFrame, min_quality: float = 0.7,
                      n: int = 4, benchmark_mod: int = 13,
                      budget: int = 512) -> DataFrame:
    """clean → exact-dedup → decontaminate → pack, one lazy plan.

    Spec (all deterministic):
    - corpus = originals ∪ planted exact copies ∪ planted near-dups
      (`dedup.with_synthetic_dups` — the shared dedup-op corpus);
    - clean: quality >= `min_quality` AND language-ID 'en'
      (`textops` exprs, computed in the scan projection so rejected
      docs never reach a shuffle);
    - exact dedup: keep min doc_id per md5(text) digest (one
      digest-keyed groupBy; dups share text, so min() of the carried
      metrics is the keep-first row's values);
    - decontaminate: the "benchmark" is the RAW originals slice
      doc_id % `benchmark_mod` == 0 (an eval suite is external text —
      not subject to cleaning); its distinct word-`n`-gram shingle set
      broadcasts (eval suites are megabytes at any corpus scale), and
      any cleaned document sharing >= 1 shingle is dropped. The flag is
      computed per DIGEST pre-dedup (exact dups share shingles), so the
      anti-join keys on the digest the dedup groupBy already
      partitioned on — AQE reuses the exchange, text stays put;
    - pack: concat-and-chunk into `budget`-token sequences per 2-hex
      digest-prefix bucket (`packing.pack_sequences` layout; the bucket
      comes from the digest already in hand — no re-hash).

    Output: one row per packed document —
    (doc_id, bucket, n_tokens, quality, seq_id, tok_offset).
    """
    corpus = with_synthetic_dups(documents)
    n_toks, score = _quality_exprs()
    cleaned = (
        corpus.select(
            "doc_id", "text",
            n_toks.cast("bigint").alias("n_tokens"),
            F.round(score, 2).alias("quality"),
            _lang_pred().alias("pred_lang"),
        )
        .filter((F.col("quality") >= min_quality)
                & (F.col("pred_lang") == "en"))
    )
    kept = (
        cleaned.groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"),
             F.min("n_tokens").alias("n_tokens"),
             F.min("quality").alias("quality"))
    )
    bench = (
        documents.filter(F.col("doc_id") % benchmark_mod == 0)
        .select(F.explode(_shingles(F.col("text"), n)).alias("shingle"))
        .distinct()
    )
    flagged = (
        cleaned.select(F.md5("text").alias("digest"),
                       F.explode(_shingles(F.col("text"), n))
                       .alias("shingle"))
        .join(F.broadcast(bench), "shingle")
        .select("digest").distinct()
    )
    survivors = kept.join(flagged, "digest", "left_anti")
    w = Window.partitionBy("bucket").orderBy("doc_id")
    placed = survivors.select(
        "doc_id",
        F.substring("digest", 1, 2).alias("bucket"),
        "n_tokens", "quality",
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return placed.select(
        "doc_id", "bucket", "n_tokens", "quality",
        F.floor(start / budget).cast("bigint").alias("seq_id"),
        (start % budget).cast("bigint").alias("tok_offset"),
    )
