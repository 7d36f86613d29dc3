"""Document chunking for RAG / pretraining-context assembly, plus
cross-document chunk-level exact dedup.

Both operators are pure projection + explode over a single corpus scan —
no join, and the only shuffle (in the dedup) carries 16-byte digests.

Reference parity note: the reference engine has no chunking operator —
these extend the engine's training-data-pipeline family (the same role
`exec/` operators play for SQL: declared here so every pipeline stage a
100 TB text corpus needs runs inside the engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import _tokens


def _chunk_starts(n_tokens: Column, stride: int) -> Column:
    # one start per stride while start < n_tokens; a doc always yields at
    # least the [0, chunk) window (empty text => one empty chunk row, so
    # no document silently disappears from the chunk table)
    return F.sequence(
        F.lit(0), F.greatest(n_tokens - 1, F.lit(0)), F.lit(stride))


def chunk_documents(documents: DataFrame, chunk_tokens: int = 64,
                    stride: int = 48) -> DataFrame:
    """Overlapping token-window chunks: window `chunk_tokens` wide, moving
    `stride` tokens per step (stride < chunk_tokens => overlap, as used
    for RAG indexing; stride == chunk_tokens => disjoint pretraining
    blocks).

    Output: (doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text).

    100 TB shape: tokenize + explode is a narrow linear scan — zero
    Exchange in the plan (plan-asserted); chunk count per doc is
    ceil(n/stride) so output size is input size × (chunk/stride)
    overlap factor, and downstream consumers partition by whatever key
    they need — nothing here forces a shuffle.
    """
    toks = documents.select(
        "doc_id", _tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    exploded = toks.select(
        "doc_id", "toks",
        F.posexplode(_chunk_starts(n, stride)).alias("chunk_idx", "start_tok"),
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.least(F.lit(chunk_tokens),
                F.size("toks") - F.col("start_tok")).alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start_tok") + 1, chunk_tokens),
            " ").alias("chunk_text"),
    )


def chunk_dedup_decisions(documents: DataFrame,
                          chunk_tokens: int = 32) -> DataFrame:
    """Cross-document EXACT chunk dedup: split every document into
    disjoint `chunk_tokens`-token blocks, hash each block, and for every
    block text that occurs more than once in the corpus emit the keep
    decision — the lexicographically-first (doc_id, chunk_idx) occurrence
    wins, all others are droppable boilerplate (the chunk-level analog of
    `dedup.exact_dedup_decisions`; catches shared headers/footers that
    whole-document hashing misses).

    Output: (digest, keep_doc, keep_idx, n_copies), duplicated chunks only.

    100 TB shape: the groupBy key is the 32-hex md5 digest — chunk TEXT
    never travels through the shuffle (map-side partial aggregation
    reduces each digest to one row per partition first); skew is bounded
    because a pathological mega-duplicate chunk still combines to one row
    per map partition.
    """
    chunks = chunk_documents(documents, chunk_tokens=chunk_tokens,
                             stride=chunk_tokens)
    return (
        chunks.select(
            "doc_id", "chunk_idx", F.md5(F.col("chunk_text")).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(F.struct("doc_id", "chunk_idx")).alias("keep"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "digest",
            F.col("keep.doc_id").alias("keep_doc"),
            F.col("keep.chunk_idx").alias("keep_idx"),
            "n_copies",
        )
    )


def remove_boilerplate(documents: DataFrame,
                       chunk_tokens: int = 32) -> DataFrame:
    """End-to-end boilerplate removal: apply `chunk_dedup_decisions` to
    the corpus — every duplicated chunk instance EXCEPT its first
    occurrence is dropped, and each document is re-assembled from its
    surviving chunks (the corpus rewrite step after chunk-level dedup).

    Output: (doc_id, n_chunks, n_dropped, clean_digest) — the digest of
    the re-assembled text, so the result stays row-sized while still
    pinning the exact rebuilt content.

    100 TB shape: the duplicated-digest decision table (tiny relative to
    the corpus: only digests with >1 occurrence) joins BROADCAST onto the
    chunk stream, so chunk text never shuffles for the keep/drop verdict;
    the one text-bearing Exchange is the per-document re-assembly
    groupBy — inherent to a corpus-rewrite operator (each doc's chunks
    must meet once) and keyed by doc_id, which is uniform by
    construction.
    """
    chunks = chunk_documents(documents, chunk_tokens=chunk_tokens,
                             stride=chunk_tokens).withColumn(
        "digest", F.md5(F.col("chunk_text")))
    decisions = chunk_dedup_decisions(documents, chunk_tokens=chunk_tokens)
    marked = chunks.join(
        F.broadcast(decisions), "digest", "left").select(
        "doc_id", "chunk_idx", "chunk_text",
        (F.col("keep_doc").isNull()
         | ((F.col("keep_doc") == F.col("doc_id"))
            & (F.col("keep_idx") == F.col("chunk_idx")))).alias("keep"),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((~F.col("keep")).cast("bigint")).alias("n_dropped"),
            F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("keep"),
                               F.struct("chunk_idx", "chunk_text")))),
                    lambda x: x.chunk_text),
                " ")).alias("clean_digest"),
        )
    )
