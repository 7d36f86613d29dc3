"""Training-set assembly operators: token-budget sequence packing,
deterministic train/test splitting, PII redaction.

The last mile of an LLM data pipeline, downstream of cleaning + dedup
(`textops.prepare_corpus`): decide which documents land in which training
sequence, which split they belong to, and scrub residual PII. All three
are pure JVM-side expressions (no Python in the data path) and every hash
is an md5-hex slice, so an external SQL engine reproduces the results
bit-for-bit (the declared-query oracles do exactly that).

Scale notes (100 TB):
* Packing partitions the corpus into content-hash buckets and runs the
  running-token-count window WITHIN a bucket — each bucket is an
  independent, bounded sort. `bucket_chars` is the scale knob (2 hex
  chars = 256 buckets here; a cluster run raises it so one bucket's
  token stream fits an executor's sort spill comfortably). There is no
  global window anywhere.
* The split is a deterministic function of the content hash — stable
  across reshards/re-ingests, and exact duplicates always land in the
  same split (no train/test leakage through copies), which a random()
  split cannot guarantee.
* Redaction is a linear projection (regexp_replace chain) — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textops import _tokens

# Conservative, RE2-and-Java-compatible patterns (the oracle runs them in
# DuckDB's RE2): keep to character classes + bounded repetition.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def pack_sequences(documents: DataFrame, budget: int = 512,
                   bucket_chars: int = 2) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence.

    Streaming concat-and-chunk packing (the standard pretraining layout:
    documents are concatenated in bucket order and cut every `budget`
    tokens): within a content-hash bucket, a running token count places
    each document at a stream offset; `seq_id` is the budget-sized chunk
    its first token falls in, `tok_offset` the position inside that
    chunk. Deterministic — bucket and order are content-hash + doc_id,
    not arrival order.

    Emits one row per document: (doc_id, bucket, n_tokens, seq_id,
    tok_offset). Downstream materialization groups by (bucket, seq_id).
    """
    n_toks = F.size(_tokens(F.col("text")))
    bucket = F.substring(F.md5("text"), 1, bucket_chars)
    w = Window.partitionBy("bucket").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("bigint")
    return (
        documents.select(
            "doc_id", bucket.alias("bucket"),
            n_toks.cast("bigint").alias("n_tokens"))
        .select(
            "doc_id", "bucket", "n_tokens",
            F.floor(start / budget).alias("seq_id"),
            (start % budget).alias("tok_offset"),
        )
    )


def train_test_split(documents: DataFrame) -> DataFrame:
    """Deterministic content-hash split: a document is `test` iff the
    first byte of md5(text) is below 0x0d (13/256 ≈ 5.1%), else `train`.

    Hex-string comparison, not integer conversion, so any engine with an
    md5() reproduces the assignment byte-for-byte. Content (not id)
    hashing means exact duplicates co-locate in one split — no eval
    leakage through copies that survive upstream dedup thresholds.
    """
    prefix = F.substring(F.md5("text"), 1, 2)
    return documents.select(
        "doc_id",
        prefix.alias("hash_prefix"),
        F.when(prefix < "0d", "test").otherwise("train").alias("split"),
    )


def with_synthetic_pii(documents: DataFrame) -> DataFrame:
    """Plant deterministic PII on subsets of the corpus (the testdata
    text contains none, so redaction needs observable behavior — same
    pattern as `dedup.with_synthetic_dups`)."""
    text = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0,
               " contact bob@example.com").otherwise(""),
        F.when(F.col("doc_id") % 7 == 0,
               " call 415-555-0199").otherwise(""),
        F.when(F.col("doc_id") % 11 == 0,
               " seen from 10.17.3.201").otherwise(""),
    )
    return documents.select("doc_id", text.alias("text"))


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_redact(documents: DataFrame) -> DataFrame:
    """Scrub emails / phone numbers / IPv4 addresses to typed placeholder
    tokens; report per-document redaction counts. Email first — its
    local/domain parts contain digit runs the narrower patterns could
    otherwise clip."""
    corpus = with_synthetic_pii(documents)
    text = F.col("text")
    n_email = _count(text, EMAIL_RE)
    n_phone = _count(text, PHONE_RE)
    n_ip = _count(text, IP_RE)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
        IP_RE, "<IP>")
    return corpus.select(
        "doc_id",
        redacted.alias("text"),
        (n_email + n_phone + n_ip).cast("bigint").alias("n_redactions"),
        n_email.cast("bigint").alias("n_emails"),
        n_phone.cast("bigint").alias("n_phones"),
        n_ip.cast("bigint").alias("n_ips"),
    )


def pack_sequences_bpe(documents: DataFrame, budget: int = 512,
                       bucket_chars: int = 2) -> DataFrame:
    """`pack_sequences` under SUBWORD token budgets: identical streaming
    concat-and-chunk layout, but each document's budget contribution is
    its BPE-apply piece count (`corpus_stats.bpe_apply_tokenize`) rather
    than the whitespace count — the packing a real pretraining run does,
    since sequences are cut in tokenizer space, not word space.

    100 TB shape: the segmentation cost stays on the distinct-word table
    (see bpe_apply_tokenize); this op adds ONE doc-keyed join (uniform
    key by construction) and the same bounded per-bucket window — still
    no global sort/window anywhere."""
    from .corpus_stats import bpe_apply_tokenize

    counts = bpe_apply_tokenize(documents).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens"))
    base = documents.select(
        "doc_id",
        F.substring(F.md5("text"), 1, bucket_chars).alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    joined = base.join(counts, "doc_id")
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("bigint")
    return joined.select(
        "doc_id", "bucket", "n_tokens",
        F.floor(start / budget).alias("seq_id"),
        (start % budget).alias("tok_offset"),
    )


def assign_contiguous_ids(documents: DataFrame,
                          bucket_width: int = 1024) -> DataFrame:
    """Stable CONTIGUOUS global ids 0..n-1 in doc_id order WITHOUT a
    global sort — the two-pass offset pattern every large-scale id
    assignment uses (a bare `row_number() OVER (ORDER BY ...)` funnels
    100 TB through ONE partition): bucket rows by doc_id range, count
    per bucket (map-side combined), prefix-sum the counts on the TINY
    bucket table (single-partition window over ~n/width rows — bounded
    by construction), broadcast the offsets back, and rank only WITHIN
    each bucket. new_id = bucket_offset + local_rank.

    Output: (doc_id, new_id) — new_id is exactly
    row_number() OVER (ORDER BY doc_id) - 1, which is the oracle.

    100 TB shape: one map-side-combined count per bucket, one bounded
    single-partition window over the bucket table, one broadcast join,
    and per-bucket windows that parallelize across buckets. At cluster
    scale bucket_width is chosen so buckets >> shuffle partitions."""
    b = (F.col("doc_id") / bucket_width).cast("long").alias("b")
    rows = documents.select("doc_id", b)
    counts = rows.groupBy("b").agg(F.count("*").alias("cnt"))
    # prefix sum over the bucket table: offset(b) = rows in earlier buckets
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "b", F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("off"))
    wl = Window.partitionBy("b").orderBy("doc_id")
    return (
        rows.join(F.broadcast(offsets), "b")
        .select(
            "doc_id",
            (F.col("off") + F.row_number().over(wl) - 1).alias("new_id"),
        )
    )
