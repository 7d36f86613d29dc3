"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure JVM-side expressions (builtin functions
over split/regexp arrays) — linear scans, no shuffle except the final
aggregate, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _tokens(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (word pieces and
    punctuation as separate tokens)."""
    return documents.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"),
               F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))).alias("n_re_tokens"),
        F.length("text").alias("n_chars_measured"),
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", ""))
         ).alias("n_spaces"),
    )


def _quality_exprs() -> tuple[Column, Column]:
    """(n_tokens, quality score) over the `text` column — shared by the
    per-doc scoring query and the corpus-cleaning pass."""
    toks = _tokens(F.col("text"))
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    avg_tok_len = (F.length(F.regexp_replace(F.col("text"), " ", ""))
                   / n_toks).cast("double")
    stop_ratio = (stop_hits / n_toks).cast("double")
    score = (
        F.when(n_toks >= 20, 0.4).otherwise(0.0)
        + F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), 0.3).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.3).otherwise(0.0)
    )
    return n_toks, score


def _lang_votes() -> tuple[Column, Column, Column]:
    toks = _tokens(F.col("text"))

    def votes(words):
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    en = votes(EN_STOPWORDS)
    de = votes(("der", "die", "das", "und", "ist", "nicht", "ein", "zu"))
    fr = votes(("le", "la", "les", "et", "est", "un", "une", "pas"))
    return en, de, fr


def _lang_pred() -> Column:
    en, de, fr = _lang_votes()
    return (
        F.when((en >= de) & (en >= fr), "en")
        .when(de >= fr, "de")
        .otherwise("fr")
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality score from length / punctuation / stopword ratios —
    the standard pre-training corpus filters."""
    toks = _tokens(F.col("text"))
    n_toks, score = _quality_exprs()
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    avg_tok_len = (F.length(F.regexp_replace(F.col("text"), " ", ""))
                   / n_toks).cast("double")
    stop_ratio = (stop_hits / n_toks).cast("double")
    punct_ratio = (n_punct / F.length("text")).cast("double")
    return documents.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(avg_tok_len, 6).alias("avg_tok_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 2).alias("quality"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language heuristic (en vs de vs fr), scored per doc and
    compared with the labeled `lang` column."""
    en, de, fr = _lang_votes()
    pred = _lang_pred()
    return documents.select(
        "doc_id",
        en.alias("en_votes"),
        de.alias("de_votes"),
        fr.alias("fr_votes"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("match"),
    )


def clean_corpus(documents: DataFrame, min_quality: float = 0.7) -> DataFrame:
    """The C4-style corpus cleaning pass a pre-training pipeline actually
    runs: keep documents that clear the quality threshold AND classify as
    English. Quality and language are computed in ONE projection over ONE
    scan — composing the standalone queries would self-join the corpus on
    doc_id, an extra shuffle that is pure waste at 100 TB."""
    n_toks, score = _quality_exprs()
    pred = _lang_pred()
    return (
        documents.select(
            "doc_id",
            n_toks.alias("n_tokens"),
            F.round(score, 2).alias("quality"),
            pred.alias("pred_lang"),
        )
        .filter((F.col("quality") >= min_quality) & (F.col("pred_lang") == "en"))
    )


def prepare_corpus(documents: DataFrame,
                   min_quality: float = 0.7) -> DataFrame:
    """The END-TO-END corpus-preparation pipeline a pre-training run
    executes as one job: ingest (with the planted duplicates every dedup
    op uses) → C4-style clean (quality threshold + language filter) →
    exact dedup with keep-first decisions → per-kept-document token
    accounting.

    Shuffle discipline at 100 TB: quality, language, and token counts are
    computed in ONE projection over ONE scan (no self-joins between
    stages), and the only shuffle in the whole pipeline is the final
    groupBy on the 16-byte md5 digest — document text never moves after
    the scan projection, and the filter runs BEFORE the shuffle so
    rejected documents (the majority, in a raw crawl) never hit the
    network. Composing the standalone declared ops would re-scan the
    corpus once per stage instead."""
    from .dedup import with_synthetic_dups

    corpus = with_synthetic_dups(documents)
    n_toks, score = _quality_exprs()
    pred = _lang_pred()
    cleaned = corpus.select(
        "doc_id",
        F.col("text"),
        n_toks.alias("n_tokens"),
        F.round(score, 2).alias("quality"),
        pred.alias("pred_lang"),
    ).filter(
        (F.col("quality") >= min_quality) & (F.col("pred_lang") == "en")
    )
    # exact dups share identical text, hence identical metrics — min()
    # picks the keep-first row's values deterministically
    return (
        cleaned.groupBy(F.md5("text").alias("digest"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            (F.count("*") - 1).alias("n_exact_dropped"),
            F.min("n_tokens").alias("n_tokens"),
            F.min("quality").alias("quality"),
        )
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (portable across engines), plus a 16-hex-digit short key —
    the shuffle key for exact-dedup at scale."""
    toks = F.array_distinct(_tokens(F.col("text")))
    canon = F.array_join(F.array_sort(toks), " ")
    return documents.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.substring(F.md5(canon), 1, 16).alias("short_key"),
        F.size(toks).alias("n_distinct_tokens"),
    )


def with_synthetic_html(documents: DataFrame) -> DataFrame:
    """Wrap a deterministic subset of the corpus in HTML boilerplate
    (nav/script/tags) — the testdata is plain text, so the extraction
    operator needs planted markup to have observable behavior (same
    pattern as the planted dups/PII)."""
    wrapped = F.concat(
        F.lit("<html><head><script>var x=1;</script></head><body>"
              "<nav>home | about</nav><p>"),
        F.col("text"),
        F.lit("</p><div class=\"footer\">&copy; 2026</div></body></html>"),
    )
    return documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, wrapped)
        .otherwise(F.col("text")).alias("text"),
    )


def html_strip_extract(documents: DataFrame) -> DataFrame:
    """Main-text extraction from HTML (the trafilatura/jusText stage of
    a web-corpus pipeline, reduced to its engine-shaped core): drop
    script/style subtrees, strip tags, decode the common entities,
    collapse whitespace — pure regexp_replace chain, one scan, no UDF.

    Output: (doc_id, is_html, markup_frac, clean_digest, n_clean_chars)
    — digest instead of the text so rows stay small; markup_frac =
    removed chars / original chars.

    100 TB shape: a linear projection (regex chain) — no shuffle, no
    state; composes in front of every downstream text op."""
    corpus = with_synthetic_html(documents)
    text = F.col("text")
    no_script = F.regexp_replace(
        F.regexp_replace(text, "(?s)<script.*?</script>", " "),
        "(?s)<style.*?</style>", " ")
    no_tags = F.regexp_replace(no_script, "<[^>]*>", " ")
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&copy;", " "), "&amp;", "&"),
        "&nbsp;", " ")
    clean = F.trim(F.regexp_replace(decoded, " +", " "))
    return corpus.select(
        "doc_id",
        text.startswith("<html>").alias("is_html"),
        F.round((F.length(text) - F.length(clean))
                / F.length(text), 6).alias("markup_frac"),
        F.md5(clean).alias("clean_digest"),
        F.length(clean).alias("n_clean_chars"),
    )


def hash_embeddings(documents: DataFrame, dim: int = 64) -> DataFrame:
    """IN-ENGINE text embeddings via the hashing trick (feature hashing,
    Weinberger et al. 2009 — public ICML): each token lands in bucket
    md5(token)[0:8] mod `dim` with a ±1 sign from the next md5 nibble;
    a document's vector is the per-bucket signed count. This is the
    deterministic text→vector path that makes the ANN/dedup embedding
    operators self-contained — no external embedding model required —
    and the classic baseline the sparse-feature literature uses.

    Output: (doc_id, v array<bigint>) — integer components, so every
    downstream float computation starts from exactly representable
    values and the SQL oracle reproduces the vector bit-for-bit.

    100 TB shape: one token explode → groupBy(doc_id, bucket) with
    map-side partial sums (≤ dim rows per doc pre-shuffle) → per-doc
    map assembly; shuffles carry (doc_id, int, int) only. The dense
    projection is a JVM transform over sequence(0, dim-1)."""
    toks = documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
    bucket = (F.conv(F.substring(F.md5("t"), 1, 8), 16, 10)
              .cast("long") % dim).cast("int")
    sign = F.when(
        F.conv(F.substring(F.md5("t"), 9, 1), 16, 10)
        .cast("long") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    per_bucket = (
        toks.select("doc_id", bucket.alias("b"), sign.alias("s"))
        .groupBy("doc_id", "b").agg(F.sum("s").alias("val"))
    )
    return (
        per_bucket.groupBy("doc_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("b", "val"))).alias("m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("int")),
                    F.lit(0).cast("long")),
            ).alias("v"),
        )
    )


def hash_embedding_stats(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Per-doc summary of the hashed embedding — the oracle-friendly
    projection (integer checksum idiom shared with
    quantize_embeddings_int8): nnz, L1, L2 (6dp) and an md5 checksum of
    the comma-joined components."""
    emb = hash_embeddings(documents, dim)
    return emb.select(
        "doc_id",
        F.size(F.filter("v", lambda x: x != 0)).alias("nnz"),
        F.aggregate("v", F.lit(0).cast("long"),
                    lambda a, x: a + F.abs(x)).alias("l1"),
        F.round(F.sqrt(F.aggregate(
            "v", F.lit(0.0), lambda a, x: a + (x * x).cast("double"))),
            6).alias("l2"),
        F.md5(F.array_join(F.transform("v", lambda x: x.cast("string")),
                           ",")).alias("v_checksum"),
    )
