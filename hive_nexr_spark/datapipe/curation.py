"""Corpus-curation operators: benchmark decontamination, repetition-based
quality filters, TF-IDF term scoring, domain mixing, and embedding
quantization.

These extend the LLM-data-pipeline family (dedup/textops/packing) with the
curation passes a pre-training run performs between cleaning and packing:
drop documents that leak evaluation data, drop degenerate/repetitive
documents, weight the domain mixture deterministically, and compress the
embedding sidecar. Every hash is an md5-hex slice and every float is
rounded at emit, so an external SQL engine reproduces the outputs exactly
(the declared-query oracles do).

Scale notes (100 TB):
* Decontamination broadcasts the BENCHMARK shingle set (evaluation suites
  are tiny — MBs — regardless of corpus size); the corpus side streams
  through one explode + one groupBy(doc_id). Shingles travel as 16-hex
  md5 slices, never raw text.
* Repetition filters explode 2-grams and map-side-combine the
  (doc_id, gram) counts — per-partition hash aggregation bounds memory by
  the partition's distinct-gram count, not document length. (A per-row
  array-expression top-gram would be O(len²) per document — degenerate
  exactly on the long, repetitive documents this filter exists to catch.)
* TF-IDF's document-frequency table is vocabulary-sized (bounded, ≪
  corpus) and is broadcast back onto the term-frequency stream; the only
  corpus-sized shuffles are the two term aggregations.
* Domain sampling is a pure projection + filter: the keep decision is a
  deterministic function of the content hash, so a re-shard or re-ingest
  keeps exactly the same rows (a rand() sample cannot), and no shuffle
  happens at all.
* Quantization is a linear projection over the vector column — no
  shuffle, no Python, all `transform`/`aggregate` higher-order functions
  inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textops import _tokens

# Default per-language mixture rates for domain_mix_sample: the shape a
# multilingual pre-training run uses (English-heavy, long-tail langs
# subsampled). Deterministic, so the declared oracle pins them too.
MIX_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25}


def _shingles(text: Column, n: int = 5) -> Column:
    """Distinct word n-gram shingles of `text`, each reduced to a 16-hex
    md5 slice (64-bit key — collision-negligible, and 8× narrower than
    raw 5-gram strings through the shuffle)."""
    toks = _tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.substring(F.md5(F.array_join(F.slice(toks, i, n), " ")),
                              1, 16),
    )
    return F.array_distinct(grams)


def decontaminate(documents: DataFrame, n: int = 4,
                  benchmark_mod: int = 13) -> DataFrame:
    """Benchmark decontamination (the GPT-3-style n-gram overlap scrub): a
    training document is contaminated if it shares any word n-gram with
    the held-out evaluation set. Here the "benchmark" is the deterministic
    doc_id % `benchmark_mod` == 0 slice of the same corpus — in production
    it is the actual eval-suite text.

    Returns one row per TRAINING document that hit the benchmark:
    (doc_id, n_hits = distinct contaminated shingles). Flagged documents
    are what a pipeline drops before packing.

    Scale: each side filters BEFORE shingling, so the expensive
    explode runs once per side over only its own documents (the
    benchmark side touches 1/mod of the corpus) — shingling first and
    filtering twice would re-run the full-corpus explode for both
    branches. The benchmark shingle set is broadcast (eval suites are
    megabytes); the corpus side is one explode + one groupBy(doc_id) —
    shingle keys are 16-hex md5 slices, never raw text."""
    def side(pred) -> DataFrame:
        return documents.filter(pred).select(
            "doc_id", F.explode(_shingles(F.col("text"), n))
            .alias("shingle"))

    bench = (side(F.col("doc_id") % benchmark_mod == 0)
             .select("shingle").distinct())
    train = side(F.col("doc_id") % benchmark_mod != 0)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )


def decontaminate_fuzzy(documents: DataFrame, benchmark_mod: int = 13,
                        jaccard_threshold: float = 0.5,
                        max_doc_id: int = 200) -> DataFrame:
    """FUZZY benchmark decontamination: MinHash-LSH between the training
    corpus and the benchmark slice — flags training documents whose
    shingle set is a near-duplicate of ANY benchmark document. This is
    the scrub that catches paraphrased / reformatted / prefix-mangled
    eval leaks the exact n-gram overlap (`decontaminate`) misses; the
    GPT-3/PaLM contamination appendices describe exactly this
    escalation.

    Corpus: the synthetic-dup corpus; benchmark = original documents
    with doc_id % `benchmark_mod` == 0, training pool = everything else
    (so the planted +100000 copies and +200000 near-dups of benchmark
    docs are the observable leaks).

    Output: (doc_id, n_bench_hits, max_jaccard) per contaminated
    training document.

    100 TB shape: identical to `dedup.minhash_lsh_pairs` — shingles
    persist once, signatures are split-k slices of ONE md5, the
    candidate join keys on (band, bucket) carrying doc ids only, and
    verification touches candidates, not |train|x|bench|. The benchmark
    side is tiny (an eval suite), so AQE broadcast-converts its band
    table; the train side streams. Distinct-before-verify bounds the
    shingle fetch-back to unique candidate pairs."""
    from .dedup import (MINHASH_BANDS, MINHASH_H, ROWS_PER_BAND,
                        _with_shingles, with_synthetic_dups)
    from ._cache import tracked_persist

    corpus = with_synthetic_dups(documents).filter(
        (F.col("doc_id") % 100000) < max_doc_id)
    is_bench = (F.col("doc_id") < 100000) & \
        (F.col("doc_id") % benchmark_mod == 0)
    toks = tracked_persist(_with_shingles(corpus).select("doc_id", "sh"))
    sh = toks.select("doc_id", F.explode("sh").alias("shingle"))
    hashed = sh.select("doc_id", F.md5("shingle").alias("d"))
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(F.substring("d", h * 5 + 1, 5)).alias(f"mh{h}")
          for h in range(MINHASH_H)])
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(*[F.col(f"mh{b * ROWS_PER_BAND + r}")
                           for r in range(ROWS_PER_BAND)]).alias("bucket"),
            ) for b in range(MINHASH_BANDS)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    train_b = bands.filter(~is_bench).alias("t")
    bench_b = bands.filter(is_bench).alias("e")
    cand = (
        train_b.join(bench_b,
                     (F.col("t.band") == F.col("e.band"))
                     & (F.col("t.bucket") == F.col("e.bucket")))
        .select(F.col("t.doc_id").alias("train_id"),
                F.col("e.doc_id").alias("bench_id"))
        .distinct()
    )
    verified = (
        cand.join(toks.alias("tt"), F.col("train_id") == F.col("tt.doc_id"))
        .join(toks.alias("te"), F.col("bench_id") == F.col("te.doc_id"))
        .select(
            "train_id", "bench_id",
            F.round(
                F.size(F.array_intersect(F.col("tt.sh"), F.col("te.sh")))
                / F.size(F.array_union(F.col("tt.sh"), F.col("te.sh"))),
                6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified.groupBy(F.col("train_id").alias("doc_id")).agg(
        F.count("*").alias("n_bench_hits"),
        F.max("jaccard").alias("max_jaccard"),
    )


def repetition_filters(documents: DataFrame) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText family):
    duplicate-token fraction and the most-frequent-2-gram fraction. High
    values mean boilerplate / degenerate generation loops — standard drop
    criteria before training.

    Per document: n_tokens, dup_token_frac = 1 - distinct/total tokens,
    top_gram (lexicographically-smallest among the most frequent 2-grams,
    for determinism), top_gram_count, and top_gram_frac = count /
    (n_tokens - 1) (the number of 2-gram slots).

    Scale: 2-grams are exploded and hash-aggregated on (doc_id, gram) with
    map-side partial combine, then reduced to one row per doc via a
    max_by struct — two narrow shuffles, no per-row O(len²) array scan,
    memory bounded by distinct grams per partition."""
    toks = _tokens(F.col("text"))
    base = documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        toks.alias("toks"),
    )
    grams = base.select(
        "doc_id", "n_tokens", "n_distinct",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("toks") - 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                      F.element_at("toks", i + 1)),
            )
        ).alias("gram"),
    )
    counted = grams.groupBy("doc_id", "n_tokens", "n_distinct", "gram").agg(
        F.count("*").alias("cnt"))
    # one row per doc: most frequent 2-gram, smallest gram on ties —
    # min(struct(-cnt, gram)) is a single map-side-combinable aggregate
    best = counted.groupBy("doc_id", "n_tokens", "n_distinct").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram")))
        .alias("top"))
    return best.select(
        "doc_id",
        "n_tokens",
        F.round(1.0 - F.col("n_distinct") / F.col("n_tokens"), 6)
        .alias("dup_token_frac"),
        F.col("top.gram").alias("top_gram"),
        (-F.col("top.neg")).alias("top_gram_count"),
        # greatest(n-1, 1): a 1-token doc has one (degenerate) 2-gram
        # slot — plain n-1 would divide by zero (Infinity in Spark, NULL
        # in SQL engines), breaking oracle parity
        F.round((-F.col("top.neg"))
                / F.greatest(F.col("n_tokens") - 1, F.lit(1))
                .cast("double"), 6)
        .alias("top_gram_frac"),
    )


def tfidf_topk(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic relevance score a
    curation pipeline uses for topic tagging / domain classification.

    tf = term count within the document; idf = ln(N / df) with df = number
    of documents containing the term; score = tf * idf, rounded at emit.
    Top-k per document by (score desc, term asc) for determinism.

    Scale: two corpus-sized aggregations — (doc_id, term) counts and the
    per-term document frequency — both map-side combined. The df table is
    vocabulary-sized (bounded and tiny next to the corpus) and is
    BROADCAST back onto the tf stream, so the join adds no shuffle; the
    final top-k window partitions by doc_id (narrow, already co-located
    with the tf aggregation's partitioning)."""
    # N stays IN the plan: a broadcast 1-row countDistinct aggregate
    # cross-joined onto the scored stream — no eager driver-side
    # .count() job (which at 100 TB would be an extra full corpus scan
    # at plan-build time) and the operator remains fully lazy
    nd = documents.agg(
        F.count_distinct("doc_id").cast("double").alias("_n_docs"))
    terms = documents.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_tbl), "term").crossJoin(
        F.broadcast(nd)).select(
        "doc_id", "term", "tf", "df",
        F.round(F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6)
        .alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def _rate_threshold(rate: float) -> str:
    """8-hex-char keep threshold for a sampling rate: a document is kept
    when its md5 hash prefix sorts below floor(rate * 2^32) rendered as
    hex. Hex-STRING comparison, not integer conversion, so any engine
    with md5 reproduces the decision (same idiom as
    packing.train_test_split)."""
    return format(min(int(rate * 2 ** 32), 2 ** 32 - 1), "08x")


def domain_mix_sample(documents: DataFrame,
                      rates: dict[str, float] | None = None) -> DataFrame:
    """Domain-mixture subsampling: keep each document with a per-language
    rate (the pre-training mixture knob), decided by a deterministic
    content-hash prefix rather than rand(). A re-shard, re-ingest, or
    retry keeps EXACTLY the same rows — reproducible mixtures are a hard
    requirement for training-run provenance — and exact duplicate
    (doc_id, text) pairs always make the same keep/drop decision.

    Pure projection + filter: no shuffle, no state, trivially linear at
    any scale."""
    rates = rates or MIX_RATES
    threshold = F.coalesce(
        *[F.when(F.col("lang") == lang, F.lit(_rate_threshold(r)))
          for lang, r in sorted(rates.items())],
        F.lit(_rate_threshold(1.0)),
    )
    prefix = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text"))), 1, 8)
    return (
        documents.select(
            "doc_id", "lang", "source",
            prefix.alias("hash_prefix"),
            threshold.alias("keep_threshold"),
        )
        .filter(F.col("hash_prefix") < F.col("keep_threshold"))
    )


def dsir_select(documents: DataFrame, n_buckets: int = 256,
                target_mod: int = 13, k: int = 50) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling",
    public arXiv 2302.03169): score every RAW document by how much more
    likely its hashed-n-gram features are under a TARGET distribution
    than under the raw-pool distribution, then keep the top-k.

    Deterministic spec (so the DuckDB oracle is exact):
    * features = whitespace-lowercase unigrams AND bigrams, hashed into
      `n_buckets` buckets via the first 8 hex chars of md5(gram) mod B;
    * the "target" corpus is the doc_id % `target_mod` == 0 slice (in
      production: the high-quality seed set, e.g. curated reference
      text), the raw pool is everything else;
    * bucket distributions are add-one smoothed:
      p[b] = (target_cnt[b] + 1) / (target_total + B), q[b] likewise
      over the raw pool;
    * log importance weight of a raw document =
      sum_b count_doc[b] * (ln p[b] - ln q[b]), rounded at emit;
    * output = top-k raw docs by (log_weight desc, doc_id asc):
      (doc_id, n_feats, log_weight, rank).

    100 TB shape: ONE corpus-sized token shuffle — the (doc_id, bucket)
    count aggregation, map-side combined, keys are 8-byte ints never
    text. The two bucket distributions aggregate that stream down to
    B <= a few thousand rows, so the log-likelihood-ratio table is
    broadcast back onto the per-doc stream (no second corpus shuffle for
    the join), and the totals are a broadcast 1-row aggregate — the
    whole operator is one lazy plan with no driver-side counts. Top-k
    compiles to TakeOrderedAndProject (never a global sort). This is
    exactly why DSIR scales where classifier-based selection does not:
    the "model" is a B-row table, invariant to corpus size."""
    toks = _tokens(F.col("text"))
    base = documents.select("doc_id", toks.alias("toks"))
    grams = base.select(
        "doc_id",
        F.explode(F.concat(
            F.col("toks"),
            F.transform(
                F.sequence(F.lit(1),
                           F.greatest(F.size("toks") - 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                      F.element_at("toks", i + 1)),
            ),
        )).alias("gram"),
    )
    bucket = (F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
              .cast("long") % n_buckets)
    db = (grams.select("doc_id", bucket.alias("bucket"))
          .groupBy("doc_id", "bucket").agg(F.count("*").alias("c")))

    is_target = F.col("doc_id") % target_mod == 0
    dist = db.groupBy("bucket").agg(
        F.coalesce(F.sum(F.when(is_target, F.col("c"))), F.lit(0))
        .alias("tc"),
        F.coalesce(F.sum(F.when(~is_target, F.col("c"))), F.lit(0))
        .alias("rc"),
    )
    totals = dist.agg(
        F.sum("tc").cast("double").alias("_tt"),
        F.sum("rc").cast("double").alias("_rt"),
    )
    llr_tbl = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (F.log((F.col("tc") + 1.0) / (F.col("_tt") + float(n_buckets)))
         - F.log((F.col("rc") + 1.0) / (F.col("_rt") + float(n_buckets)))
         ).alias("llr"),
    )
    per_doc = (
        db.filter(~is_target)
        .join(F.broadcast(llr_tbl), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("llr")), 6)
            .alias("log_weight"),
        )
    )
    w = Window.orderBy(F.col("log_weight").desc(), F.col("doc_id"))
    return (
        per_doc.orderBy(F.col("log_weight").desc(), F.col("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Scalar int8 quantization of the embedding sidecar: per-vector
    min/max affine mapping onto 0..255 (the storage/serving compression
    every large ANN deployment applies). Emits the quantization params, an
    md5 checksum of the quantized codes (order-preserving, so any
    cross-engine code mismatch surfaces), and the max absolute
    reconstruction error.

    Linear projection over the vector column — `transform`/`aggregate`
    higher-order functions, no shuffle, no Python."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    lo = F.array_min(v)
    hi = F.array_max(v)
    # nullif guards the degenerate constant-vector case (hi == lo):
    # scale 0 would make every code NaN→NULL and silently corrupt the
    # checksum; instead codes collapse to 0 and the error to 0.0, and
    # the oracle mirrors the same expressions
    scale = F.nullif(hi - lo, F.lit(0.0)) / F.lit(255.0)
    q = F.transform(
        v, lambda x: F.coalesce(
            F.floor((x - lo) / scale + F.lit(0.5)).cast("int"), F.lit(0)))
    recon_err = F.aggregate(
        F.zip_with(v, q, lambda x, c: F.coalesce(
            F.abs(x - (lo + c * scale)), F.lit(0.0))),
        F.lit(0.0), lambda acc, e: F.greatest(acc, e))
    return embeddings.select(
        F.col("vec_id"),
        F.round(lo, 6).alias("q_min"),
        F.round(hi, 6).alias("q_max"),
        F.md5(F.array_join(q, ",")).alias("q_checksum"),
        F.round(recon_err, 6).alias("max_abs_err"),
    )


# Fixed logistic-regression head for document quality (the C4/Gopher/DCLM
# curation pattern: a cheap linear classifier over surface features gates
# what enters training). Weights are a model ARTIFACT — deterministic
# literals here, standing in for a trained coefficient vector; at scale
# they'd broadcast identically (a handful of doubles folds into codegen).
QUALITY_CLF_WEIGHTS = {
    "bias": -1.5,
    "log_n_tokens": 0.55,       # longer docs mildly favored
    "stop_ratio": 6.0,          # natural prose has stopwords
    "avg_tok_len_penalty": -0.35,  # per |avg_len - 5| char
    "dup_token_frac": -4.0,     # repetition is boilerplate
    "digit_ratio": -2.5,        # tables/serial dumps
}


def quality_classifier_scores(documents: DataFrame,
                              threshold: float = 0.5) -> DataFrame:
    """Document-quality classifier scoring: a logistic scorer over the
    engine's surface features (token count, stopword ratio, average
    token length, duplicate-token fraction, digit ratio) — the final
    curation gate the public pipelines (C4, Gopher/MassiveText, DCLM)
    run before training. Features and head are PURE column math in one
    projection: no UDF, no join, no shuffle — a single corpus scan
    (plan-asserted), so it composes for free with any upstream op.

    Output: (doc_id, n_tokens, stop_ratio, dup_token_frac, digit_ratio,
    quality_logit, quality_prob, keep)."""
    from .textops import EN_STOPWORDS

    w = QUALITY_CLF_WEIGHTS
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
                  / n).cast("double")
    avg_len = (F.length(F.regexp_replace(F.col("text"), " ", ""))
               / n).cast("double")
    dup_frac = (1.0 - F.size(F.array_distinct(toks)) / n).cast("double")
    digit_ratio = ((F.length("text")
                    - F.length(F.regexp_replace(F.col("text"), r"[0-9]", "")))
                   / F.length("text")).cast("double")
    logit = (
        F.lit(w["bias"])
        + F.lit(w["log_n_tokens"]) * F.log(n.cast("double") + 1.0)
        + F.lit(w["stop_ratio"]) * stop_ratio
        + F.lit(w["avg_tok_len_penalty"]) * F.abs(avg_len - 5.0)
        + F.lit(w["dup_token_frac"]) * dup_frac
        + F.lit(w["digit_ratio"]) * digit_ratio
    )
    prob = 1.0 / (1.0 + F.exp(-logit))
    return documents.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(logit, 6).alias("quality_logit"),
        F.round(prob, 6).alias("quality_prob"),
        (prob >= threshold).alias("keep"),
    )


def with_skewed_sources(documents: DataFrame) -> DataFrame:
    """Deterministic skewed-source corpus: source = 'bin' ||
    floor(log2(doc_id + 2)) — geometric stratum sizes (1, 2, 4, 8, ...).
    The testdata sources are uniform (same count per source), so the
    temperature-mix operator needs planted skew to have observable
    rebalancing (same pattern as `dedup.with_synthetic_dups`). log2 is
    exact at powers of two in IEEE double, so the binning is
    engine-portable."""
    return documents.select(
        "doc_id",
        F.concat(F.lit("bin"),
                 F.floor(F.log2(F.col("doc_id") + 2)).cast("int"))
        .alias("source"),
    )


def domain_temperature_mix(documents: DataFrame, total: int = 200,
                           oversample: float = 4.0) -> DataFrame:
    """Temperature-rebalanced domain mixture (the multilingual-LM
    sampling scheme, e.g. mT5 / XLM-R — public: sample stratum s with
    probability ∝ n_s^T, T < 1 upsampling small domains): draw an exact
    per-stratum quota_s = floor(total · √n_s / Σ√n + 0.5) documents
    (T = 0.5 — √ is correctly-rounded IEEE in every engine, so quotas
    are bit-deterministic), picked by content-independent hash order so
    the mixture is stable across re-ingests.

    Output: (source, n_stratum, quota, doc_id, pick), pick = 1..quota.

    100 TB shape (same scaffold as `stratified_sample`): stratum counts
    via map-side-combined groupBy broadcast back; quotas derive from the
    broadcast 1-row Σ√n aggregate (no driver math); a hash-threshold
    pre-filter keeps ~oversample×quota expected rows per stratum before
    the exact per-stratum row_number window runs on the survivors —
    never a full-stratum sort. The pre-filter is probabilistic (for
    quota q it keeps Binomial(n, q·oversample/n) rows — miss chance
    ~e^-(oversample·q) per stratum), so coverage is GUARANTEED by a
    fallback: strata whose survivor count lands under quota re-run the
    window UNFILTERED (ADVICE r9). The short-strata table is at most
    #strata rows — both repair joins broadcast, and the full-stratum
    sort happens only for the (rare) affected strata."""
    corpus = with_skewed_sources(documents)
    u = (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.col("source"), F.col("doc_id"))), 1, 15),
        16, 10).cast("double") / F.lit(float(1 << 60)))
    sized = corpus.select("source", "doc_id", u.alias("u"))
    counts = sized.groupBy("source").agg(F.count("*").alias("n_stratum"))
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_stratum").cast("double"))).alias("_z"))
    quotas = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_stratum",
            F.least(
                F.col("n_stratum"),
                F.floor(total * F.sqrt(F.col("n_stratum").cast("double"))
                        / F.col("_z") + 0.5).cast("bigint"),
            ).alias("quota"),
        )
    )
    # persist the quota-joined corpus: the survivor filter, the
    # short-strata count, and the fallback semi-join all consume it —
    # uncached, the hash/size/quota subtree would evaluate three times
    # (r9 review finding; corpus-sized, so the persist discipline of the
    # neighboring LSH operators applies)
    from ._cache import tracked_persist

    joined = tracked_persist(sized.join(F.broadcast(quotas), "source"))
    survivors = joined.filter(
        F.col("u") * F.col("n_stratum")
        < F.col("quota") * F.lit(oversample))
    short = (
        quotas.join(
            survivors.groupBy("source").agg(F.count("*").alias("n_surv")),
            "source", "left")
        .filter(F.coalesce(F.col("n_surv"), F.lit(0)) < F.col("quota"))
        .select("source")
    )
    pool = (
        survivors.join(F.broadcast(short), "source", "left_anti")
        .unionByName(joined.join(F.broadcast(short), "source", "left_semi"))
    )
    w = Window.partitionBy("source").orderBy("u", "doc_id")
    return (
        pool.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= F.col("quota"))
        .select("source", "n_stratum", "quota", "doc_id", "pick")
    )


def _surface_feats(documents: DataFrame) -> DataFrame:
    """The 6 surface features + label shared by the classifier trainer
    and its evaluation op (x0 bias, log token count, stopword share,
    avg-word-length penalty, duplicate-token share, digit share;
    y = lang=='en')."""
    from .textops import EN_STOPWORDS

    toks = _tokens(F.col("text"))
    n = F.size(toks)
    return documents.select(
        F.lit(1.0).alias("x0"),
        F.log(n.cast("double") + 1.0).alias("x1"),
        (F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
         / n).cast("double").alias("x2"),
        F.abs((F.length(F.regexp_replace(F.col("text"), " ", "")) / n)
              .cast("double") - 5.0).alias("x3"),
        (1.0 - F.size(F.array_distinct(toks)) / n).cast("double")
        .alias("x4"),
        ((F.length("text")
          - F.length(F.regexp_replace(F.col("text"), r"[0-9]", "")))
         / F.length("text")).cast("double").alias("x5"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )


def quality_classifier_train(documents: DataFrame, steps: int = 3,
                             lr: float = 0.5) -> DataFrame:
    """TRAIN the quality classifier in-engine: full-batch logistic
    regression by `steps` unrolled gradient-descent iterations over the
    surface features of `quality_classifier_scores`, predicting the
    lang=='en' label (the distillation setup the public pipelines use: a
    cheap linear model fit against a trusted signal, then deployed as
    the corpus gate). Deterministic spec: weights init 0, full-batch
    gradient g_j = avg((sigmoid(w.x) - y) * x_j), w <- w - lr*g.

    Output: ONE row (w_bias, w_log_n, w_stop, w_avg_pen, w_dup,
    w_digit, logloss) rounded to 6dp — the artifact
    `quality_classifier_scores` would consume.

    100 TB shape — the Spark iterative-training pattern (same family as
    the kmeans/PageRank loops): each step is ONE map-side-combined
    aggregation over the feature scan producing a 1-row gradient, which
    crossJoin-broadcasts back as the next step's weights; `steps` is
    unrolled into a single lazy plan, no driver-side data movement. The
    6-feature projection (7 doubles/row) is `tracked_persist`ed before
    the loop (VERDICT r8 #2) so the corpus text is scanned/tokenized
    ONCE total instead of once per step — the same shingle-persist
    discipline `minhash_lsh_pairs` uses."""
    from ._cache import tracked_persist

    feats = tracked_persist(_surface_feats(documents))
    weights = feats.sparkSession.createDataFrame(
        [(0.0,) * 6], "w0 double, w1 double, w2 double, w3 double, "
                      "w4 double, w5 double")
    for _ in range(steps):
        z = sum((F.col(f"w{j}") * F.col(f"x{j}") for j in range(1, 6)),
                F.col("w0") * F.col("x0"))
        resid = 1.0 / (1.0 + F.exp(-z)) - F.col("y")
        g = feats.crossJoin(F.broadcast(weights)).agg(
            *[F.avg(resid * F.col(f"x{j}")).alias(f"g{j}")
              for j in range(6)],
            *[F.first(f"w{j}").alias(f"w{j}_old") for j in range(6)],
        )
        weights = g.select(
            *[(F.col(f"w{j}_old") - lr * F.col(f"g{j}")).alias(f"w{j}")
              for j in range(6)])
    zf = sum((F.col(f"w{j}") * F.col(f"x{j}") for j in range(1, 6)),
             F.col("w0") * F.col("x0"))
    p = 1.0 / (1.0 + F.exp(-zf))
    return (
        feats.crossJoin(F.broadcast(weights))
        .agg(
            *[F.round(F.first(f"w{j}"), 6).alias(w_name)
              for j, w_name in enumerate(
                  ["w_bias", "w_log_n", "w_stop", "w_avg_pen",
                   "w_dup", "w_digit"])],
            F.round(F.avg(-(F.col("y") * F.log(p)
                            + (1.0 - F.col("y")) * F.log(1.0 - p))), 6)
            .alias("logloss"),
        )
    )


def quality_classifier_train_ngram(documents: DataFrame, steps: int = 3,
                                   lr: float = 0.5,
                                   dim: int = 1024) -> DataFrame:
    """TRAIN the quality classifier on HASHED N-GRAM features — the
    fastText/DCLM shape (Joulin et al. 2016; feature hashing Weinberger
    et al. 2009) instead of `quality_classifier_train`'s 6 surface
    features: every unigram and bigram hashes to one of `dim` signed
    buckets, a document's feature value is its bucket's signed-count
    share of the gram total, and full-batch logistic GD fits the
    lang=='en' label. Richer features, same label, same optimizer — so
    the two trainers' loglosses are directly comparable (pytest asserts
    this one wins).

    Output: ONE row (n_docs, n_buckets, w_bias, w_l2, logloss),
    weights summarized (a dim-sized weight table isn't a result row).

    100 TB shape: features stay SPARSE — one gram explode → per-(doc,
    bucket) map-side-combined signed counts → per-doc feature MAP; the
    weight vector is a broadcast (dim+1)-array per step (the PCA/kmeans
    broadcast-w pattern); each GD step costs one map-entry explode +
    groupBy(bucket) partial-agg shuffle whose output is ≤ dim+1 rows,
    and the per-doc z is a JVM fold over the doc's own sparse entries.
    `steps` is unrolled into one lazy plan; each 1-row weight level is
    persisted so the DAG stays linear."""
    from ._cache import tracked_persist, tracked_persist_extend

    toks = _tokens(F.col("text"))
    bi = F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b))
    base = documents.select(
        "doc_id", F.concat(toks, bi).alias("gs"),
        (F.col("lang") == "en").cast("double").alias("y"))
    ex = base.select("doc_id", F.explode("gs").alias("t"))
    bcol = (F.conv(F.substring(F.md5("t"), 1, 8), 16, 10)
            .cast("long") % dim).cast("int")
    scol = F.when(
        F.conv(F.substring(F.md5("t"), 9, 1), 16, 10)
        .cast("long") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    sp = (ex.select("doc_id", bcol.alias("b"), scol.alias("s"))
          .groupBy("doc_id", "b").agg(F.sum("s").alias("sv")))
    ng = base.select("doc_id", F.size("gs").alias("ng"), "y")
    rows = (
        sp.join(ng.select("doc_id", "ng"), "doc_id")
        .select("doc_id", "b",
                (F.col("sv") / F.col("ng")).cast("double").alias("v"))
        .unionByName(ng.select(
            "doc_id", F.lit(dim).cast("int").alias("b"),
            F.lit(1.0).alias("v")))
    )
    fmap = tracked_persist(
        rows.groupBy("doc_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("b", "v"))).alias("fm"))
        .join(ng.select("doc_id", "y"), "doc_id"))
    nd = fmap.agg(F.count("*").alias("_n"))
    # n_buckets from the CACHED feature map (its keys are exactly sp's
    # buckets plus the bias entry `dim`, which is excluded) — computing
    # it from `sp` re-ran the whole gram-explode+md5+groupBy pipeline a
    # second time as a broadcast subtree (profiled at 2.5 s of the key's
    # wall); this reads KB of cached map keys instead
    nb = (fmap.select(F.explode(F.map_keys("fm")).alias("b"))
          .filter(F.col("b") != dim)
          .agg(F.count_distinct("b").alias("_nb")))

    spark = documents.sparkSession
    w = spark.range(1).select(
        F.transform(F.sequence(F.lit(0), F.lit(dim)),
                    lambda i: F.lit(0.0)).alias("warr"))

    def z_of():
        return F.aggregate(
            F.map_entries("fm"), F.lit(0.0),
            lambda acc, e: acc + F.element_at(
                F.col("warr"), (e["key"] + 1).cast("int")) * e["value"])

    for _ in range(steps):
        scored = (fmap.crossJoin(F.broadcast(w))
                  .select("fm", "y", z_of().alias("z")))
        resid = (1.0 / (1.0 + F.exp(-F.col("z"))) - F.col("y"))
        gmap = (
            scored.select(resid.alias("r"),
                          F.explode(F.map_entries("fm")).alias("e"))
            .select(F.col("e.key").alias("b"),
                    (F.col("r") * F.col("e.value")).alias("gv"))
            .groupBy("b").agg(F.sum("gv").alias("g"))
            .agg(F.map_from_entries(
                F.collect_list(F.struct("b", "g"))).alias("gm"))
        )
        w = (w.crossJoin(F.broadcast(gmap)).crossJoin(F.broadcast(nd))
             .select(F.transform(
                 F.sequence(F.lit(0), F.lit(dim)),
                 lambda i: F.element_at(F.col("warr"),
                                        (i + 1).cast("int"))
                 - F.lit(lr)
                 * F.coalesce(F.element_at(F.col("gm"), i.cast("int")),
                              F.lit(0.0)) / F.col("_n"),
             ).alias("warr")))
        w = tracked_persist_extend(w)

    final = fmap.crossJoin(F.broadcast(w)).select("y", z_of().alias("z"))
    p = 1.0 / (1.0 + F.exp(-F.col("z")))
    lstats = final.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(-(F.col("y") * F.log(p)
                        + (1.0 - F.col("y")) * F.log(1.0 - p))), 6)
        .alias("logloss"))
    wstats = w.select(
        F.round(F.element_at("warr", dim + 1), 6).alias("w_bias"),
        F.round(F.sqrt(F.aggregate(
            "warr", F.lit(0.0), lambda a, x: a + x * x)), 6)
        .alias("w_l2"))
    return (lstats.crossJoin(F.broadcast(wstats))
            .crossJoin(F.broadcast(nb))
            .select("n_docs", F.col("_nb").alias("n_buckets"),
                    "w_bias", "w_l2", "logloss"))


def decontaminate_embedding(documents: DataFrame, threshold: float = 0.99,
                            n_planes: int = 4, dim: int = 64,
                            benchmark_mod: int = 13) -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding-space
    complement to the n-gram-overlap `decontaminate`/`decontaminate_fuzzy`
    pair (the modern eval-leakage gate: paraphrased or lightly-edited
    benchmark items survive shingle checks but not vector similarity):
    hash-embed the corpus in-engine (`textops.hash_embeddings`), sign-LSH
    bucket both sides with the engine's md5-seeded plane family, and
    cosine-verify only same-bucket (train × benchmark) candidates.

    The corpus is the synthetic-dup construction, so 'train' contains
    planted exact (+100000) and near (+200000) copies of benchmark-slice
    documents (doc_id % benchmark_mod == 0) — exact copies share the
    vector hence the bucket (recall 1.0 on them by construction).

    Output: (train_id, bench_id, cosine) — train documents that leak a
    benchmark item, with the verified similarity.

    100 TB shape: embeddings are int vectors from int-only shuffles; the
    candidate join keys on the 4-bit sign bucket (planes are broadcast
    literals, the `lsh_topk` family); the verification join touches only
    same-bucket pairs, and the benchmark side is a tiny broadcast."""
    from ._cache import tracked_persist
    from .dedup import with_synthetic_dups
    from .similarity import _dot, _norm, hash_planes
    from .textops import hash_embeddings

    corpus = with_synthetic_dups(documents)
    # persist the embedded corpus: the bench and train branches both
    # derive from it, and without the cache the tokenize+embed chain
    # would run twice (the once-per-consumer rescan class —
    # quality_classifier_train's r9 fix, same discipline)
    emb = tracked_persist(hash_embeddings(corpus, dim).select(
        "doc_id", F.col("v").cast("array<double>").alias("v")))
    planes = hash_planes(1, n_planes, dim)[0]

    def bucket(vcol):
        bits = [
            F.when(_dot(vcol, F.array(*[F.lit(x) for x in p])) >= 0, "1")
            .otherwise("0")
            for p in planes
        ]
        return F.concat(*bits)

    is_bench = (F.col("doc_id") % benchmark_mod == 0) & \
        (F.col("doc_id") < 100000)
    bench = (emb.filter(is_bench)
             .select(F.col("doc_id").alias("bench_id"),
                     F.col("v").alias("bv"))
             .withColumn("bkt", bucket(F.col("bv"))))
    train = (emb.filter(~is_bench)
             .select(F.col("doc_id").alias("train_id"), "v")
             .withColumn("bkt", bucket(F.col("v"))))
    return (
        train.join(F.broadcast(bench), "bkt")
        .select(
            "train_id", "bench_id",
            (_dot(F.col("v"), F.col("bv"))
             / (_norm(F.col("v")) * _norm(F.col("bv")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("train_id", "bench_id", F.round("cosine", 6).alias("cosine"))
    )


def weighted_sample_topk(documents: DataFrame, k: int = 100) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement (Efraimidis &
    Spirakis 2006 — public: draw u~U(0,1) per item, keep the top-k by
    priority u^(1/w)) — the quality-weighted subset draw a curation
    pipeline uses ('sample 10M documents proportional to quality').
    Computed in log space (ln u / w, identical ordering, fewer float
    ops) with the content-derived md5 uniform, so the sample is stable
    across re-ingests and reproduces in any engine.

    Weight = n_chars (document length — the standard size-proportional
    draw; swap in a quality score column in production).

    Output: (doc_id, weight, priority, rank), rank 1..k by priority
    desc (ties by doc_id).

    100 TB shape: a pure projection followed by TakeOrderedAndProject —
    per-partition k-row heaps, k rows to the driver, NO global sort and
    no shuffle of the corpus."""
    u = (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.col("doc_id"), F.col("text"))), 1, 15),
        16, 10).cast("double") / F.lit(float(1 << 60)))
    w = F.col("n_chars").cast("double")
    pri = F.log(u) / w
    scored = documents.select(
        "doc_id", w.cast("bigint").alias("weight"),
        F.round(pri, 6).alias("priority"), pri.alias("_p"))
    ranked = (scored.orderBy(F.col("_p").desc(), "doc_id").limit(k))
    win = Window.orderBy(F.col("_p").desc(), "doc_id")
    return (ranked.withColumn("rank", F.row_number().over(win))
            .select("doc_id", "weight", "priority", "rank"))


def bm25_topk(documents: DataFrame, k: int = 10, k1: float = 1.2,
              b: float = 0.75) -> DataFrame:
    """BM25 document ranking (Robertson & Zaragoza 2009 — public; the
    +1-smoothed idf form Lucene uses) — the retrieval scorer a
    training-data pipeline runs for targeted selection (rank the corpus
    against a benchmark/topic query, keep the head) and the natural
    sibling of `tfidf_topk` (which scores terms WITHIN a document; BM25
    ranks DOCUMENTS for a query).

    The query is derived deterministically from the corpus itself —
    the terms ranked 5..7 by document frequency (mid-head terms: present
    in many but not all documents) — standing in for a user query so the
    op is self-contained and oracle-checkable.

    score(D, Q) = sum over q in Q of
      idf(q) * tf(q,D)*(k1+1) / (tf(q,D) + k1*(1 - b + b*|D|/avgdl)),
      idf(q) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Per-term scores are floored to integer MICRO-units before the
    per-document sum, so the aggregation is exact integer arithmetic —
    immune to float summation order — and the ranking reproduces
    bit-for-bit in any engine (the micro-nat idiom of the unigram
    trainer).

    Output: (rank, doc_id, n_query_hits, score_micro, bm25), top-`k` by
    (score desc, doc_id).

    100 TB shape: one corpus-sized (doc_id, term) aggregation and one
    doc-length aggregation (both map-side combined); df table and the
    3-row query are vocabulary-bounded broadcasts; the scored stream is
    FILTERED to query terms before touching doc lengths, so the scoring
    join carries |Q| rows per matching document, not the corpus; final
    top-k is TakeOrderedAndProject — per-partition heaps, no global
    sort."""
    from ._cache import tracked_persist

    terms = documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
    # tf feeds THREE consumers (doc lengths, document frequencies, the
    # query-term scoring join): persist it so the corpus is tokenized and
    # tf-aggregated exactly once, not once per branch (ReuseExchange is
    # not guaranteed across these shapes) — the same single-scan
    # discipline as the classifier feature map and edit-distance front
    # ends. tests/test_plans.py pins the documents-scan count.
    tf = tracked_persist(
        terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("_n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("_avgdl"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    # TakeOrdered(7) FIRST so the rank window runs over 7 rows, never the
    # vocabulary (a global unpartitioned window over 100M terms would
    # single-partition the vocab)
    qw = Window.orderBy(F.col("df").desc(), F.col("term"))
    qterms = (df_tbl.orderBy(F.col("df").desc(), "term").limit(7)
              .withColumn("_r", F.row_number().over(qw))
              .filter((F.col("_r") >= 5) & (F.col("_r") <= 7))
              .select("term", "df"))
    qtf = tf.join(F.broadcast(qterms), "term")
    scored = (
        qtf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(1.0 + (F.col("_n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    norm = (F.col("tf").cast("double") + k1
            * (1.0 - b + b * F.col("dl").cast("double") / F.col("_avgdl")))
    term_score = idf * (F.col("tf").cast("double") * (k1 + 1.0)) / norm
    per_doc = (
        scored.select("doc_id",
                      F.floor(term_score * 1e6).alias("_micro"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_query_hits"),
             F.sum("_micro").alias("score_micro"))
    )
    topk = per_doc.orderBy(
        F.col("score_micro").desc(), "doc_id").limit(k)
    rw = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return topk.select(
        F.row_number().over(rw).alias("rank"),
        "doc_id", "n_query_hits", "score_micro",
        F.round(F.col("score_micro") / 1e6, 6).alias("bm25"),
    )


def quality_classifier_eval(documents: DataFrame, steps: int = 3,
                            lr: float = 0.5) -> DataFrame:
    """EVALUATE the trained quality classifier — the metrics report a
    model gate ships with: ROC-AUC plus precision/recall/accuracy at
    the 0.5 threshold, against the same trusted label the trainer
    distilled from. Scoring uses the trainer's PUBLISHED (6dp-rounded)
    weights — evaluation measures the artifact you deploy, not the
    internal float state.

    AUC is computed by the tie-aware histogram method (the Mann-Whitney
    rank-sum identity): scores round to 6dp, (n_pos, n_neg) per distinct
    score, AUC = Σ_s n_pos(s)·(cum_neg_below(s) + n_neg(s)/2) / (P·N).
    Every contribution is an exact multiple of 0.5 (integer counts), so
    the sum is float-order-immune and reproduces bit-for-bit.

    Output: one row (n_pos, n_neg, auc, precision_at_half,
    recall_at_half, accuracy).

    100 TB shape: one feature scan + the trainer's unrolled steps, then
    a map-side-combined groupBy(score) HISTOGRAM — bounded by distinct
    6dp scores, ≪ corpus — whose cumulative window runs on that tiny
    table (the curriculum_shards discipline: no global row sort ever);
    confusion counts are one more 1-row aggregate."""
    from ._cache import tracked_persist_extend

    trained = quality_classifier_train(documents, steps, lr)
    weights = trained.select(
        *[F.col(c).alias(f"w{j}") for j, c in enumerate(
            ["w_bias", "w_log_n", "w_stop", "w_avg_pen",
             "w_dup", "w_digit"])])
    feats = _surface_feats(documents)
    z = sum((F.col(f"w{j}") * F.col(f"x{j}") for j in range(1, 6)),
            F.col("w0") * F.col("x0"))
    scored = tracked_persist_extend(
        feats.crossJoin(F.broadcast(weights))
        .select(F.round(1.0 / (1.0 + F.exp(-z)), 6).alias("s"),
                F.col("y")))
    hist = scored.groupBy("s").agg(
        F.sum("y").alias("np_s"),
        F.sum(1.0 - F.col("y")).alias("nn_s"))
    wcum = (Window.orderBy("s")
            .rowsBetween(Window.unboundedPreceding, -1))
    contrib = (F.col("np_s")
               * (F.coalesce(F.sum("nn_s").over(wcum), F.lit(0.0))
                  + F.col("nn_s") / 2.0))
    auc_parts = hist.select(contrib.alias("c"), "np_s", "nn_s").agg(
        F.sum("c").alias("num"),
        F.sum("np_s").alias("n_pos"),
        F.sum("nn_s").alias("n_neg"))
    conf = scored.agg(
        F.sum(F.when((F.col("s") >= 0.5) & (F.col("y") == 1.0), 1)
              .otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("s") >= 0.5) & (F.col("y") == 0.0), 1)
              .otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("s") < 0.5) & (F.col("y") == 1.0), 1)
              .otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("s") < 0.5) & (F.col("y") == 0.0), 1)
              .otherwise(0)).alias("tn"))
    return (
        auc_parts.crossJoin(F.broadcast(conf))
        .select(
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            F.round(F.col("num") / (F.col("n_pos") * F.col("n_neg")), 6)
            .alias("auc"),
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6)
            .alias("precision_at_half"),
            F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6)
            .alias("recall_at_half"),
            F.round((F.col("tp") + F.col("tn"))
                    / (F.col("tp") + F.col("fp") + F.col("fn")
                       + F.col("tn")), 6).alias("accuracy"),
        )
    )
