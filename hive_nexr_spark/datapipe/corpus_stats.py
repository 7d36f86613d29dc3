"""Corpus-level statistics and sampling operators: global heavy-hitter
tokens, unigram-LM perplexity scoring, and exact-quota stratified
sampling.

All three are two-level aggregations (map-side combine first) plus, where
a corpus-wide constant is needed (total token count, vocabulary size,
stratum sizes), a broadcast 1-row/one-row-per-stratum aggregate folded
into the plan — no driver-side `.count()`, every operator stays lazy and
single-pass over the corpus.

Reference parity note: the reference engine exposes these shapes as ad-hoc
HiveQL (GROUP BY + ORDER BY LIMIT, join against an aggregated subquery);
here they are first-class pipeline operators with the 100 TB physical
shape pinned by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import _tokens


def token_heavy_hitters(documents: DataFrame, k: int = 20) -> DataFrame:
    """Exact global top-k tokens with corpus share.

    Output: (token, n_occurrences, share, rank) — rank 1..k by count desc,
    token asc for determinism.

    100 TB shape: explode + groupBy(token) is map-side combined (one row
    per distinct token per partition through the shuffle); the top-k is
    TakeOrderedAndProject (per-partition heaps, k rows to the driver —
    never a global sort); the corpus total rides in as a broadcast 1-row
    aggregate, not a second scan (the count re-aggregates the token
    table, which is vocabulary-sized, not corpus-sized).
    """
    terms = documents.select(F.explode(_tokens(F.col("text"))).alias("token"))
    counts = terms.groupBy("token").agg(F.count("*").alias("n_occurrences"))
    total = counts.agg(
        F.sum("n_occurrences").cast("double").alias("_total"))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    topk = (
        counts.orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("_total"), 6).alias("share"),
        )
    )
    # rank over the k-row result — the window input is already ≤ k rows,
    # so the single-partition window is bounded by construction
    return topk.withColumn("rank", F.row_number().over(w))


def perplexity_unigram(documents: DataFrame,
                       flag_bits: float = 10.0) -> DataFrame:
    """Per-document bits-per-token under an add-one-smoothed corpus
    unigram language model: score(d) = -avg_t log2 p(t), with
    p(t) = (count(t) + 1) / (total_tokens + vocab_size).

    The classic cheap quality signal (CCNet-style perplexity bucketing,
    with the corpus itself as the LM): documents whose tokens are globally
    rare score high and get flagged.

    Output: (doc_id, n_tokens, bits_per_token, high_ppl).

    100 TB shape: TWO token-level shuffles total — (doc_id, token) tf
    aggregation and token → global count — then the vocabulary-sized LM
    table joins back BROADCAST (vocabulary grows ~log of corpus, it fits),
    and (total, V) is a broadcast 1-row aggregate over the LM table. The
    final per-doc aggregation shuffles one row per (doc, distinct token).
    No driver-side counts; the whole operator is one lazy plan.
    """
    terms = documents.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    tf = terms.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    lm = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    totals = lm.agg(
        F.sum("cnt").cast("double").alias("_total"),
        F.count("*").cast("double").alias("_vocab"),
    )
    scored = (
        tf.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id", "tf",
            (-F.log2((F.col("cnt") + 1.0)
                     / (F.col("_total") + F.col("_vocab")))).alias("bits"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.round(
            F.sum(F.col("tf") * F.col("bits")) / F.sum("tf"), 6
        ).alias("bits_per_token"),
    )
    return per_doc.select(
        "doc_id", "n_tokens", "bits_per_token",
        (F.col("bits_per_token") > flag_bits).alias("high_ppl"),
    )


def stratified_sample(documents: DataFrame, quota: int = 10,
                      oversample: float = 4.0) -> DataFrame:
    """Exact-quota stratified sample: deterministically pick `quota`
    documents per `source` stratum, ordered by a content-independent hash
    (md5 of source:doc_id) so the sample is stable across runs and
    re-ingests.

    Output: (source, doc_id, pick) with pick = 1..quota per source.

    100 TB shape: a naive per-stratum row_number() sorts EVERY row of the
    largest stratum through one partition. Instead: (1) per-stratum counts
    via map-side-combined groupBy, broadcast back; (2) a hash-threshold
    PRE-FILTER keeps ~oversample×quota expected rows per stratum (each row
    compares its hash against quota*oversample/stratum_count — pure
    map-side, no shuffle); (3) the exact row_number window runs on the
    surviving ~40 rows per stratum. Deterministic because the threshold
    depends only on the exact counts and the hash is content-derived.
    oversample=4 makes a short stratum (< quota survivors) vanishingly
    unlikely; correctness for SMALL strata is preserved exactly because
    the threshold formula degenerates to "keep all" when
    quota*oversample >= stratum_count.
    """
    # 64-bit uniform in [0, 1): first 15 hex chars of md5 (60 bits)
    u = (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.col("source"), F.col("doc_id"))), 1, 15),
        16, 10).cast("double") / F.lit(float(1 << 60)))
    sized = documents.select("source", "doc_id", u.alias("u"))
    counts = sized.groupBy("source").agg(F.count("*").alias("n_stratum"))
    survivors = (
        sized.join(F.broadcast(counts), "source")
        .filter(F.col("u") * F.col("n_stratum")
                < F.lit(float(quota) * oversample))
    )
    w = Window.partitionBy("source").orderBy("u", "doc_id")
    return (
        survivors.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= quota)
        .select("source", "doc_id", "pick")
    )


def curriculum_shards(documents: DataFrame, n_shards: int = 4) -> DataFrame:
    """Curriculum sharding: assign every document to a difficulty shard
    by its unigram-LM bits-per-token (easy→hard training order, the
    standard curriculum/annealing data layout). Equal scores always land
    in the same shard, so the assignment is deterministic and stable
    across re-runs.

    Output: (doc_id, score, shard) with score = bits_per_token rounded
    to 2 decimals and shard in [0, n_shards).

    100 TB shape — exact quantiles WITHOUT a global sort: a corpus-wide
    ntile() would sort every row through one partition, the classic
    scale-killer. Instead the ROUNDED score (2 decimals → a few hundred
    distinct values, bounded regardless of corpus size) is histogrammed
    with a map-side-combined groupBy; the cumulative-count window and
    shard boundaries run on that TINY table (single-partition window
    over ~10^2 rows, bounded by construction); and the boundary table
    broadcasts back onto the per-doc stream. Score computation reuses
    the `perplexity_unigram` pipeline (two token shuffles + broadcast
    LM)."""
    per_doc = perplexity_unigram(documents).select(
        "doc_id", F.round("bits_per_token", 2).alias("score"))
    hist = per_doc.groupBy("score").agg(F.count("*").alias("cnt"))
    wcum = (Window.orderBy("score")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = hist.agg(F.sum("cnt").cast("double").alias("_n"))
    bounds = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .crossJoin(F.broadcast(tot))
        .select(
            "score",
            F.least(
                F.floor((F.col("cum") - F.col("cnt"))
                        * n_shards / F.col("_n")),
                F.lit(n_shards - 1)).cast("int").alias("shard"),
        )
    )
    return per_doc.join(F.broadcast(bounds), "score").select(
        "doc_id", "score", "shard")


def bpe_top_pairs(documents: DataFrame, k: int = 20) -> DataFrame:
    """The first BPE merge statistic (Sennrich et al. 2016, public arXiv
    1508.07909): the corpus-wide frequency of every adjacent character
    pair inside words — the pair a byte-pair-encoding tokenizer trainer
    merges first. Output: (pair, n_occurrences, rank) for the top `k`
    by (count desc, pair asc).

    100 TB shape — the detail that makes BPE training feasible at
    corpus scale: pairs are counted over the VOCABULARY (distinct words
    with their corpus counts), not over the raw token stream. One
    corpus-sized map-side-combined word count, then the pair explode
    runs over vocab-sized input (grows ~log corpus) weighted by the
    counts; the pair aggregation and top-k
    (TakeOrderedAndProject) are vocabulary-bounded. Iterating merges
    re-runs this over a re-segmented vocab — the per-iteration shape is
    identical."""
    words = documents.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w"))
    vocab = (words.filter(F.length("w") >= 2)
             .groupBy("w").agg(F.count("*").alias("n")))
    pairs = vocab.select(
        "n",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        )).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(F.sum("n").alias("n_occurrences"))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair"))
    return (
        agg.orderBy(F.col("n_occurrences").desc(), F.col("pair"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def bpe_train_merges(documents: DataFrame, n_merges: int = 6) -> DataFrame:
    """FULL BPE merge-loop training (Sennrich et al. 2016, public arXiv
    1508.07909 — learn_bpe): starting from the character segmentation of
    the corpus vocabulary, repeat `n_merges` times: count adjacent
    symbol pairs weighted by word frequency, merge the most frequent
    pair (ties broken lexicographically) in every word, record it.
    Completes `bpe_top_pairs`, which computes only merge #1 — by
    construction this op's step-1 row equals bpe_top_pairs' rank-1 row.

    Output: (step, lhs, rhs, merged, n_occurrences), step = 1..n_merges
    — the ordered merge table a BPE tokenizer ships as its model file
    (consumed downstream by `bpe_apply_tokenize(pieces=...)`).

    100 TB shape — the Sennrich trick that makes training corpus-free
    after ONE corpus pass: all per-iteration work runs over the DISTINCT
    WORD vocabulary (grows ~log corpus), never the token stream. One
    corpus-sized map-side-combined word count up front; then each
    unrolled step is a vocab-bounded pair explode + aggregation, a
    1-row TakeOrdered argmax broadcast back, and a JVM `aggregate` fold
    re-segmenting each word (greedy left-to-right merge via a
    delimited-string accumulator — the merged tail symbol no longer
    equals `lhs`, which is exactly the non-overlap rule). Every vocab
    level is persisted (`tracked_persist_extend`) so the lazy DAG stays
    LINEAR in n_merges: level k+1 references level k twice (directly
    and through its argmax), and without the cache the chain would
    re-expand 2^k. Zero Python UDFs anywhere.
    """
    steps, _vocab = _bpe_train_chain(documents, n_merges)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _bpe_train_chain(documents: DataFrame, n_merges: int
                     ) -> tuple[list[DataFrame], DataFrame]:
    """The unrolled merge loop behind `bpe_train_merges`; also returns
    the FINAL vocabulary segmentation (w, syms, n) — the table
    merge-order application consumes (each word's pieces after all
    learned merges)."""
    from ._cache import tracked_persist, tracked_persist_extend

    US = "\x1f"  # unit separator — cannot appear inside a symbol
    vocab = (
        documents.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter((F.length("w") >= 2) & ~F.col("w").contains(US))
        .groupBy("w").agg(F.count("*").alias("n"))
        .select("w", F.split("w", "").alias("syms"), "n")
    )
    # repartition(1) on the vocab table (r14 — the unigram trainer's
    # treatment, VERDICT item 5): the word-vocabulary is corpus-SUBLINEAR
    # (Heaps' law) and each merge level re-reads the cached table twice,
    # so a multi-partition cache turns every re-read into a core-count
    # task wave (cold probe: 871 tasks/63 stages). One partition is
    # right for a vocab that fits a task; a production deployment at
    # 100 TB sizes this by |vocab| bytes instead. Levels derive
    # narrowly, so the single partition propagates through the loop.
    vocab = tracked_persist(vocab.repartition(1))

    steps: list[DataFrame] = []
    for step in range(1, n_merges + 1):
        syms = F.col("syms")
        pairs = vocab.select(
            "n",
            F.explode(F.zip_with(
                F.slice(syms, 1, F.size(syms) - 1),
                F.slice(syms, 2, F.size(syms) - 1),
                lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
            )).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.lhs").alias("lhs"),
                          F.col("p.rhs").alias("rhs"))
            .agg(F.sum("n").alias("n_occurrences"))
            .orderBy(F.col("n_occurrences").desc(), "lhs", "rhs")
            .limit(1)
        )
        steps.append(best.select(
            F.lit(step).alias("step"), "lhs", "rhs",
            F.concat("lhs", "rhs").alias("merged"), "n_occurrences"))
        folded = F.aggregate(
            F.slice(syms, 2, F.size(syms) - 1),
            F.element_at(syms, 1),
            lambda acc, s: F.when(
                (F.substring_index(acc, US, -1) == F.col("lhs"))
                & (s == F.col("rhs")),
                F.concat(acc, s),
            ).otherwise(F.concat(acc, F.lit(US), s)),
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select("w", F.split(folded, US).alias("syms"), "n")
        )
        vocab = tracked_persist_extend(vocab)

    return steps, vocab


def bpe_apply_merge_order(documents: DataFrame,
                          n_merges: int = 6) -> DataFrame:
    """TRUE merge-ORDER BPE application (the other standard mode beside
    `tokenize_bpe_trained`'s greedy longest-match): a word's
    segmentation is the result of replaying the learned merges in
    training order — which the training chain already computes as its
    final vocabulary state, so application is a broadcast join of the
    corpus words against the (word → piece-count) table. By
    construction, training-set words segment EXACTLY as the trainer
    left them (the Sennrich reference property); words outside the
    trained vocabulary (length-1, delimiter-bearing) fall back to
    per-character pieces.

    Output: (doc_id, n_ws_tokens, n_bpe_tokens, pieces_per_word) —
    same schema as tokenize_bpe_apply, so the two application modes are
    directly comparable.

    100 TB shape: everything the trainer claims, plus ONE broadcast
    vocab join and a doc-keyed sum for the corpus pass — the word table
    is vocabulary-sized, never the token stream."""
    _steps, vocab = _bpe_train_chain(documents, n_merges)
    wp = vocab.select("w", F.size("syms").alias("np"))
    per_word = documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    return (
        per_word.join(F.broadcast(wp), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ws_tokens"),
            F.sum(F.coalesce("np", F.length("w"))).alias("n_bpe_tokens"),
            F.round(F.sum(F.coalesce("np", F.length("w"))) / F.count("*"),
                    6).alias("pieces_per_word"),
        )
    )


def bpe_apply_tokenize(documents: DataFrame, max_piece_len: int = 3,
                       vocab_size: int = 500,
                       pieces: DataFrame | None = None) -> DataFrame:
    """Apply a trained BPE-style subword vocabulary to the corpus —
    greedy longest-match segmentation (the WordPiece/BPE-apply inference
    step, Sennrich et al. 2016 arXiv 1508.07909), the pipeline-complete
    counterpart to `bpe_top_pairs` (which computes the training
    statistic). The "trained" vocab is derived deterministically here —
    the top-`vocab_size` character n-grams (length 2..`max_piece_len`)
    by corpus frequency — standing in for a loaded tokenizer artifact;
    the segmentation machinery is identical for any piece table.

    `pieces` (optional): a real trained piece table (one `piece` string
    column, e.g. `bpe_train_merges(...)` merged symbols) REPLACES the
    synthetic n-gram vocab; the match length bound then derives from the
    table itself (broadcast 1-row max piece length), so longer learned
    pieces still match. Greedy longest-match over a BPE-learned vocab is
    the WordPiece-style application mode — merge-ORDER replay is the
    other mode; both are standard, this op implements the former.

    Output: (doc_id, n_ws_tokens, n_bpe_tokens, pieces_per_word) — the
    subword token budget `pack_sequences` would consume instead of
    whitespace counts.

    100 TB shape — all per-character work happens on the DISTINCT WORD
    table (vocabulary-sized, grows ~log corpus), never the token
    stream: one corpus-sized map-side-combined word count, then n-gram
    vocab mining, per-position longest-match lookup (broadcast piece
    table), and the greedy left-to-right walk — an O(word_len) JVM
    `aggregate` over a per-word max-match array, zero Python UDFs, no
    per-step vocab scan — all run over distinct words. The corpus pays
    one broadcast join (word → piece count) and a doc-keyed sum. The
    walk is inherently sequential per word (BPE semantics), but words
    are bounded (longest word, not document) so the HOF is O(L)."""
    wcount = (
        documents.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n"))
    )
    if pieces is None:
        gtop = F.lit(max_piece_len)
        # vocab: top-V character n-grams weighted by word frequency
        grams = (
            wcount.select("n", "w",
                          F.explode(F.sequence(F.lit(2), gtop)).alias("g"))
            .filter(F.length("w") >= F.col("g"))
            .select("n", F.explode(F.transform(
                F.sequence(F.lit(1), F.length("w") - F.col("g") + 1),
                lambda i: F.col("w").substr(i, F.col("g")),
            )).alias("piece"))
        )
        vocab = (
            grams.groupBy("piece").agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("piece"))
            .limit(vocab_size)
            .select("piece")
        )
        pos_base = wcount.select("w")
    else:
        vocab = pieces.select("piece").distinct()
        # match-length bound from the trained table itself: broadcast
        # 1-row max so longer learned pieces still match
        gmax1 = vocab.agg(
            F.max(F.length("piece")).alias("_gtop"))
        pos_base = wcount.select("w").crossJoin(F.broadcast(gmax1))
        gtop = F.col("_gtop")
    # per (word, pos): longest vocab piece starting there (default 1 char)
    cand = (
        pos_base
        .select("*", F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("w"), F.lit(1)))
        ).alias("p"))
        .select("w", "p",
                F.explode(F.sequence(F.lit(2), gtop)).alias("g"))
        .filter(F.col("p") + F.col("g") - 1 <= F.length("w"))
        .select("w", "p", "g",
                F.col("w").substr(F.col("p"), F.col("g")).alias("piece"))
        .join(F.broadcast(vocab), "piece")
        .groupBy("w", "p").agg(F.max("g").alias("gmax"))
    )
    steps = (
        wcount.select("w")
        .join(cand.groupBy("w").agg(
            F.map_from_entries(
                F.collect_list(F.struct("p", "gmax"))).alias("gm")), "w",
            "left")
        .select(
            "w",
            # greedy walk: start at 1, advance by the longest match (or 1);
            # number of steps taken = number of subword pieces
            F.aggregate(
                F.sequence(F.lit(1), F.greatest(F.length("w"), F.lit(1))),
                F.struct(F.lit(1).alias("pos"), F.lit(0).alias("cnt")),
                lambda acc, _: F.when(
                    acc.pos <= F.length("w"),
                    F.struct(
                        (acc.pos + F.coalesce(
                            F.element_at(F.coalesce(
                                F.col("gm"),
                                F.map_from_arrays(
                                    F.array().cast("array<int>"),
                                    F.array().cast("array<int>"))),
                                acc.pos.cast("int")),
                            F.lit(1))).alias("pos"),
                        (acc.cnt + 1).alias("cnt"),
                    ),
                ).otherwise(acc),
                lambda acc: acc.cnt,
            ).alias("n_pieces"),
        )
    )
    per_word = documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    return (
        per_word.join(F.broadcast(steps), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ws_tokens"),
            F.sum("n_pieces").alias("n_bpe_tokens"),
            F.round(F.sum("n_pieces")
                    / F.count("*"), 6).alias("pieces_per_word"),
        )
    )


def _unigram_words(documents: DataFrame, max_word_len: int) -> DataFrame:
    """Distinct-word table for the unigram trainer: (w, n) for words of
    length 1..`max_word_len` (longer words are excluded from TRAINING
    and fall back to per-char counts at apply time — documented)."""
    return (
        documents.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
        .groupBy("w").agg(F.count("*").alias("n"))
    )


def _unigram_lp(vocab: DataFrame, score_col: str) -> DataFrame:
    """(piece, <score>) → (piece, lp) with lp = floor(1e6·ln(score/T))
    as a BIGINT — log-probs quantized to MICRO-NATS. The quantization is
    the cross-engine determinism device: Spark's Math.log and DuckDB's
    libm ln differ by 1 ulp on ~1% of integer inputs (measured), so raw
    double scores could flip Viterbi argmax tie-breaks between engines;
    integer scores make every DP comparison exact (a flip now needs the
    true value within ~2e-9 of a micro-nat boundary — negligible)."""
    tot = vocab.agg(F.sum(score_col).alias("_t"))
    return (
        vocab.crossJoin(F.broadcast(tot))
        .select("piece",
                F.floor(F.lit(1000000.0)
                        * F.log(F.col(score_col) / F.col("_t")))
                .cast("long").alias("lp"))
    )


def _unigram_viterbi(wc: DataFrame, vocab_lp: DataFrame,
                     max_piece_len: int) -> DataFrame:
    """Exact Viterbi segmentation of each distinct word under the piece
    unigram model (Kudo 2018 §3.2, hard-EM E-step): maximize Σ lp over
    segmentations, ties broken by the SMALLEST piece at each backward
    step. Two JVM `aggregate` folds per word — forward best-score DP
    (the accumulator is the growing best[] array), then backward
    reconstruction (integer-exact equality against best[], so the
    tie-break reproduces bit-for-bit in the SQL oracle). The piece
    table rides along as ONE broadcast map literal; zero Python UDFs;
    all work is on the distinct-word table.

    Output: (w, n, ps array<string>) — the argmax segmentation."""
    G = max_piece_len
    lpm = vocab_lp.agg(F.map_from_entries(
        F.collect_list(F.struct("piece", "lp"))).alias("_lpm"))
    forward = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.concat(acc, F.array(F.array_max(F.filter(
            F.transform(
                F.sequence(F.lit(1), F.least(F.lit(G), i)),
                lambda g: F.element_at(acc, (i - g + 1).cast("int"))
                + F.element_at(F.col("_lpm"),
                               F.col("w").substr(i - g + 1, g)),
            ),
            lambda x: x.isNotNull())))),
    )
    df = (wc.crossJoin(F.broadcast(lpm))
          .select("w", "n", "_lpm", forward.alias("_best")))

    def pick_g(pos):
        # smallest g whose edge reproduces best[pos] exactly (integer
        # scores — cross-engine-exact equality)
        return F.array_min(F.filter(
            F.transform(
                F.sequence(F.lit(1), F.least(F.lit(G), pos)),
                lambda g: F.when(
                    F.element_at(F.col("_best"),
                                 (pos - g + 1).cast("int"))
                    + F.element_at(F.col("_lpm"),
                                   F.col("w").substr(pos - g + 1, g))
                    == F.element_at(F.col("_best"),
                                    (pos + 1).cast("int")),
                    g,
                ).otherwise(F.lit(None).cast("int"))),
            lambda x: x.isNotNull()))

    backward = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(F.length("w").cast("int").alias("pos"),
                 F.array().cast("array<string>").alias("ps")),
        lambda st, _: F.when(st["pos"] <= F.lit(0), st).otherwise(
            F.struct(
                (st["pos"] - pick_g(st["pos"])).cast("int").alias("pos"),
                F.concat(
                    st["ps"],
                    F.array(F.col("w").substr(
                        st["pos"] - pick_g(st["pos"]) + 1,
                        pick_g(st["pos"])))).alias("ps"),
            )),
        lambda st: st["ps"],
    )
    return df.select("w", "n", backward.alias("ps"))


def _unigram_train_chain(documents: DataFrame, em_iters: int = 2,
                         max_piece_len: int = 4, seed_multi: int = 300,
                         keep_multi: int = 200, max_word_len: int = 20
                         ) -> tuple[DataFrame, DataFrame]:
    """The unrolled unigram-LM trainer (Kudo 2018, arXiv 1804.10959 —
    the SentencePiece alternative beside BPE), hard-EM variant:

      seed: all substrings (len 1..G) of the distinct-word vocabulary,
            frequency-weighted; ALL single chars + top `seed_multi`
            multi-char pieces by (count DESC, piece ASC)
      E:    Viterbi-segment every distinct word under the current
            micro-nat piece scores (`_unigram_viterbi`)
      M:    piece count = Σ_w n_w · uses_in_w; PRUNE to all single
            chars + top `keep_multi` multi-char pieces by (count DESC,
            piece ASC); re-score with add-one smoothing (sc = cnt + 1,
            so never-used single chars stay finite — coverage is
            guaranteed because single chars are never pruned, Kudo's
            own invariant)

    Deviations from the paper, chosen for deterministic cross-engine
    oracles and documented as spec: hard (Viterbi) counts instead of
    forward-backward expectations; fixed-size (count, piece)-ranked
    pruning instead of likelihood-loss ranking; micro-nat integer
    scores (`_unigram_lp`).

    Returns (final vocab (piece, cnt, sc) + its lp table joined in,
    the distinct-word table). Each level's vocab is a few-hundred-row
    table; every level is persisted so the unrolled DAG stays linear.

    100 TB shape — the same Sennrich/Kudo leverage as the BPE trainer:
    one corpus-sized word count up front, then every EM step runs over
    the DISTINCT WORD table (~log corpus) with the piece table riding
    as a broadcast map; the corpus never reshuffles."""
    from ._cache import tracked_persist, tracked_persist_extend

    wc = tracked_persist(_unigram_words(documents, max_word_len))
    grams = wc.select(
        "w", "n",
        F.explode(F.sequence(F.lit(1), F.lit(max_piece_len))).alias("g"),
    ).filter(F.length("w") >= F.col("g")).select(
        "n",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("w") - F.col("g") + 1),
            lambda s: F.col("w").substr(s, F.col("g")),
        )).alias("piece"),
    )
    # seed feeds THREE consumers (chars, the multi-char top-k, the vocab
    # score join) — unpersisted it re-ran the grams explode + aggregation
    # (a full wc scan) per consumer (r14; piece table is bounded by the
    # substring space, 1 partition)
    seed = tracked_persist_extend(
        grams.groupBy("piece").agg(F.sum("n").alias("cnt")).repartition(1))
    chars = seed.filter(F.length("piece") == 1).select("piece")
    # EXTEND, not tracked_persist: `wc` (and `chars` for the vocab below)
    # stay referenced by every EM level of this one unrolled plan — a
    # plain tracked_persist would evict them before anything materializes
    # and each Viterbi level would recount words from the corpus.
    # repartition(1) on the BOUNDED tables (vocab <= chars + seed_multi
    # rows at ANY corpus scale): cached at shuffle-partition granularity
    # they cost a full task wave per re-read — measured 1,114 tasks/run
    # on this key, most of them 33-130-task waves over KB-sized caches.
    # The tiny round-robin exchange preserves upstream parallelism
    # (unlike coalesce, which would collapse the producing aggregation).
    chars = tracked_persist_extend(chars.repartition(1))
    multis = (seed.filter(F.length("piece") > 1)
              .orderBy(F.col("cnt").desc(), "piece").limit(seed_multi)
              .select("piece"))
    vocab = tracked_persist_extend(
        seed.join(chars.unionByName(multis), "piece")
        .select("piece", F.col("cnt").alias("sc")).repartition(1))
    final_cnt = None
    for _ in range(em_iters):
        lp = _unigram_lp(vocab, "sc")
        segs = _unigram_viterbi(wc, lp, max_piece_len)
        # cnt feeds TWO consumers (the prune top-k and the vocab left
        # join) — unpersisted, the VITERBI SEGMENTATION of every word ran
        # twice per EM level (r14; piece-count table, vocab-bounded)
        cnt = tracked_persist_extend(
            segs.select("n", F.explode("ps").alias("piece"))
            .groupBy("piece").agg(F.sum("n").alias("cnt")).repartition(1))
        kept_multi = (cnt.filter(F.length("piece") > 1)
                      .orderBy(F.col("cnt").desc(), "piece")
                      .limit(keep_multi).select("piece"))
        kept = chars.unionByName(kept_multi)
        vocab = (kept.join(cnt, "piece", "left")
                 .select("piece",
                         F.coalesce("cnt", F.lit(0)).alias("cnt"),
                         (F.coalesce("cnt", F.lit(0)) + 1).alias("sc")))
        # bounded level table (chars + keep_multi rows) — 1 partition
        vocab = tracked_persist_extend(vocab.repartition(1))
        final_cnt = vocab
    return final_cnt, wc


def unigram_train(documents: DataFrame, em_iters: int = 2,
                  max_piece_len: int = 4, top_k: int = 30) -> DataFrame:
    """Unigram-LM tokenizer TRAINING — the model table a SentencePiece-
    style tokenizer ships. Output: the top `top_k` pieces of the final
    vocabulary by Viterbi usage: (rank, piece, piece_len, n_viterbi,
    prob) where n_viterbi is the raw hard-EM count and prob the
    smoothed unigram probability (rounded 6)."""
    vocab, _wc = _unigram_train_chain(documents, em_iters, max_piece_len)
    tot = vocab.agg(F.sum("sc").alias("_t"))
    w = Window.orderBy(F.col("n_viterbi").desc(), F.col("piece"))
    return (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            F.col("piece"),
            F.length("piece").cast("int").alias("piece_len"),
            F.col("cnt").alias("n_viterbi"),
            F.round(F.col("sc") / F.col("_t"), 6).alias("prob"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "piece", "piece_len", "n_viterbi", "prob")
    )


def unigram_apply(documents: DataFrame, em_iters: int = 2,
                  max_piece_len: int = 4,
                  max_word_len: int = 20) -> DataFrame:
    """APPLY the trained unigram model: Viterbi-segment every corpus
    word under the final piece scores (the inference mode of Kudo 2018
    — argmax instead of sampling). Words longer than `max_word_len`
    fall back to per-char pieces (they were excluded from training).

    Output: (doc_id, n_ws_tokens, n_unigram_tokens, pieces_per_word) —
    schema-compatible with the BPE application modes, so all three
    tokenizers are directly comparable.

    100 TB shape: everything the trainer claims, plus ONE broadcast
    (word → piece count) join and a doc-keyed sum for the corpus pass."""
    vocab, wc = _unigram_train_chain(documents, em_iters, max_piece_len)
    lp = _unigram_lp(vocab, "sc")
    wp = _unigram_viterbi(wc, lp, max_piece_len).select(
        "w", F.size("ps").alias("np"))
    per_word = documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    return (
        per_word.filter(F.length("w") >= 1)
        .join(F.broadcast(wp), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ws_tokens"),
            F.sum(F.coalesce("np", F.length("w")))
            .alias("n_unigram_tokens"),
            F.round(F.sum(F.coalesce("np", F.length("w")))
                    / F.count("*"), 6).alias("pieces_per_word"),
        )
    )


def corpus_summary(documents: DataFrame) -> DataFrame:
    """One-pass corpus data card: document/token counts, length stats,
    per-language totals, and the exact-duplicate rate — the summary block
    a training-data pipeline emits after ingestion.

    Output: one row per lang plus an '__all__' rollup —
    (lang, n_docs, n_tokens, avg_doc_tokens, n_distinct_texts, dup_rate).

    100 TB shape: ONE scan; per-doc features (token count, md5 digest)
    are a projection, the per-language rollup is a map-side-combined
    groupBy over a GROUPING SETS-style union expressed as one Expand
    (cube on lang folded to the two grouping levels), and distinct-text
    counting uses the 16-byte digest, never the text. No joins.
    """
    per_doc = documents.select(
        "lang",
        F.size(_tokens(F.col("text"))).alias("n_toks"),
        F.md5(F.col("text")).alias("digest"),
    )
    g = (
        per_doc.rollup("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(F.avg("n_toks"), 6).alias("avg_doc_tokens"),
            F.count_distinct("digest").alias("n_distinct_texts"),
        )
    )
    return g.select(
        F.coalesce(F.col("lang"), F.lit("__all__")).alias("lang"),
        "n_docs", "n_tokens", "avg_doc_tokens", "n_distinct_texts",
        F.round(1.0 - F.col("n_distinct_texts") / F.col("n_docs"), 6)
        .alias("dup_rate"),
    )


def perplexity_bigram(documents: DataFrame,
                      flag_bits: float = 12.0) -> DataFrame:
    """Per-document bits-per-bigram under an add-one-smoothed corpus
    BIGRAM language model: p(w2|w1) = (count(w1 w2) + 1) /
    (count(w1) + V) — the next step up from `perplexity_unigram` in the
    CCNet-style quality ladder (context-sensitive: a document of common
    words in unusual ORDER now scores high).

    Output: (doc_id, n_bigrams, bits_per_bigram, high_ppl).

    100 TB shape: token-level shuffles are (doc, w1, bigram) tf and the
    two LM aggregations derived FROM that tf table (map-side combined).
    The unigram table and the (V) total broadcast (vocabulary-sized);
    the bigram LM joins back keyed on the bigram — bigram vocabulary
    grows faster than unigram but still sublinearly, and the join is
    hash-keyed with AQE free to broadcast when it fits; it is never a
    corpus-wide sort or cartesian."""
    toks = documents.select("doc_id", _tokens(F.col("text")).alias("ts"))
    grams = (
        toks.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.concat_ws(
                        " ", F.element_at("ts", i),
                        F.element_at("ts", i + 1)).alias("gram")),
            )).alias("g"),
        )
        .select("doc_id", "g.w1", "g.gram")
    )
    tf = grams.groupBy("doc_id", "w1", "gram").agg(F.count("*").alias("tf"))
    blm = tf.groupBy("w1", "gram").agg(F.sum("tf").alias("bcnt"))
    ulm = tf.groupBy("w1").agg(F.sum("tf").alias("ucnt"))
    vocab = (documents.select(
        F.explode(_tokens(F.col("text"))).alias("token"))
        .agg(F.count_distinct("token").cast("double").alias("_v")))
    scored = (
        tf.join(blm, ["w1", "gram"])
        .join(F.broadcast(ulm), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id", "tf",
            (-F.log2((F.col("bcnt") + 1.0)
                     / (F.col("ucnt") + F.col("_v")))).alias("bits"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        F.round(F.sum(F.col("tf") * F.col("bits")) / F.sum("tf"), 6)
        .alias("bits_per_bigram"),
    )
    return per_doc.select(
        "doc_id", "n_bigrams", "bits_per_bigram",
        (F.col("bits_per_bigram") > flag_bits).alias("high_ppl"),
    )


def perplexity_kneser_ney(documents: DataFrame, discount: float = 0.75,
                          flag_bits: float = 10.0) -> DataFrame:
    """Per-document bits-per-bigram under an INTERPOLATED KNESER-NEY
    bigram LM (Kneser & Ney 1995; Chen & Goodman 1998 — public), the
    smoothing the CCNet/KenLM quality-filter models actually use (the
    top of the engine's perplexity ladder: unigram → add-one bigram →
    KN bigram):

        p(w2|w1) = max(c(w1 w2) − D, 0) / c(w1)
                 + D·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)

    — absolute discounting with the continuation-probability backoff
    (how many CONTEXTS a word follows, not how often it occurs).

    Output: (doc_id, n_bigrams, bits_per_bigram, high_ppl).

    100 TB shape — identical skeleton to `perplexity_bigram`: one
    (doc, w1, w2) tf shuffle, every LM table derived from it map-side
    combined; the continuation tables N1+(w1,·) / N1+(·,w2) are
    per-word DISTINCT-bigram counts (vocabulary-sized, broadcast), the
    type total is a 1-row broadcast, and the score join keys on the
    bigram — never a corpus sort or cartesian."""
    toks = documents.select("doc_id", _tokens(F.col("text")).alias("ts"))
    grams = (
        toks.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.element_at("ts", i + 1).alias("w2")),
            )).alias("g"),
        )
        .select("doc_id", "g.w1", "g.w2")
    )
    tf = grams.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    blm = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("bcnt"))
    ulm = tf.groupBy("w1").agg(F.sum("tf").alias("ucnt"))
    n1_w1 = blm.groupBy("w1").agg(F.count("*").alias("n1w1"))
    n1_w2 = blm.groupBy("w2").agg(F.count("*").alias("n1w2"))
    types = blm.agg(F.count("*").cast("double").alias("_t"))
    d = float(discount)
    p = (F.greatest(F.col("bcnt") - d, F.lit(0.0)) / F.col("ucnt")
         + (d * F.col("n1w1") / F.col("ucnt"))
         * (F.col("n1w2") / F.col("_t")))
    scored = (
        tf.join(blm, ["w1", "w2"])
        .join(F.broadcast(ulm), "w1")
        .join(F.broadcast(n1_w1), "w1")
        .join(F.broadcast(n1_w2), "w2")
        .crossJoin(F.broadcast(types))
        .select("doc_id", "tf", (-F.log2(p)).alias("bits"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        F.round(F.sum(F.col("tf") * F.col("bits")) / F.sum("tf"), 6)
        .alias("bits_per_bigram"),
    )
    return per_doc.select(
        "doc_id", "n_bigrams", "bits_per_bigram",
        (F.col("bits_per_bigram") > flag_bits).alias("high_ppl"),
    )


def hll_distinct_tokens(documents: DataFrame, b_bits: int = 10) -> DataFrame:
    """PORTABLE HyperLogLog distinct-token estimate (Flajolet et al.
    2007 — public): bucket = 12 md5 bits mod m=2^`b_bits`, ρ = leading
    zeros + 1 of the next 52 md5 bits, register = max ρ per bucket,
    E = α·m²/Σ2^-M with the standard linear-counting small-range
    correction. Because the hash is an md5 slice instead of an engine
    bit-mixer, the WHOLE SKETCH is engine-reproducible — unlike Spark's
    native `approx_count_distinct` (HLL++ over xxhash, rows-only
    checkable), this estimate hash-verifies against a SQL oracle
    bit-for-bit, and the op also reports the exact count so the
    estimation error is measured, not trusted.

    Output: one row (n_exact, hll_estimate, rel_err, n_registers).

    100 TB shape: ONE map-side-combined groupBy(bucket) bounded at m
    rows pre-shuffle per partition; the register table is m rows; the
    final math is a 1-row aggregate. This is exactly why sketches exist
    at scale — constant-size state per partition regardless of corpus
    size (the exact count pays a full distinct; at production scale
    you'd drop that column and keep the sketch)."""
    m = 1 << b_bits
    toks = documents.select(
        F.explode(_tokens(F.col("text"))).alias("t"))
    h = F.md5("t")
    bucket = (F.conv(F.substring(h, 1, 3), 16, 10).cast("long")
              % m).alias("bucket")
    tail = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    rho = F.when(tail == 0, F.lit(53)).otherwise(
        52 - F.floor(F.log2(tail))).alias("rho")
    regs = (toks.select(bucket, rho)
            .groupBy("bucket").agg(F.max("rho").alias("M")))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    stats = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("s"),
        F.count("*").alias("nz"),
    )
    exact = toks.agg(
        F.count_distinct("t").cast("double").alias("n_exact"))
    est_raw = alpha * m * m / (F.col("s") + (m - F.col("nz")))
    zeros = F.lit(float(m)) - F.col("nz")
    est = F.when(
        (est_raw <= 2.5 * m) & (zeros > 0),
        m * F.log(F.lit(float(m)) / zeros),
    ).otherwise(est_raw)
    return (
        stats.crossJoin(F.broadcast(exact))
        .select(
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.round(est, 6).alias("hll_estimate"),
            F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"),
                    6).alias("rel_err"),
            F.col("nz").alias("n_registers"),
        )
    )


def token_heavy_hitters_bounded(documents: DataFrame,
                                k_counters: int = 200) -> DataFrame:
    """EXACT frequent-token mining with a BOUNDED result shuffle: the
    two-pass candidates-then-recount shape behind Misra-Gries frequent
    mining (Misra & Gries 1982; merged-summary guarantee per Agarwal et
    al. 2013 — both public), with pass 1 expressed ENTIRELY JVM-side
    (r12 — replaced the engine's one headline `mapInPandas` path, whose
    Python-worker pool start dominated its wall at toy scale).

    - Pass 1 (candidates): any token with global count > N/(k+1) must
      exceed n_i/(k+1) in at least one partition i (if it cleared the
      per-partition threshold nowhere, summing gives count <= N/(k+1)).
      So candidates = tokens with per-partition count*(k+1) >
      n_partition, computed as ONE grouping-sets aggregation over
      (spark_partition_id, token) — the (pid) grand-total rows ride the
      same Expand+combine, so counts and totals see the SAME partition
      assignment by construction. At most k_counters tokens per
      partition can clear the threshold, so the candidate set is
      <= k x n_partitions rows — bounded, like the Misra-Gries summary
      union it replaces. (A strict-O(k)-memory pass 1 is the same rule
      with a custom mergeable-summary UDAF; Spark's spill-capable hash
      aggregate is the idiomatic stand-in, and the one exchange carries
      map-side-combined per-partition distinct tokens — the same volume
      the plain `token_heavy_hitters` combine ships.)
    - Pass 2 (exact recount): the bounded candidate set broadcasts back
      onto the token stream as a semi-join filter, and only candidate
      tokens enter the groupBy — the recount shuffle carries a bounded
      key set, not the vocabulary.
    - Threshold filter: keep tokens with n*(k+1) > N (pure-integer
      compare, so the SQL oracle reproduces it bit-for-bit). The result
      is EXACT — same rows a full groupBy would produce for the same
      predicate.

    Output: (token, n_occurrences, share, rank) like
    `token_heavy_hitters`, restricted to tokens above the N/(k+1)
    frequency threshold.
    """
    terms = documents.select(
        F.explode(_tokens(F.col("text"))).alias("token"))

    per_part = (
        terms.withColumn("_pid", F.spark_partition_id())
        .groupingSets([[F.col("_pid"), F.col("token")], [F.col("_pid")]],
                      F.col("_pid"), F.col("token"))
        .agg(F.count("*").alias("c"), F.grouping("token").alias("_g"))
    )
    part_totals = per_part.filter(F.col("_g") == 1).select(
        "_pid", F.col("c").alias("n_i"))
    candidates = (
        per_part.filter(F.col("_g") == 0)
        .join(F.broadcast(part_totals), "_pid")
        .filter(F.col("c") * (k_counters + 1) > F.col("n_i"))
        .select("token").distinct()
    )
    # total token count WITHOUT the explode: sum of per-doc sizes,
    # map-side combined to one row. size() is NULL or -1 on a NULL text
    # (legacy.sizeOfNull-dependent), either of which corrupts the
    # denominator; filtering NULL texts keeps exact parity with the
    # exploded term stream, which drops NULL rows.
    total = documents.filter(F.col("text").isNotNull()).agg(
        F.sum(F.size(_tokens(F.col("text")))).alias("_n"))
    exact = (
        terms.join(F.broadcast(candidates), "token")
        .groupBy("token").agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * (k_counters + 1) > F.col("_n"))
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return exact.select(
        "token",
        "n_occurrences",
        F.round(F.col("n_occurrences") / F.col("_n").cast("double"),
                6).alias("share"),
    ).withColumn("rank", F.row_number().over(w))


def kmv_corpus_overlap(documents: DataFrame, k: int = 128) -> DataFrame:
    """PORTABLE bottom-k (KMV) distinct sketch with SET OPERATIONS
    (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007 — both public):
    the k smallest hash values of a set estimate its distinct count as
    (k-1)·M/h_k, and — the property the other sketches here lack —
    bottom-k sketches are CLOSED under union, so two corpus sketches
    estimate |A∪B|, Jaccard (the fraction of the union sketch present
    in both sides), and |A∩B| without ever comparing the corpora
    row-by-row. This is the sketch a 100 TB pipeline uses to answer
    "how much does this new crawl overlap what we already have" from
    two k-row summaries instead of a corpus-sized join.

    Fixture: corpus A = documents with doc_id % 2 == 0, B = % 3 == 0
    (true overlap = % 6 == 0); elements hash via the first 12 hex chars
    of md5(doc_id) — engine-portable, so the DuckDB oracle reproduces
    every bit, including the estimator arithmetic. Each sketch is
    TakeOrdered(k) — O(k) memory per partition, no full sort; the exact
    counts computed alongside are the measured-error oracle (house
    style: sketch + exact + rel_err).

    Output: one row per measure ∈ {distinct_a, distinct_b, union,
    intersection} — (measure, n_exact, estimate, rel_err). Sketches
    smaller than k ARE their sets (estimate = exact by construction).
    """
    m_scale = float(16 ** 12)
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                16, 10).cast("long"))
    base = documents.select("doc_id", h.alias("h"))
    a = base.filter(F.col("doc_id") % 2 == 0).select("h").distinct()
    b = base.filter(F.col("doc_id") % 3 == 0).select("h").distinct()
    u = a.unionByName(b).distinct()
    k_u = u.orderBy("h").limit(k)

    def sketch_row(s: DataFrame, measure: str) -> DataFrame:
        sk = (s.orderBy("h").limit(k)
              .agg(F.count("*").alias("n_sk"), F.max("h").alias("hk")))
        ex = s.agg(F.count("*").alias("n_exact"))
        est = F.when(
            F.col("n_sk") < k, F.col("n_sk").cast("double")
        ).otherwise(F.lit(float(k - 1)) * F.lit(m_scale) / F.col("hk"))
        return ex.crossJoin(F.broadcast(sk)).select(
            F.lit(measure).alias("measure"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.round(est, 4).alias("estimate"),
            F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6)
            .alias("rel_err"))

    # intersection: coincidences of BOTH sides inside the union sketch,
    # scaled by the union estimate (m/n_kU collapses to the exact count
    # when the union sketch is unsaturated)
    inter_exact = a.join(b, "h", "left_semi")
    m_hits = (k_u.join(a, "h", "left_semi").join(b, "h", "left_semi")
              .agg(F.count("*").alias("m")))
    ku_stats = k_u.agg(F.count("*").alias("n_ku"), F.max("h").alias("hk"))
    est_u = F.when(
        F.col("n_ku") < k, F.col("n_ku").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(m_scale) / F.col("hk"))
    est_i = F.col("m") / F.col("n_ku") * est_u
    inter_row = (
        inter_exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(F.broadcast(m_hits))
        .crossJoin(F.broadcast(ku_stats))
        .select(F.lit("intersection").alias("measure"),
                F.col("n_exact").cast("bigint").alias("n_exact"),
                F.round(est_i, 4).alias("estimate"),
                F.round(F.abs(est_i - F.col("n_exact"))
                        / F.col("n_exact"), 6).alias("rel_err")))
    return (sketch_row(a, "distinct_a")
            .unionByName(sketch_row(b, "distinct_b"))
            .unionByName(sketch_row(u, "union"))
            .unionByName(inter_row))


def countmin_token_freq(documents: DataFrame, d: int = 4, w: int = 512,
                        probe_k: int = 15) -> DataFrame:
    """PORTABLE Count-Min sketch (Cormode & Muthukrishnan 2005 — public):
    d=`d` salted hash rows x w=`w` counter buckets; a token's estimate is
    the MIN over its d cells, never below the true count (one-sided
    error <= eps*N with prob 1-delta at w=e/eps, d=ln(1/delta)). The
    frequency-sketch companion to `hll_distinct_tokens` (distincts) and
    `token_heavy_hitters_bounded` (exact top-k): where Misra-Gries keeps
    only heavy keys, Count-Min answers point queries for ANY key from
    d*w integers. Hashes are salted md5 slices, so the whole sketch —
    cells AND estimates — reproduces bit-for-bit in any engine (the
    portable-sketch idiom of `hll_distinct_tokens`).

    Output: the `probe_k` most frequent tokens with
    (rank, token, n_exact, cm_estimate, overcount); cm_estimate >=
    n_exact always (pytest pins the one-sided guarantee).

    100 TB shape: ONE corpus-sized map-side-combined token count (the
    same first pass every corpus-stats op pays), then everything is
    vocabulary-bounded: the cell table is d*w rows built from the
    distinct-token table, probes are a broadcast k-row TakeOrdered, and
    the estimate join keys on (row, bucket) against the d*w-row cell
    table. At production scale the exact-count column drops and the
    sketch merges across shards by cell-wise addition (it is a linear
    sketch — the property that makes it streamable and shard-mergeable).
    """
    tf = (
        documents.select(F.explode(_tokens(F.col("text"))).alias("t"))
        .groupBy("t").agg(F.count("*").alias("n"))
    )

    def bucket(r: int) -> F.Column:
        h = F.md5(F.concat(F.lit(f"cm{r}:"), F.col("t")))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
                % w).alias("bucket")

    hashed = tf.select(
        "t", "n",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"), bucket(r).alias("bucket"))
            for r in range(d)
        ])).alias("cell"),
    ).select("t", "n", F.col("cell.r").alias("r"),
             F.col("cell.bucket").alias("bucket"))
    cells = hashed.groupBy("r", "bucket").agg(
        F.sum("n").alias("cell_n"))
    probes = (
        tf.orderBy(F.col("n").desc(), "t").limit(probe_k)
        .withColumnRenamed("n", "n_exact")
    )
    probe_cells = hashed.join(
        F.broadcast(probes.select("t")), "t").select("t", "r", "bucket")
    est = (
        probe_cells.join(cells, ["r", "bucket"])
        .groupBy("t").agg(F.min("cell_n").alias("cm_estimate"))
    )
    w_rank = Window.orderBy(F.col("n_exact").desc(), F.col("t"))
    return (
        probes.join(F.broadcast(est), "t")
        .select(
            F.row_number().over(w_rank).alias("rank"),
            F.col("t").alias("token"),
            "n_exact",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("n_exact")).alias("overcount"),
        )
    )


def wordpiece_train_merges(documents: DataFrame,
                           n_merges: int = 6) -> DataFrame:
    """WordPiece merge-loop training (Schuster & Nakajima 2012; the
    likelihood-scored variant documented publicly in the HuggingFace
    tokenizers course) — completes the tokenizer-trainer trio beside
    `bpe_train_merges` (frequency argmax) and `unigram_train` (EM prune):
    WordPiece picks the pair maximizing
    score = count(pair) / (count(lhs) * count(rhs)) — frequency
    NORMALIZED by the parts' own frequencies, so it prefers pairs whose
    parts rarely occur apart (a likelihood-ratio argmax) where BPE takes
    raw frequency.

    Output: (step, lhs, rhs, merged, n_occurrences, score_micro) — the
    score floored to integer 1e-12 units BEFORE the argmax so the
    election is exact integer comparison in any engine (the micro-nat
    idiom; ties break lexicographically on (lhs, rhs)).

    100 TB shape — the BPE trainer's chain (all per-step work on the
    DISTINCT-WORD vocab table) with one extra ingredient, per-symbol
    counts, obtained WITHOUT a second corpus-of-vocab pass: each level
    aggregates ONE exploded (sym, next-sym) table — zip_with null-pads
    the tail, so the (sym, NULL) rows make the symbol marginal — and
    both the pair counts (rhs NOT NULL) and the symbol counts (groupBy
    lhs) read that single persisted aggregate. Symbol counts then ride
    as a 1-ROW BROADCAST MAP (map_from_entries — the zero-Exchange
    broadcast-array idiom of the kmeans/PQ family) cross-joined onto
    the pair rows, so scoring adds NO join and NO exchange. Net: each
    unrolled level references the previous through only TWO edges
    (fold + entries) — fewer than the BPE trainer's three — which is
    what keeps the 6-level plan tree compact; 1-row TakeOrdered argmax
    broadcast; JVM `aggregate` fold re-segmentation. Unlike the BPE
    trainer (3 cross-references/level, tolerable at its plan size),
    this chain TRUNCATES LINEAGE per level with a lazy localCheckpoint
    on the vocab table: each unrolled level becomes a leaf in the next
    level's plan, so the 6-level tree stays O(levels) — the standard
    posture for iterative Spark algorithms (at cluster scale the
    checkpoint goes to reliable storage; the checkpointed state is the
    VOCAB table, ~log corpus, never corpus data). Zero Python UDFs."""
    from ._cache import tracked_persist_extend

    US = "\x1f"
    vocab = (
        documents.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter((F.length("w") >= 2) & ~F.col("w").contains(US))
        .groupBy("w").agg(F.count("*").alias("n"))
        .select("w", F.split("w", "").alias("syms"), "n")
    )
    # repartition(1): same vocab-table treatment as _bpe_train_chain
    # (r14, VERDICT item 5) — the checkpointed level is re-read by the
    # pair statistics and the fold; see the scale note there
    vocab = vocab.repartition(1).localCheckpoint(eager=False)

    out = None
    for step in range(1, n_merges + 1):
        syms = F.col("syms")
        # ONE aggregate feeds both statistics: zip_with null-pads the
        # shorter successor array, so every symbol occurrence emits a
        # row — (sym, next) for pair counts, (sym, NULL) closing each
        # word so groupBy(lhs) is the exact symbol marginal
        entries = (
            vocab.select(
                "n",
                F.explode(F.zip_with(
                    syms,
                    F.slice(syms, 2, F.size(syms) - 1),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"),
                     F.col("p.rhs").alias("rhs"))
            .agg(F.sum("n").alias("cnt"))
        )
        # pairs table is vocab-bounded; 1 partition for the same reason
        entries = tracked_persist_extend(entries.repartition(1))
        sym_map = (
            entries.groupBy("lhs").agg(F.sum("cnt").alias("ns"))
            .agg(F.map_from_entries(F.collect_list(
                F.struct(F.col("lhs").alias("sym"), "ns"))).alias("_smap"))
        )
        score = F.floor(
            F.col("n_occurrences").cast("double") * 1e12
            / (F.element_at("_smap", F.col("lhs")).cast("double")
               * F.element_at("_smap", F.col("rhs")).cast("double"))
        ).alias("score_micro")
        best = (
            entries.filter(F.col("rhs").isNotNull())
            .withColumnRenamed("cnt", "n_occurrences")
            .crossJoin(F.broadcast(sym_map))
            .select("lhs", "rhs", "n_occurrences", score)
            .orderBy(F.col("score_micro").desc(), "lhs", "rhs")
            .limit(1)
        )
        row = best.select(
            F.lit(step).alias("step"), "lhs", "rhs",
            F.concat("lhs", "rhs").alias("merged"),
            "n_occurrences", "score_micro")
        out = row if out is None else out.unionByName(row)
        folded = F.aggregate(
            F.slice(syms, 2, F.size(syms) - 1),
            F.element_at(syms, 1),
            lambda acc, s: F.when(
                (F.substring_index(acc, US, -1) == F.col("lhs"))
                & (s == F.col("rhs")),
                F.concat(acc, s),
            ).otherwise(F.concat(acc, F.lit(US), s)),
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select("w", F.split(folded, US).alias("syms"), "n")
        )
        if step < n_merges:
            vocab = vocab.localCheckpoint(eager=False)

    return out


def zipf_fit(documents: DataFrame, top_r: int = 100) -> DataFrame:
    """Zipf rank-frequency diagnostic (Zipf 1949; the standard corpus
    health check — natural language lands near slope -1 on log-log
    rank/frequency; templated or synthetic text drifts flat or cliffy):
    OLS fit of ln(freq) on ln(rank) over the top-`top_r` ranks, with
    intercept and R².

    Cross-engine exactness: each per-rank moment term (x, y, x², y²,
    xy) is floored to integer NANO-units BEFORE summation, so the five
    OLS moments are exact BIGINT sums (float-order-immune) and the
    slope/intercept/R² derive from identical doubles in any engine —
    the micro-nat idiom applied to regression.

    Output: one row (n_ranks, zipf_slope, intercept, r2).

    100 TB shape: ONE corpus-sized map-side-combined token count, a
    TakeOrdered(top_r) head (per-partition heaps, no global sort), a
    rank window over top_r rows only, and a 1-row integer aggregate."""
    tf = (
        documents.select(F.explode(_tokens(F.col("text"))).alias("t"))
        .groupBy("t").agg(F.count("*").alias("n"))
    )
    top = tf.orderBy(F.col("n").desc(), "t").limit(top_r)
    w = Window.orderBy(F.col("n").desc(), F.col("t"))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("n").cast("double"))
    nano = 1e9
    terms = (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.floor(x * nano).alias("sx"),
            F.floor(y * nano).alias("sy"),
            F.floor(x * x * nano).alias("sxx"),
            F.floor(y * y * nano).alias("syy"),
            F.floor(x * y * nano).alias("sxy"),
        )
    )
    sums = terms.agg(
        F.count("*").alias("r_n"),
        (F.sum("sx") / nano).alias("ex"),
        (F.sum("sy") / nano).alias("ey"),
        (F.sum("sxx") / nano).alias("exx"),
        (F.sum("syy") / nano).alias("eyy"),
        (F.sum("sxy") / nano).alias("exy"),
    )
    rr = F.col("r_n").cast("double")
    sxx_c = rr * F.col("exx") - F.col("ex") * F.col("ex")
    syy_c = rr * F.col("eyy") - F.col("ey") * F.col("ey")
    sxy_c = rr * F.col("exy") - F.col("ex") * F.col("ey")
    slope = sxy_c / sxx_c
    return sums.select(
        F.col("r_n").cast("int").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.col("ey") / rr - slope * F.col("ex") / rr, 6)
        .alias("intercept"),
        F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6).alias("r2"),
    )
