"""Declared queries for the data-pipeline operators (dedup / similarity /
multimodal / text analysis) + DuckDB oracles where engine-portable."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datapipe import (chunking, corpus_stats, curation, dedup, layout,
                        multimodal, packing, pipeline, similarity, textops)
from .base import ensure_views


def _bind(builder, table):
    def run(spark, sf_dir):
        dfs = ensure_views(spark, sf_dir)
        return builder(dfs[table])

    run.__doc__ = builder.__doc__
    return run


def _lsh_planes_sql(n_planes: int = 4, dim: int = 64) -> str:
    """The md5-seeded hyperplanes `similarity.lsh_topk` hashes with, as a
    DuckDB inline relation (pid, pv). repr() of a Python float is
    shortest-round-trip, so the doubles parse back bit-identically."""
    planes = similarity.hash_planes(1, n_planes, dim)[0]
    return " UNION ALL ".join(
        f"SELECT {j} AS pid, [{', '.join(repr(x) for x in row)}]::DOUBLE[] AS pv"
        for j, row in enumerate(planes)
    )


def _minhash_full(documents):
    # max_doc_id >= the synthetic-dup modulus → no subset cap: the whole
    # corpus goes through the LSH pipeline (the shape you'd run at 100 TB)
    return dedup.minhash_lsh_pairs(documents, max_doc_id=100000)


QUERIES = {
    "dedup_exact": _bind(dedup.exact_dedup_summary, "documents"),
    "dedup_exact_decisions": _bind(dedup.exact_dedup_decisions, "documents"),
    "text_clean_corpus": _bind(textops.clean_corpus, "documents"),
    "dedup_minhash_lsh": _bind(dedup.minhash_lsh_pairs, "documents"),
    "dedup_minhash_lsh_full": _bind(_minhash_full, "documents"),
    "dedup_ngram_jaccard": _bind(dedup.ngram_jaccard_pairs, "documents"),
    "dedup_simhash": _bind(dedup.simhash_pairs, "documents"),
    "dedup_simhash_banded": _bind(dedup.simhash_pairs_banded, "documents"),
    "dedup_embedding_cosine": _bind(similarity.embedding_cosine_dups, "embeddings"),
    "dedup_embedding_lsh_full": _bind(similarity.embedding_dups_lsh, "embeddings"),
    "similarity_bruteforce_topk": _bind(similarity.brute_force_topk, "embeddings"),
    "similarity_lsh_topk": _bind(similarity.lsh_topk, "embeddings"),
    "similarity_ivf_topk": _bind(similarity.ivf_topk, "embeddings"),
    "corpus_prepare_pipeline": _bind(textops.prepare_corpus, "documents"),
    "text_token_counts": _bind(textops.token_counts, "documents"),
    "text_quality_scores": _bind(textops.quality_scores, "documents"),
    "text_language_id": _bind(textops.language_id, "documents"),
    "text_fingerprints": _bind(textops.fingerprints, "documents"),
    "multimodal_featurize": _bind(multimodal.featurize, "documents"),
    "multimodal_resize": _bind(multimodal.resize_payloads, "documents"),
    "multimodal_frame_sample": _bind(multimodal.sample_frames, "documents"),
    "pack_sequences": _bind(packing.pack_sequences, "documents"),
    "train_test_split_hash": _bind(packing.train_test_split, "documents"),
    "text_pii_redact": _bind(packing.pii_redact, "documents"),
    "decontaminate_benchmark": _bind(curation.decontaminate, "documents"),
    "text_repetition_filters": _bind(curation.repetition_filters,
                                     "documents"),
    "tfidf_topk_terms": _bind(curation.tfidf_topk, "documents"),
    "domain_mix_sample": _bind(curation.domain_mix_sample, "documents"),
    "quantize_embeddings_int8": _bind(curation.quantize_embeddings,
                                      "embeddings"),
    "dedup_connected_components": _bind(dedup.duplicate_clusters,
                                        "documents"),
    "dedup_incremental": _bind(dedup.incremental_dedup, "documents"),
    "chunk_documents": _bind(chunking.chunk_documents, "documents"),
    "chunk_dedup_exact": _bind(chunking.chunk_dedup_decisions, "documents"),
    "token_heavy_hitters": _bind(corpus_stats.token_heavy_hitters,
                                 "documents"),
    "perplexity_unigram": _bind(corpus_stats.perplexity_unigram, "documents"),
    "stratified_sample_sources": _bind(corpus_stats.stratified_sample,
                                       "documents"),
}

# Portable corpus CTE shared by the dedup oracles (mirrors
# dedup.with_synthetic_dups exactly).
_CORPUS = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, 'zzz ' || text AS text
      FROM documents WHERE doc_id % 3 = 0
    )
"""

_SHINGLE = """
      SELECT doc_id, list_distinct([
               array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)
             ]) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM corpus) t
"""

def _simhash_sql(bounded: bool, max_hamming: int = 3) -> str:
    """DuckDB oracle for the SimHash pair ops.

    Reproduces the Spark signature bit-for-bit: the token hash is the first
    16 hex chars of md5 as a big-endian 64-bit value, and bit j of that
    value lives in nibble 16 - j//4 (1-indexed hex char), bit j%4 — decoded
    with strpos on the hex alphabet, so no engine-specific hash is needed.
    The banded operator has pigeonhole-exact recall (hamming < n_bands ⇒
    ≥1 whole band agrees), so the full-corpus brute-force pair set IS its
    expected output."""
    def bit(j: int) -> str:
        nib = f"(strpos('0123456789abcdef', substr(d, {16 - j // 4}, 1)) - 1)"
        return f"(({nib} >> {j % 4}) & 1)"

    votes = ",\n                 ".join(
        f"sum(CASE WHEN {bit(j)} = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64)
    )
    terms = " + ".join(
        "(CASE WHEN v{j} > 0 THEN CAST({lit} AS BIGINT) ELSE 0 END)".format(
            j=j, lit=(1 << j) if j < 63 else "(-9223372036854775807 - 1)")
        for j in range(64)
    )
    subset = "WHERE doc_id % 100000 < 200" if bounded else ""
    return _CORPUS + f"""
        , tok AS (
          SELECT doc_id,
                 unnest(list_distinct(string_split(lower(text), ' '))) AS tok
          FROM corpus {subset}
        )
        , hashed AS (SELECT doc_id, md5(tok) AS d FROM tok)
        , votes AS (SELECT doc_id,
                 {votes}
          FROM hashed GROUP BY doc_id)
        , sig AS (SELECT doc_id, {terms} AS simhash FROM votes)
        SELECT doc_a, doc_b, hamming FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        ) p WHERE hamming <= {max_hamming}
    """


def _vec_corpus_sql(dim: int = 64, eps: float = 0.05) -> str:
    """`emb` CTE mirroring similarity.with_synthetic_vec_dups exactly:
    originals ∪ (vec_id+100000, v + eps·delta) with the identical
    md5-seeded delta embedded as double literals."""
    delta = similarity.hash_planes(1, 1, dim)[0][0]
    dlit = "[" + ", ".join(repr(eps * x) for x in delta) + "]"
    return f"""emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          UNION ALL
          SELECT vec_id + 100000 AS vec_id,
                 [v[i] + d[i] for i in range(1, {dim} + 1)] AS v
          FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {dlit} AS d
                FROM embeddings WHERE vec_id % 5 = 0) p
        )"""


def _embedding_lsh_sql(threshold: float = 0.99, tables: int = 4,
                       bits: int = 10, dim: int = 64) -> str:
    """DuckDB oracle for `embedding_dups_lsh`: the identical md5-seeded
    hyperplanes are embedded as double literals (shortest-repr round-trip →
    bit-identical doubles), so bucketing and verification reproduce the
    Spark result exactly."""
    planes = similarity.hash_planes(tables, bits, dim)
    emb = _vec_corpus_sql(dim=dim)

    def bucket_expr(t: int) -> str:
        cases = ", ".join(
            "CASE WHEN list_dot_product(v, ["
            + ", ".join(repr(x) for x in planes[t][j])
            + "]) >= 0 THEN '1' ELSE '0' END"
            for j in range(bits)
        )
        return f"concat({cases})"

    bands = "\n          UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, {bucket_expr(t)} AS bkt FROM emb"
        for t in range(tables)
    )
    return f"""
        WITH {emb},
        bands AS (
          {bands}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))) AS cosine
          FROM bands a JOIN bands b
            ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, round(cosine, 6) AS cosine
        FROM cand WHERE cosine >= {threshold}
    """


ORACLE = {
    "dedup_exact": _CORPUS + """
        SELECT count(*) AS n_unique,
               CAST(sum(n_copies) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
        FROM (
          SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
          FROM corpus GROUP BY md5(text)
        ) g
    """,
    "dedup_minhash_lsh": _CORPUS + f"""
        , subset AS (SELECT * FROM corpus WHERE doc_id % 100000 < 200)
        , shingled AS (
          SELECT doc_id, unnest(list_distinct([
                   array_to_string(l[i:i+2], ' ')
                   for i in range(1, greatest(len(l) - 2, 1) + 1)
                 ])) AS shingle
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM subset) t
        )
        , sig AS (
          SELECT doc_id,
                 {", ".join(f"min(substr(md5(shingle), {h * 5 + 1}, 5)) AS mh{h}" for h in range(6))}
          FROM shingled GROUP BY doc_id
        )
        , bands AS (
          SELECT doc_id, 0 AS band, mh0 || mh1 AS bucket FROM sig
          UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM sig
          UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM sig
        )
        , cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        )
        , toks AS (
          SELECT doc_id, list_distinct([
                   array_to_string(l[i:i+2], ' ')
                   for i in range(1, greatest(len(l) - 2, 1) + 1)
                 ]) AS sh
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM corpus) t
        )
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
          SELECT doc_a, doc_b,
                 CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(ta.sh, tb.sh))) AS jaccard
          FROM cand
          JOIN toks ta ON cand.doc_a = ta.doc_id
          JOIN toks tb ON cand.doc_b = tb.doc_id
        ) v WHERE jaccard >= 0.5
    """,
    "dedup_exact_decisions": _CORPUS + """
        SELECT md5(text) AS digest, min(doc_id) AS keep_id,
               CAST(count(*) - 1 AS BIGINT) AS n_dropped
        FROM corpus GROUP BY md5(text)
    """,
    "text_clean_corpus": """
        SELECT doc_id, n_toks AS n_tokens,
               CAST(round(q, 2) AS DOUBLE) AS quality, pred_lang
        FROM (
          SELECT doc_id, len(toks) AS n_toks,
            (CASE WHEN len(toks) >= 20 THEN 0.4 ELSE 0.0 END
             + CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
                         BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END
             + CASE WHEN CAST(len(list_filter(toks, t -> t IN
                   ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
                   / len(toks) >= 0.05 THEN 0.3 ELSE 0.0 END) AS q,
            CASE WHEN en >= de AND en >= fr THEN 'en'
                 WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred_lang
          FROM (
            SELECT doc_id, text, toks,
              len(list_filter(toks, t -> t IN
                ('the','a','of','and','to','in','is','it','for','on'))) AS en,
              len(list_filter(toks, t -> t IN
                ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
              len(list_filter(toks, t -> t IN
                ('le','la','les','et','est','un','une','pas'))) AS fr
            FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks
                  FROM documents) t
          ) v
        ) s
        WHERE round(q, 2) >= 0.7 AND pred_lang = 'en'
    """,
    # corpus_prepare_pipeline: the composed clean → exact-dedup pass over
    # the planted-duplicate corpus; same quality/lang expressions as
    # text_clean_corpus, same digest grouping as dedup_exact_decisions
    "corpus_prepare_pipeline": _CORPUS + """
        SELECT md5(text) AS digest, min(doc_id) AS keep_id,
               CAST(count(*) - 1 AS BIGINT) AS n_exact_dropped,
               min(n_toks) AS n_tokens,
               CAST(min(round(q, 2)) AS DOUBLE) AS quality
        FROM (
          SELECT doc_id, text, len(toks) AS n_toks,
            (CASE WHEN len(toks) >= 20 THEN 0.4 ELSE 0.0 END
             + CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
                         BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END
             + CASE WHEN CAST(len(list_filter(toks, t -> t IN
                   ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
                   / len(toks) >= 0.05 THEN 0.3 ELSE 0.0 END) AS q,
            CASE WHEN en >= de AND en >= fr THEN 'en'
                 WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred_lang
          FROM (
            SELECT doc_id, text, toks,
              len(list_filter(toks, t -> t IN
                ('the','a','of','and','to','in','is','it','for','on'))) AS en,
              len(list_filter(toks, t -> t IN
                ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
              len(list_filter(toks, t -> t IN
                ('le','la','les','et','est','un','une','pas'))) AS fr
            FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks
                  FROM corpus) t
          ) v
        ) s
        WHERE round(q, 2) >= 0.7 AND pred_lang = 'en'
        GROUP BY md5(text)
    """,
    "dedup_simhash": _simhash_sql(bounded=True),
    "dedup_simhash_banded": _simhash_sql(bounded=False),
    "dedup_minhash_lsh_full": _CORPUS + f"""
        , shingled AS (
          SELECT doc_id, unnest(list_distinct([
                   array_to_string(l[i:i+2], ' ')
                   for i in range(1, greatest(len(l) - 2, 1) + 1)
                 ])) AS shingle
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM corpus) t
        )
        , sig AS (
          SELECT doc_id,
                 {", ".join(f"min(substr(md5(shingle), {h * 5 + 1}, 5)) AS mh{h}" for h in range(6))}
          FROM shingled GROUP BY doc_id
        )
        , bands AS (
          SELECT doc_id, 0 AS band, mh0 || mh1 AS bucket FROM sig
          UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM sig
          UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM sig
        )
        , cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        )
        , toks AS (
          SELECT doc_id, list_distinct([
                   array_to_string(l[i:i+2], ' ')
                   for i in range(1, greatest(len(l) - 2, 1) + 1)
                 ]) AS sh
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM corpus) t
        )
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
          SELECT doc_a, doc_b,
                 CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(ta.sh, tb.sh))) AS jaccard
          FROM cand
          JOIN toks ta ON cand.doc_a = ta.doc_id
          JOIN toks tb ON cand.doc_b = tb.doc_id
        ) v WHERE jaccard >= 0.5
    """,
    "dedup_ngram_jaccard": _CORPUS + """
        , subset AS (SELECT * FROM corpus WHERE doc_id % 100000 < 100)
        , toks AS (
          SELECT doc_id, list_distinct([
                   array_to_string(l[i:i+2], ' ')
                   for i in range(1, greatest(len(l) - 2, 1) + 1)
                 ]) AS sh
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM subset) t
        )
        SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        ) v WHERE jaccard >= 0.8
    """,
    "dedup_embedding_cosine": f"""
        WITH {_vec_corpus_sql()}
        SELECT id_a, id_b, round(cosine, 6) AS cosine FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))) AS cosine
          FROM emb a JOIN emb b ON a.vec_id < b.vec_id
          WHERE a.vec_id % 100000 < 200 AND b.vec_id % 100000 < 200
        ) t WHERE cosine >= 0.99
    """,
    "dedup_embedding_lsh_full": _embedding_lsh_sql(),
    # replays lsh_topk exactly: planes = last 4 corpus vectors, bucket =
    # 4 sign bits of plane dot products (plane order = vec_id asc), exact
    # cosine rerank within bucket, k=1
    # planes: the same md5-seeded literals similarity.hash_planes(1,4,64)
    # emits (data-independent — identical in any engine embedding them)
    "similarity_lsh_topk": f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        planes AS ({_lsh_planes_sql()}),
        bkt AS (
          SELECT e.vec_id,
                 string_agg(
                   CASE WHEN list_dot_product(e.v, p.pv) >= 0
                        THEN '1' ELSE '0' END,
                   '' ORDER BY p.pid) AS bkt
          FROM emb e CROSS JOIN planes p GROUP BY e.vec_id
        ),
        corpus AS (
          SELECT e.vec_id, e.v, k.bkt FROM emb e
          JOIN bkt k USING (vec_id) WHERE e.vec_id >= 10
        ),
        queries AS (
          SELECT e.vec_id AS query_id, e.v AS qv, k.bkt FROM emb e
          JOIN bkt k USING (vec_id) WHERE e.vec_id < 10
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_dot_product(q.qv, c.v)
                            / (sqrt(list_dot_product(q.qv, q.qv))
                               * sqrt(list_dot_product(c.v, c.v))) DESC,
                            c.vec_id
                 ) AS rank
          FROM corpus c JOIN queries q ON c.bkt = q.bkt
        ) t WHERE rank <= 1
    """,
    "similarity_ivf_topk": """
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
        corpus AS (SELECT * FROM emb WHERE vec_id >= 10),
        cents AS (SELECT vec_id AS cell, v AS cv FROM corpus WHERE vec_id % 37 = 0),
        assigned AS (
          SELECT vec_id, cell, v FROM (
            SELECT c.vec_id, c.v, ct.cell,
                   list_dot_product(c.v, ct.cv)
                   / (sqrt(list_dot_product(c.v, c.v))
                      * sqrt(list_dot_product(ct.cv, ct.cv))) AS s
            FROM corpus c CROSS JOIN cents ct
          ) t
          QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY s DESC, cell DESC) = 1
        ),
        probes AS (
          SELECT query_id, qv, cell FROM (
            SELECT q.query_id, q.qv, ct.cell,
                   list_dot_product(q.qv, ct.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(ct.cv, ct.cv))) AS s
            FROM q CROSS JOIN cents ct
          ) t
          QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY s DESC, cell) <= 4
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY list_dot_product(p.qv, a.v)
                            / (sqrt(list_dot_product(p.qv, p.qv))
                               * sqrt(list_dot_product(a.v, a.v))) DESC,
                            a.vec_id
                 ) AS rank
          FROM assigned a JOIN probes p ON a.cell = p.cell
        ) t WHERE rank <= 3
    """,
    "similarity_bruteforce_topk": """
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[]))
                            / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(q.embedding AS DOUBLE[])))
                               * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                                       CAST(c.embedding AS DOUBLE[]))))
                            DESC, c.vec_id
                 ) AS rank
          FROM embeddings q JOIN embeddings c ON c.vec_id >= 10
          WHERE q.vec_id < 10
        ) t WHERE rank <= 3
    """,
    "text_token_counts": r"""
        SELECT doc_id,
          len(string_split(lower(text), ' ')) AS n_ws_tokens,
          len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS n_re_tokens,
          length(text) AS n_chars_measured,
          length(text) - length(replace(text, ' ', '')) AS n_spaces
        FROM documents
    """,
    "text_quality_scores": """
        SELECT doc_id,
          n_toks AS n_tokens,
          round(avg_tok_len, 6) AS avg_tok_len,
          round(stop_ratio, 6) AS stop_ratio,
          round(punct_ratio, 6) AS punct_ratio,
          CAST(round(CASE WHEN n_toks >= 20 THEN 0.4 ELSE 0.0 END
              + CASE WHEN avg_tok_len >= 3 AND avg_tok_len <= 10 THEN 0.3 ELSE 0.0 END
              + CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END, 2)
            AS DOUBLE) AS quality
        FROM (
          SELECT doc_id,
            len(toks) AS n_toks,
            CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS avg_tok_len,
            CAST(len(list_filter(toks, t -> t IN
              ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
              / len(toks) AS stop_ratio,
            CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
              / length(text) AS punct_ratio
          FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks
                FROM documents) t
        ) s
    """,
    "text_language_id": """
        SELECT doc_id, en_votes, de_votes, fr_votes,
          CASE WHEN en_votes >= de_votes AND en_votes >= fr_votes THEN 'en'
               WHEN de_votes >= fr_votes THEN 'de' ELSE 'fr' END AS pred_lang,
          (CASE WHEN en_votes >= de_votes AND en_votes >= fr_votes THEN 'en'
                WHEN de_votes >= fr_votes THEN 'de' ELSE 'fr' END) = lang AS match
        FROM (
          SELECT doc_id, lang,
            len(list_filter(toks, t -> t IN
              ('the','a','of','and','to','in','is','it','for','on'))) AS en_votes,
            len(list_filter(toks, t -> t IN
              ('der','die','das','und','ist','nicht','ein','zu'))) AS de_votes,
            len(list_filter(toks, t -> t IN
              ('le','la','les','et','est','un','une','pas'))) AS fr_votes
          FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
                FROM documents) t
        ) s
    """,
    "text_fingerprints": """
        SELECT doc_id,
          md5(canon) AS fingerprint,
          substr(md5(canon), 1, 16) AS short_key,
          n_distinct_tokens
        FROM (
          SELECT doc_id,
            array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ') AS canon,
            len(list_distinct(string_split(lower(text), ' '))) AS n_distinct_tokens
          FROM documents
        ) t
    """,
    "multimodal_featurize": """
        SELECT doc_id,
          CAST(length(text) AS INT) AS n_bytes,
          CAST(CASE WHEN length(text) > 0 THEN unicode(substr(text, 1, 1))
                    ELSE -1 END AS INT) AS first_byte,
          CAST(list_reduce(
                 list_prepend(0, [unicode(c) for c in string_split(substr(text, 1, 16), '')]),
                 (a, b) -> a + b) % 256 AS INT) AS head_sum,
          'text/plain' AS modality
        FROM documents
    """,
    # payloads are the UTF-8 text bytes and the testdata text is ASCII, so
    # char positions == byte positions and unicode(char) == byte value
    "multimodal_resize": """
        SELECT doc_id,
          CAST(n AS INT) AS orig_len,
          CAST(least(n, 32) AS INT) AS out_len,
          CAST(list_reduce(
                 list_prepend(0, [unicode(substr(text, (i * n) // 32 + 1, 1))
                                  for i in range(0, least(n, 32))]),
                 (a, b) -> a + b) % 2147483648 AS INT) AS out_sum
        FROM (SELECT doc_id, text, length(text) AS n FROM documents) t
    """,
    "multimodal_frame_sample": """
        SELECT doc_id,
          CAST(fi AS INT) AS frame_idx,
          CAST(length(fr) AS INT) AS frame_len,
          CAST(list_reduce(
                 list_prepend(0, [unicode(c) for c in string_split(fr, '')]),
                 (a, b) -> a + b) % 2147483648 AS INT) AS frame_sum
        FROM (
          SELECT doc_id, fi, substr(text, fi * 64 + 1, 64) AS fr
          FROM (SELECT doc_id, text,
                       unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT), 4)) AS fi
                FROM documents) t
        ) f
    """,
    # streaming concat-and-chunk packing (datapipe/packing.py): running
    # token count per 2-hex-char content bucket, cut every 512 tokens
    "pack_sequences": """
        SELECT doc_id, bucket, n_tokens,
               CAST(floor(start / 512) AS BIGINT) AS seq_id,
               CAST(start % 512 AS BIGINT) AS tok_offset
        FROM (
          SELECT doc_id, bucket, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
                   - n_tokens AS start
          FROM (
            SELECT doc_id, substr(md5(text), 1, 2) AS bucket,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                     AS n_tokens
            FROM documents) b
        ) s
    """,
    "train_test_split_hash": """
        SELECT doc_id, substr(md5(text), 1, 2) AS hash_prefix,
               CASE WHEN substr(md5(text), 1, 2) < '0d'
                    THEN 'test' ELSE 'train' END AS split
        FROM documents
    """,
    "text_pii_redact": f"""
        WITH corpus AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 5 = 0
                    THEN ' contact bob@example.com' ELSE '' END
            || CASE WHEN doc_id % 7 = 0
                    THEN ' call 415-555-0199' ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                    THEN ' seen from 10.17.3.201' ELSE '' END AS text
          FROM documents)
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '{packing.EMAIL_RE}', '<EMAIL>', 'g'),
            '{packing.PHONE_RE}', '<PHONE>', 'g'),
            '{packing.IP_RE}', '<IP>', 'g') AS text,
          CAST(len(regexp_extract_all(text, '{packing.EMAIL_RE}'))
             + len(regexp_extract_all(text, '{packing.PHONE_RE}'))
             + len(regexp_extract_all(text, '{packing.IP_RE}'))
             AS BIGINT) AS n_redactions,
          CAST(len(regexp_extract_all(text, '{packing.EMAIL_RE}'))
             AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text, '{packing.PHONE_RE}'))
             AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(text, '{packing.IP_RE}'))
             AS BIGINT) AS n_ips
        FROM corpus
    """,
    # 4-gram shingle overlap vs the doc_id % 13 == 0 "benchmark" slice
    # (datapipe/curation.py decontaminate) — shingles as 16-hex md5 slices
    "decontaminate_benchmark": """
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct([
                   substr(md5(array_to_string(l[i:i+3], ' ')), 1, 16)
                   for i in range(1, greatest(len(l) - 3, 1) + 1)
                 ])) AS shingle
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
                FROM documents) t
        ),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 13 = 0)
        SELECT s.doc_id AS doc_id,
               count(DISTINCT s.shingle) AS n_hits
        FROM sh s JOIN bench b USING (shingle)
        WHERE s.doc_id % 13 <> 0
        GROUP BY s.doc_id
    """,
    # Gopher-style repetition stats (curation.repetition_filters): dup
    # token fraction + most-frequent-2-gram share, smallest gram on ties
    "text_repetition_filters": """
        WITH base AS (
          SELECT doc_id, l, len(l) AS n_tokens,
                 len(list_distinct(l)) AS n_distinct
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
                FROM documents) t
        ),
        counted AS (
          SELECT doc_id, n_tokens, n_distinct, gram, count(*) AS cnt
          FROM (
            SELECT doc_id, n_tokens, n_distinct,
                   unnest([concat_ws(' ', l[i], l[i+1])
                           for i in range(1, greatest(len(l) - 1, 1) + 1)])
                     AS gram
            FROM base) g
          GROUP BY 1, 2, 3, 4
        )
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               round(1.0 - n_distinct / n_tokens, 6) AS dup_token_frac,
               gram AS top_gram, cnt AS top_gram_count,
               round(cnt / CAST(greatest(n_tokens - 1, 1) AS DOUBLE), 6)
                 AS top_gram_frac
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
              FROM counted) r
        WHERE rn = 1
    """,
    # per-doc top-3 TF-IDF terms (curation.tfidf_topk), ln-idf, ties by
    # term; ordering uses the ROUNDED score in both engines
    "tfidf_topk_terms": """
        WITH tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                FROM documents) t
          GROUP BY 1, 2
        ),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
               FROM documents),
        scored AS (
          SELECT doc_id, term, tf, df,
                 round(tf * ln((SELECT n FROM nd) / df), 6) AS tfidf
          FROM tf JOIN df USING (term)
        )
        SELECT doc_id, term, tf, df, tfidf, CAST(rank AS INT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, term ASC) AS rank
              FROM scored) w
        WHERE rank <= 3
    """,
    # deterministic per-language mixture sampling
    # (curation.domain_mix_sample): md5-prefix hex-string threshold per
    # MIX_RATES — same comparison idiom as train_test_split_hash
    "domain_mix_sample": """
        SELECT doc_id, lang, source, hash_prefix, keep_threshold
        FROM (
          SELECT doc_id, lang, source,
                 substr(md5(concat_ws(':', doc_id, text)), 1, 8)
                   AS hash_prefix,
                 CASE lang WHEN 'de' THEN '80000000'
                           WHEN 'en' THEN 'ffffffff'
                           WHEN 'es' THEN '40000000'
                           WHEN 'fr' THEN '80000000'
                           WHEN 'zh' THEN '40000000'
                           ELSE 'ffffffff' END AS keep_threshold
          FROM documents) s
        WHERE hash_prefix < keep_threshold
    """,
    # per-vector int8 scalar quantization (curation.quantize_embeddings):
    # same double-precision expression order as the Spark side, codes
    # checksummed as an md5 of the comma-joined ints
    "quantize_embeddings_int8": """
        WITH p AS (
          SELECT vec_id, v,
                 list_aggregate(v, 'min') AS lo,
                 list_aggregate(v, 'max') AS hi,
                 nullif(list_aggregate(v, 'max')
                      - list_aggregate(v, 'min'), 0.0)
                   / 255.0 AS scale
          FROM (SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings) e
        ),
        q AS (
          SELECT vec_id, v, lo, hi, scale,
                 [coalesce(CAST(floor((x - lo) / scale + 0.5) AS INT), 0)
                  for x in v] AS qc
          FROM p
        )
        SELECT vec_id,
               round(lo, 6) AS q_min,
               round(hi, 6) AS q_max,
               md5(array_to_string(qc, ',')) AS q_checksum,
               round(list_aggregate(
                 [coalesce(abs(v[i] - (lo + qc[i] * scale)), 0.0)
                  for i in range(1, len(v) + 1)], 'max'), 6) AS max_abs_err
        FROM q
    """,
}

# Duplicate-cluster connected components: transitive closure of the SAME
# pair relation the dedup_minhash_lsh oracle computes (nested verbatim as
# the `pairs` CTE), min-reachable-id label per node via a recursive CTE —
# an exact, engine-independent oracle for the iterative Spark propagation.
ORACLE["dedup_connected_components"] = (
    "WITH RECURSIVE pairs AS (\n"
    + ORACLE["dedup_minhash_lsh"]
    + """
    ),
    edges AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
    ),
    reach(doc_id, lab) AS (
      SELECT DISTINCT doc_a, doc_a FROM edges
      UNION
      SELECT e.doc_a, r.lab FROM edges e JOIN reach r ON r.doc_id = e.doc_b
    ),
    labels AS (
      SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc_id
    )
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM labels
    """)

QUERIES["curriculum_shards"] = _bind(
    corpus_stats.curriculum_shards, "documents")
# curriculum sharding (corpus_stats.curriculum_shards): exact quantiles
# of the rounded bits-per-token score via a bounded value histogram —
# the perplexity CTEs reused verbatim
ORACLE["curriculum_shards"] = """
    WITH terms AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM terms GROUP BY doc_id, token
    ),
    lm AS (SELECT token, sum(tf) AS cnt FROM tf GROUP BY token),
    tot AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS total,
             CAST(count(*) AS DOUBLE) AS vocab
      FROM lm
    ),
    scored AS (
      SELECT doc_id,
             round(round(sum(tf * -log2((cnt + 1.0) / (total + vocab)))
                         / sum(tf), 6), 2) AS score
      FROM tf JOIN lm USING (token), tot
      GROUP BY doc_id
    ),
    hist AS (SELECT score, count(*) AS cnt FROM scored GROUP BY score),
    n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS nn FROM hist),
    bounds AS (
      SELECT score,
             CAST(least(floor((cum - cnt) * 4 / nn), 3) AS INT) AS shard
      FROM (SELECT score, cnt,
                   sum(cnt) OVER (ORDER BY score
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM hist) h, n
    )
    SELECT doc_id, score, shard FROM scored JOIN bounds USING (score)
"""

QUERIES["bpe_top_pairs"] = _bind(corpus_stats.bpe_top_pairs, "documents")
# first BPE merge statistic (corpus_stats.bpe_top_pairs): adjacent char
# pairs counted over the weighted vocabulary, top-20
ORACLE["bpe_top_pairs"] = """
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w, count(*) AS n FROM words WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, n
      FROM (SELECT w, n, unnest(range(1, length(w))) AS i FROM vocab) t
    ),
    agg AS (
      SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences
      FROM pairs GROUP BY pair
    )
    SELECT pair, n_occurrences,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair)
                AS INT) AS rank
    FROM agg ORDER BY n_occurrences DESC, pair LIMIT 20
"""

QUERIES["decontaminate_fuzzy"] = _bind(
    curation.decontaminate_fuzzy, "documents")
# MinHash-LSH cross-corpus decontamination (curation.decontaminate_fuzzy):
# the dedup_minhash_lsh signature/band machinery with the candidate join
# restricted to train x benchmark, aggregated per training doc
ORACLE["decontaminate_fuzzy"] = _CORPUS + f"""
    , subset AS (SELECT * FROM corpus WHERE doc_id % 100000 < 200)
    , shingled AS (
      SELECT doc_id, unnest(list_distinct([
               array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM subset) t
    )
    , sig AS (
      SELECT doc_id,
             {", ".join(f"min(substr(md5(shingle), {h * 5 + 1}, 5)) AS mh{h}" for h in range(6))}
      FROM shingled GROUP BY doc_id
    )
    , bands AS (
      SELECT doc_id, 0 AS band, mh0 || mh1 AS bucket FROM sig
      UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM sig
      UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM sig
    )
    , cand AS (
      SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS bench_id
      FROM bands t JOIN bands e
        ON t.band = e.band AND t.bucket = e.bucket
      WHERE NOT (t.doc_id < 100000 AND t.doc_id % 13 = 0)
        AND (e.doc_id < 100000 AND e.doc_id % 13 = 0)
    )
    , toks AS (
      SELECT doc_id, list_distinct([
               array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)
             ]) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM corpus) t
    )
    , verified AS (
      SELECT * FROM (
        SELECT train_id, bench_id,
               round(CAST(len(list_intersect(tt.sh, te.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(tt.sh, te.sh))), 6)
                 AS jaccard
        FROM cand
        JOIN toks tt ON cand.train_id = tt.doc_id
        JOIN toks te ON cand.bench_id = te.doc_id
      ) v WHERE jaccard >= 0.5
    )
    SELECT train_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_bench_hits,
           max(jaccard) AS max_jaccard
    FROM verified GROUP BY train_id
"""

def _pagerank_sql(iters: int = 2, damping: float = 0.85) -> str:
    """Chained-CTE DuckDB oracle for `dedup.pagerank_dup_graph`: the
    symmetrized MinHash pair graph, degrees, then `iters` unrolled rank
    updates — same expression order as the Spark plan."""
    cte = (
        "WITH pairs AS (\n" + ORACLE["dedup_minhash_lsh"] + """
    ),
    edges AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
    ),
    deg AS (SELECT doc_a, count(*) AS deg FROM edges GROUP BY doc_a),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT doc_a AS doc_id, deg, 1.0 / n AS rank FROM deg, nn)
""")
    prev = "r0"
    for i in range(1, iters + 1):
        cte += f"""
    , c{i} AS (
      SELECT e.doc_b AS dst, sum(r.rank / r.deg) AS s
      FROM edges e JOIN {prev} r ON e.doc_a = r.doc_id GROUP BY e.doc_b
    )
    , r{i} AS (
      SELECT d.doc_a AS doc_id, d.deg,
             {1.0 - damping} / n + {damping} * coalesce(c{i}.s, 0.0)
               AS rank
      FROM deg d LEFT JOIN c{i} ON d.doc_a = c{i}.dst, nn
    )"""
        prev = f"r{i}"
    return cte + f"\n    SELECT doc_id, round(rank, 9) AS rank FROM {prev}"


QUERIES["dedup_jaccard_prefix_filter"] = _bind(
    dedup.jaccard_prefix_filter_pairs, "documents")
# the prefix filter is LOSSLESS (zero false negatives), so the oracle is
# simply the brute-force all-pairs Jaccard over the same bounded subset
ORACLE["dedup_jaccard_prefix_filter"] = _CORPUS + """
    , subset AS (SELECT * FROM corpus WHERE doc_id % 100000 < 200)
    , t AS (
      SELECT doc_id,
             list_distinct(string_split(lower(text), ' ')) AS ts
      FROM subset
    )
    SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
               / len(list_distinct(list_concat(a.ts, b.ts))) AS j
      FROM t a JOIN t b ON a.doc_id < b.doc_id
    ) v WHERE j >= 0.7
"""

QUERIES["dedup_graph_pagerank"] = _bind(dedup.pagerank_dup_graph,
                                        "documents")
ORACLE["dedup_graph_pagerank"] = _pagerank_sql()

QUERIES["dedup_cluster_representatives"] = _bind(
    dedup.cluster_representatives, "documents")
# quality-aware keep-one-per-cluster (dedup.cluster_representatives):
# the CC labels (same recursive closure as above) joined to corpus token
# counts; representative = most tokens, ties to smallest doc_id
ORACLE["dedup_cluster_representatives"] = (
    "WITH RECURSIVE pairs AS (\n"
    + ORACLE["dedup_minhash_lsh"]
    + """
    ),
    edges AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
    ),
    reach(doc_id, lab) AS (
      SELECT DISTINCT doc_a, doc_a FROM edges
      UNION
      SELECT e.doc_a, r.lab FROM edges e JOIN reach r ON r.doc_id = e.doc_b
    ),
    labels AS (
      SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc_id
    ),
    corpus2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, 'zzz ' || text AS text
      FROM documents WHERE doc_id % 3 = 0
    ),
    scored AS (
      SELECT l.cluster_id, l.doc_id,
             CAST(len(string_split(lower(c.text), ' ')) AS INT)
               AS n_tokens
      FROM labels l JOIN corpus2 c USING (doc_id)
    )
    SELECT cluster_id, cluster_size,
           doc_id AS rep_doc_id, n_tokens AS rep_n_tokens
    FROM (
      SELECT cluster_id, doc_id, n_tokens,
             CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_tokens DESC, doc_id) AS rn
      FROM scored) t
    WHERE rn = 1
    """)

ORACLE["dedup_incremental"] = _CORPUS + """
    SELECT n.doc_id, md5(n.text) AS digest
    FROM corpus n
    WHERE n.doc_id >= 100000
      AND NOT EXISTS (
        SELECT 1 FROM corpus e
        WHERE e.doc_id < 100000 AND md5(e.text) = md5(n.text))
"""

# Chunking family: starts = 0, stride, 2*stride … while start < n_tokens
# (chunk_idx = start // stride because the start list IS the stride grid).
_CHUNK_STARTS = """
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 1, 0) + 1, {stride}))
               AS start_tok
      FROM t
    )
"""

ORACLE["chunk_documents"] = _CHUNK_STARTS.format(stride=48) + """
    SELECT doc_id,
           CAST(start_tok // 48 AS INT) AS chunk_idx,
           CAST(start_tok AS INT) AS start_tok,
           CAST(least(64, len(toks) - start_tok) AS INT) AS n_chunk_tokens,
           array_to_string(toks[start_tok + 1 : start_tok + 64], ' ')
             AS chunk_text
    FROM s
"""

ORACLE["chunk_dedup_exact"] = _CHUNK_STARTS.format(stride=32) + """
    , ch AS (
      SELECT doc_id,
             CAST(start_tok // 32 AS INT) AS chunk_idx,
             md5(array_to_string(toks[start_tok + 1 : start_tok + 32], ' '))
               AS digest
      FROM s
    ),
    ranked AS (
      SELECT digest, doc_id, chunk_idx,
             row_number() OVER (PARTITION BY digest
                                ORDER BY doc_id, chunk_idx) AS rn,
             count(*) OVER (PARTITION BY digest) AS n_copies
      FROM ch
    )
    SELECT digest, doc_id AS keep_doc, chunk_idx AS keep_idx,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM ranked WHERE rn = 1 AND n_copies > 1
"""

ORACLE["token_heavy_hitters"] = """
    WITH terms AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, count(*) AS n_occurrences FROM terms GROUP BY token
    ),
    tot AS (
      SELECT CAST(sum(n_occurrences) AS DOUBLE) AS total FROM counts
    ),
    topk AS (
      SELECT token, n_occurrences FROM counts
      ORDER BY n_occurrences DESC, token LIMIT 20
    )
    SELECT token, CAST(n_occurrences AS BIGINT) AS n_occurrences,
           round(n_occurrences / total, 6) AS share,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
                AS INT) AS rank
    FROM topk, tot
"""

ORACLE["perplexity_unigram"] = """
    WITH terms AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM terms GROUP BY doc_id, token
    ),
    lm AS (SELECT token, sum(tf) AS cnt FROM tf GROUP BY token),
    tot AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS total,
             CAST(count(*) AS DOUBLE) AS vocab
      FROM lm
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             round(sum(tf * -log2((cnt + 1.0) / (total + vocab)))
                   / sum(tf), 6) AS bits_per_token
      FROM tf JOIN lm USING (token), tot
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, bits_per_token,
           bits_per_token > 10.0 AS high_ppl
    FROM per_doc
"""

# u = first 60 bits of md5(source:doc_id) as a uniform double in [0,1) —
# both engines round the SAME 60-bit integer to nearest-double, so the
# hash-threshold pre-filter and the row_number order are bit-identical.
ORACLE["stratified_sample_sources"] = """
    WITH s AS (
      SELECT source, doc_id,
             CAST(('0x' || substr(md5(source || ':' || doc_id), 1, 15))
                  ::BIGINT AS DOUBLE) / 1152921504606846976.0 AS u
      FROM documents
    ),
    c AS (SELECT source, count(*) AS n_stratum FROM s GROUP BY source),
    surv AS (
      SELECT s.source, s.doc_id, s.u
      FROM s JOIN c USING (source)
      WHERE s.u * c.n_stratum < 40.0
    ),
    ranked AS (
      SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY u, doc_id) AS INT) AS pick
      FROM surv
    )
    SELECT source, doc_id, pick FROM ranked WHERE pick <= 10
"""


def _kmeans_cte(k: int = 8, iters: int = 2, dim: int = 64,
                emb_sql: str | None = None, src: str = "emb") -> str:
    """Chained-CTE Lloyd training prefix shared by the kmeans and
    trained-IVF oracles: one (assign, per-dim mean, rebuild) CTE triple
    per iteration — the same deterministic spec as
    `similarity._kmeans_centroids` (init = vec_id < k, squared-euclidean
    argmin with lower-cluster tie-break, element-wise mean update). Ends
    with CTE ``c{{iters}}`` = (cluster, n, cv). ``emb_sql`` overrides the
    corpus CTE body (semdedup trains over the synthetic-dup corpus);
    ``src`` names the relation the TRAINING reads (the add-batch oracle
    trains on a filtered view while the full ``emb`` still feeds
    encode/probe)."""
    d2 = (f"list_aggregate([ (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]) "
          f"for i in range(1, {dim} + 1) ], 'sum')")
    emb = emb_sql or """emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )"""
    parts = [f"""
    WITH {emb},
    c0 AS (
      SELECT CAST(vec_id AS INT) AS cluster, v AS cv
      FROM {src} WHERE vec_id < {k}
    )"""]
    for it in range(1, iters + 1):
        parts.append(f"""
    , a{it} AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, c.cluster) AS rn
        FROM {src} e CROSS JOIN c{it - 1} c
      ) r WHERE rn = 1
    )
    , p{it} AS (
      SELECT cluster, t.i AS i, sum(v[t.i]) / count(*) AS m
      FROM a{it} CROSS JOIN range(1, {dim} + 1) AS t(i)
      GROUP BY cluster, t.i
    )
    , c{it} AS (
      SELECT p.cluster, n.n AS n, list(p.m ORDER BY p.i) AS cv
      FROM p{it} p
      JOIN (SELECT cluster, count(*) AS n FROM a{it} GROUP BY cluster) n
        USING (cluster)
      GROUP BY p.cluster, n.n
    )""")
    return "".join(parts)


def _kmeans_sql(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """DuckDB oracle for `similarity.kmeans_clusters`."""
    return _kmeans_cte(k, iters, dim) + f"""
    SELECT cluster, CAST(n AS BIGINT) AS n_members,
           round(list_aggregate(cv, 'sum'), 6) AS centroid_checksum
    FROM c{iters}"""


def _ivf_kmeans_sql(k: int = 3, n_queries: int = 10, n_cells: int = 8,
                    iters: int = 2, dim: int = 64, nprobe: int = 2) -> str:
    """DuckDB oracle for `similarity.ivf_kmeans_topk`: the Lloyd training
    prefix feeds IVF assignment/probing by the SAME squared-euclidean
    metric, then an exact-cosine in-cell rerank."""
    def d2(l: str, r: str) -> str:
        return (f"list_aggregate([ ({l}.{'qv' if l == 'q' else 'v'}[i] - "
                f"{r}.cv[i]) * ({l}.{'qv' if l == 'q' else 'v'}[i] - "
                f"{r}.cv[i]) for i in range(1, {dim} + 1) ], 'sum')")

    return _kmeans_cte(n_cells, iters, dim) + f"""
    , q AS (
      SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {n_queries}
    )
    , corpus AS (SELECT * FROM emb WHERE vec_id >= {n_queries})
    , assigned AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2('e', 'c')}, c.cluster) AS rn
        FROM corpus e CROSS JOIN c{iters} c
      ) r WHERE rn = 1
    )
    , probes AS (
      SELECT query_id, qv, cluster FROM (
        SELECT q.query_id, q.qv, c.cluster,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {d2('q', 'c')}, c.cluster) AS rn
        FROM q CROSS JOIN c{iters} c
      ) r WHERE rn <= {nprobe}
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY list_dot_product(p.qv, a.v)
                        / (sqrt(list_dot_product(p.qv, p.qv))
                           * sqrt(list_dot_product(a.v, a.v))) DESC,
                        a.vec_id
             ) AS rank
      FROM assigned a JOIN probes p USING (cluster)
    ) t WHERE rank <= {k}"""


QUERIES["kmeans_embeddings"] = _bind(similarity.kmeans_clusters, "embeddings")
ORACLE["kmeans_embeddings"] = _kmeans_sql()

QUERIES["similarity_ivf_kmeans_topk"] = _bind(
    similarity.ivf_kmeans_topk, "embeddings")
ORACLE["similarity_ivf_kmeans_topk"] = _ivf_kmeans_sql()


def _semdedup_sql(n_clusters: int = 8, iters: int = 2, dim: int = 64,
                  threshold: float = 0.99) -> str:
    """DuckDB oracle for `similarity.semdedup`: Lloyd training over the
    synthetic-dup corpus, nearest-centroid assignment by the training
    metric, then within-cluster cosine pairs mark every vector that has
    a smaller-id near-duplicate in its cell."""
    d2 = (f"list_aggregate([ (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]) "
          f"for i in range(1, {dim} + 1) ], 'sum')")
    return _kmeans_cte(n_clusters, iters, dim,
                       emb_sql=_vec_corpus_sql(dim)) + f"""
    , assigned AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, c.cluster) AS rn
        FROM emb e CROSS JOIN c{iters} c
      ) r WHERE rn = 1
    )
    , dups AS (
      SELECT DISTINCT a.vec_id FROM assigned a
      JOIN assigned b
        ON a.cluster = b.cluster AND b.vec_id < a.vec_id
      WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= {threshold}
    )
    SELECT s.vec_id, s.cluster,
           (d.vec_id IS NOT NULL) AS is_dup
    FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id"""


QUERIES["dedup_semantic_kmeans"] = _bind(similarity.semdedup, "embeddings")
ORACLE["dedup_semantic_kmeans"] = _semdedup_sql()


def _knn_join_sql(k: int = 3, n_clusters: int = 8, iters: int = 2,
                  dim: int = 64) -> str:
    """DuckDB oracle for `similarity.knn_join`: Lloyd training,
    nearest-centroid assignment, cluster-bounded cosine top-k."""
    d2 = (f"list_aggregate([ (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]) "
          f"for i in range(1, {dim} + 1) ], 'sum')")
    return _kmeans_cte(n_clusters, iters, dim) + f"""
    , assigned AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, c.cluster) AS rn
        FROM emb e CROSS JOIN c{iters} c
      ) r WHERE rn = 1
    )
    SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cos, 6) AS cos_sim
    FROM (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS cos,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(b.v, b.v))) DESC,
                        b.vec_id) AS rank
      FROM assigned a JOIN assigned b
        ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
    ) t WHERE rank <= {k}"""


QUERIES["similarity_knn_join"] = _bind(similarity.knn_join, "embeddings")
ORACLE["similarity_knn_join"] = _knn_join_sql()


def _pca_sql(iters: int = 2, dim: int = 64) -> str:
    """DuckDB oracle for `similarity.pca_power_iteration`: the same
    unrolled w ← normalize(Σ x·(xᵀw)) chain with decimal accumulation
    for every cross-row sum (per-dimension and norm)."""
    ctes = [f"""
    WITH emb AS (
      SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings
    ),
    idx AS (SELECT unnest(range(1, {dim} + 1)) AS i),
    w0 AS (
      SELECT [CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END
              for i in range(1, {dim} + 1)] AS w
    )"""]
    for t in range(1, iters + 1):
        ctes.append(f"""
    , d{t} AS (
      SELECT x, list_dot_product(x, w) AS d FROM emb, w{t - 1}
    ),
    s{t} AS (
      SELECT i, CAST(sum(CAST(d * x[i] AS DECIMAL(38,12))) AS DOUBLE) AS s
      FROM d{t}, idx GROUP BY i
    ),
    n{t} AS (
      SELECT sqrt(CAST(sum(CAST(s * s AS DECIMAL(38,12))) AS DOUBLE))
               AS nrm
      FROM s{t}
    ),
    w{t} AS (
      SELECT list(s / nrm ORDER BY i) AS w FROM s{t}, n{t}
    )""")
    return "".join(ctes) + f"""
    SELECT CAST(i - 1 AS INT) AS dim_idx, round(w[i], 6) AS loading
    FROM w{iters}, idx
    """


QUERIES["similarity_pca_power"] = _bind(similarity.pca_power_iteration,
                                        "embeddings")
ORACLE["similarity_pca_power"] = _pca_sql()

QUERIES["chunk_remove_boilerplate"] = _bind(chunking.remove_boilerplate,
                                            "documents")
ORACLE["chunk_remove_boilerplate"] = _CHUNK_STARTS.format(stride=32) + """
    , ch AS (
      SELECT doc_id,
             CAST(start_tok // 32 AS INT) AS chunk_idx,
             array_to_string(toks[start_tok + 1 : start_tok + 32], ' ')
               AS chunk_text
      FROM s
    ),
    marked AS (
      SELECT doc_id, chunk_idx, chunk_text,
             (count(*) OVER (PARTITION BY chunk_text) = 1
              OR row_number() OVER (PARTITION BY chunk_text
                                    ORDER BY doc_id, chunk_idx) = 1)
               AS keep
      FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
           md5(coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
                        FILTER (WHERE keep), '')) AS clean_digest
    FROM marked GROUP BY doc_id
"""

QUERIES["corpus_summary"] = _bind(corpus_stats.corpus_summary, "documents")
ORACLE["corpus_summary"] = """
    WITH per_doc AS (
      SELECT lang, len(string_split(lower(text), ' ')) AS n_toks,
             md5(text) AS digest
      FROM documents
    ),
    g AS (
      SELECT lang, count(*) AS n_docs, sum(n_toks) AS n_tokens,
             round(avg(n_toks), 6) AS avg_doc_tokens,
             count(DISTINCT digest) AS n_distinct_texts
      FROM per_doc GROUP BY ROLLUP (lang)
    )
    SELECT coalesce(lang, '__all__') AS lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           avg_doc_tokens,
           CAST(n_distinct_texts AS BIGINT) AS n_distinct_texts,
           round(1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs, 6)
             AS dup_rate
    FROM g
"""

QUERIES["dsir_select_topk"] = _bind(curation.dsir_select, "documents")
# DSIR importance resampling (curation.dsir_select): hashed
# unigram+bigram buckets, add-one-smoothed target/raw distributions,
# per-doc log-likelihood-ratio weights, top-k. Bucket = first 8 md5 hex
# chars mod 256 — both engines hash the identical gram strings.
ORACLE["dsir_select_topk"] = """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(
        l || [concat_ws(' ', l[i], l[i+1])
              for i in range(1, greatest(len(l) - 1, 1) + 1)]
      ) AS gram FROM toks
    ),
    db AS (
      SELECT doc_id,
             ('0x' || substr(md5(gram), 1, 8))::BIGINT % 256 AS bucket,
             count(*) AS c
      FROM grams GROUP BY doc_id, bucket
    ),
    dist AS (
      SELECT bucket,
             coalesce(sum(CASE WHEN doc_id % 13 = 0 THEN c END), 0) AS tc,
             coalesce(sum(CASE WHEN doc_id % 13 <> 0 THEN c END), 0) AS rc
      FROM db GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(tc) AS DOUBLE) AS tt,
                   CAST(sum(rc) AS DOUBLE) AS rt FROM dist),
    llr AS (
      SELECT bucket, ln((tc + 1.0) / (tt + 256.0))
                   - ln((rc + 1.0) / (rt + 256.0)) AS llr
      FROM dist, tot
    ),
    wt AS (
      SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_feats,
             round(sum(d.c * l.llr), 6) AS log_weight
      FROM db d JOIN llr l USING (bucket)
      WHERE d.doc_id % 13 <> 0 GROUP BY d.doc_id
    )
    SELECT doc_id, n_feats, log_weight,
           CAST(row_number() OVER (ORDER BY log_weight DESC, doc_id)
                AS INT) AS rank
    FROM wt ORDER BY log_weight DESC, doc_id LIMIT 50
"""

QUERIES["dedup_exact_substrings"] = _bind(dedup.exact_substring_spans,
                                          "documents")
# Exact substring-level dedup (dedup.exact_substring_spans, Lee et al.
# 2022): stride-1 k-token window digests, windows whose digest repeats
# corpus-wide, merged per doc into maximal spans (union-continuous iff
# next start <= prev start + k). Same tokenization/slice convention as
# the chunk oracles (1-based inclusive list slicing).
ORACLE["dedup_exact_substrings"] = _CORPUS + """
    , subset AS (SELECT * FROM corpus WHERE doc_id % 100000 < 400)
    , t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM subset
      WHERE len(string_split(lower(text), ' ')) >= 16
    ),
    sh AS (
      SELECT doc_id, unnest(range(0, len(ts) - 16 + 1)) AS pos, ts FROM t
    ),
    dig AS (
      SELECT doc_id, pos,
             md5(array_to_string(ts[pos + 1 : pos + 16], ' ')) AS digest
      FROM sh
    ),
    dup AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos, count(*) OVER (PARTITION BY digest) AS n
        FROM dig) v WHERE n > 1
    ),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                    OR pos > lag(pos) OVER w + 16 THEN 1 ELSE 0 END
               AS new_span
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    spans AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS span_id
      FROM flagged
    )
    SELECT doc_id,
           CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + 16 AS INT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_dup_windows
    FROM spans GROUP BY doc_id, span_id
"""

QUERIES["tokenize_bpe_apply"] = _bind(corpus_stats.bpe_apply_tokenize,
                                      "documents")
# BPE-apply (corpus_stats.bpe_apply_tokenize): vocab = top-500 char
# n-grams (len 2-3) by word-frequency weight, greedy longest-match
# left-to-right segmentation per distinct word (recursive CTE = the
# engine's O(L) aggregate walk), summed back per document.
ORACLE["tokenize_bpe_apply"] = """
    WITH RECURSIVE words AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    wc AS (SELECT w, count(*) AS n FROM words GROUP BY w),
    g2 AS (
      SELECT n, unnest([substr(w, i, 2) for i in range(1, len(w))]) AS piece
      FROM wc WHERE len(w) >= 2
    ),
    g3 AS (
      SELECT n, unnest([substr(w, i, 3) for i in range(1, len(w) - 1)])
               AS piece
      FROM wc WHERE len(w) >= 3
    ),
    vocab AS (
      SELECT piece FROM (
        SELECT piece, sum(n) AS cnt
        FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3) g
        GROUP BY piece)
      ORDER BY cnt DESC, piece LIMIT 500
    ),
    pos AS (
      SELECT w, unnest(range(1, len(w) + 1)) AS p FROM wc WHERE len(w) >= 1
    ),
    cand AS (
      SELECT w, p, max(g) AS gmax FROM (
        SELECT w, p, 2 AS g, substr(w, p, 2) AS piece FROM pos
        WHERE p + 1 <= len(w)
        UNION ALL
        SELECT w, p, 3 AS g, substr(w, p, 3) AS piece FROM pos
        WHERE p + 2 <= len(w)
      ) c WHERE piece IN (SELECT piece FROM vocab)
      GROUP BY w, p
    ),
    walk AS (
      SELECT w, len(w) AS l, 1 AS pos, 0 AS cnt FROM wc WHERE len(w) >= 1
      UNION ALL
      SELECT walk.w, walk.l, walk.pos + coalesce(c.gmax, 1), walk.cnt + 1
      FROM walk LEFT JOIN cand c ON c.w = walk.w AND c.p = walk.pos
      WHERE walk.pos <= walk.l
    ),
    pieces AS (SELECT w, max(cnt) AS n_pieces FROM walk GROUP BY w)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ws_tokens,
           CAST(sum(coalesce(p.n_pieces, 0)) AS BIGINT) AS n_bpe_tokens,
           round(sum(coalesce(p.n_pieces, 0)) * 1.0 / count(*), 6)
             AS pieces_per_word
    FROM words LEFT JOIN pieces p USING (w)
    GROUP BY doc_id
"""

QUERIES["bpe_train_merges"] = _bind(corpus_stats.bpe_train_merges,
                                    "documents")


def _bpe_train_oracle_sql(n_merges: int = 6) -> str:
    """Chained-CTE DuckDB mirror of the unrolled BPE merge loop: per
    step, pair counts over the current vocab segmentation, 1-row argmax,
    and the same delimited-string greedy-merge fold (`list_reduce` folds
    from the first element exactly like the engine's `aggregate` over
    slice(2..) with element_at(1) init; chr(31) is the symbol delimiter
    the word filter guarantees never occurs in-symbol)."""
    levels = "".join(f""",
    p{k} AS (
      SELECT pr[1] AS lhs, pr[2] AS rhs,
             CAST(sum(n) AS BIGINT) AS n_occurrences
      FROM (SELECT n, unnest(list_zip(syms[1:len(syms)-1], syms[2:]))
                     AS pr FROM v{k - 1})
      GROUP BY 1, 2
    ),
    b{k} AS (SELECT * FROM p{k}
             ORDER BY n_occurrences DESC, lhs, rhs LIMIT 1),
    v{k} AS (
      SELECT w, string_split(list_reduce(syms,
               (acc, s) -> CASE WHEN string_split(acc, chr(31))[-1] = b.lhs
                                 AND s = b.rhs
                           THEN acc || s ELSE acc || chr(31) || s END),
             chr(31)) AS syms, n
      FROM v{k - 1}, b{k} b
    )""" for k in range(1, n_merges + 1))
    union = " UNION ALL ".join(
        f"SELECT {k} AS step, lhs, rhs, lhs || rhs AS merged, "
        f"n_occurrences FROM b{k}" for k in range(1, n_merges + 1))
    return f"""
    WITH twords AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    v0 AS (
      SELECT w, regexp_split_to_array(w, '') AS syms,
             CAST(count(*) AS BIGINT) AS n
      FROM twords WHERE length(w) >= 2 AND NOT contains(w, chr(31))
      GROUP BY w
    ){levels}
    {union}"""


# full BPE merge-loop training (corpus_stats.bpe_train_merges): the
# oracle unrolls the identical 6-step loop as chained CTEs
ORACLE["bpe_train_merges"] = _bpe_train_oracle_sql()


def _bpe_trained_apply(documents):
    merges = corpus_stats.bpe_train_merges(documents)
    return corpus_stats.bpe_apply_tokenize(
        documents, pieces=merges.select(F.col("merged").alias("piece")))


QUERIES["tokenize_bpe_trained"] = _bind(_bpe_trained_apply, "documents")
# the learned merge table feeding the greedy longest-match apply
# (WordPiece-style application of a BPE-learned vocab): train CTEs ->
# vocab = merged pieces -> dynamic match-length range -> same recursive
# walk as tokenize_bpe_apply
ORACLE["tokenize_bpe_trained"] = ("""
    WITH RECURSIVE""" + _bpe_train_oracle_sql().split("WITH", 1)[1]
    .rsplit("SELECT 1 AS step", 1)[0].rstrip().rstrip(",")
    + """,
    vocab AS (
      """ + " UNION ".join(
        f"SELECT lhs || rhs AS piece FROM b{k}" for k in range(1, 7)) + """
    ),
    grange AS (
      SELECT unnest(range(2, (SELECT max(len(piece)) FROM vocab) + 1))
             AS g
    ),
    words AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    wc AS (SELECT w, count(*) AS n FROM words GROUP BY w),
    pos AS (
      SELECT w, unnest(range(1, len(w) + 1)) AS p FROM wc
      WHERE len(w) >= 1
    ),
    cand AS (
      SELECT w, p, max(g) AS gmax FROM (
        SELECT w, p, g, substr(w, p, CAST(g AS INT)) AS piece
        FROM pos, grange WHERE p + g - 1 <= len(w)
      ) c WHERE piece IN (SELECT piece FROM vocab)
      GROUP BY w, p
    ),
    walk AS (
      SELECT w, len(w) AS l, 1 AS pos, 0 AS cnt FROM wc WHERE len(w) >= 1
      UNION ALL
      SELECT walk.w, walk.l, walk.pos + coalesce(c.gmax, 1), walk.cnt + 1
      FROM walk LEFT JOIN cand c ON c.w = walk.w AND c.p = walk.pos
      WHERE walk.pos <= walk.l
    ),
    pieces AS (SELECT w, max(cnt) AS n_pieces FROM walk GROUP BY w)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ws_tokens,
           CAST(sum(coalesce(p.n_pieces, 0)) AS BIGINT) AS n_bpe_tokens,
           round(sum(coalesce(p.n_pieces, 0)) * 1.0 / count(*), 6)
             AS pieces_per_word
    FROM words LEFT JOIN pieces p USING (w)
    GROUP BY doc_id
""")

def _unigram_sql(mode: str, em_iters: int = 2, G: int = 4,
                 seed_multi: int = 300, keep_multi: int = 200,
                 max_word_len: int = 20, top_k: int = 30) -> str:
    """DuckDB mirror of the unrolled unigram-LM trainer
    (`corpus_stats._unigram_train_chain`): the Viterbi forward DP is a
    `list_reduce` whose accumulator is the growing best[] array (init
    via the list_prepend trick), the backward reconstruction a
    struct-accumulator reduce with the same smallest-g integer-exact
    tie-break; piece scores are micro-nat BIGINTs so every DP
    comparison is exact in both engines. ``mode``: 'train' emits the
    final vocab table, 'apply' the per-document piece counts."""
    # DuckDB 1.0's lambda machinery is unusable for this DP (verified:
    # a STRUCT accumulator whose field is a growing list silently fails
    # to accumulate inside list_reduce, and nested lambdas that
    # reference outer columns misalign rows under vectorized execution
    # at corpus scale), so the Viterbi folds are RECURSIVE CTEs with the
    # g-candidates unrolled as LEFT JOINs — zero lambdas anywhere.
    SENT = "-4000000000000000"

    def fwd_cands(r: int) -> tuple[str, str]:
        cands = ", ".join(
            f"coalesce(f.best[CAST(f.i + 2 - {g} AS INT)] + l{g}.lp, "
            f"{SENT})"
            for g in range(1, G + 1))
        joins = "".join(
            f"""
      LEFT JOIN lp{r - 1} l{g}
        ON f.i + 1 >= {g}
       AND l{g}.piece = substr(f.w, CAST(f.i + 2 - {g} AS INT), {g})"""
            for g in range(1, G + 1))
        return cands, joins

    def bwd_parts(r: int) -> tuple[str, str]:
        whens = "\n              ".join(
            f"WHEN coalesce(b.best[CAST(b.pos - {g - 1} AS INT)] + "
            f"l{g}.lp, {SENT}) = b.best[CAST(b.pos + 1 AS INT)] "
            f"THEN {g}"
            for g in range(1, G))
        joins = "".join(
            f"""
      LEFT JOIN lp{r - 1} l{g}
        ON b.pos >= {g}
       AND l{g}.piece = substr(b.w, CAST(b.pos - {g - 1} AS INT), {g})"""
            for g in range(1, G))
        return whens, joins

    def viterbi_ctes(r: int) -> str:
        cands, fjoins = fwd_cands(r)
        whens, bjoins = bwd_parts(r)
        return f"""
    , fwd{r} AS (
      SELECT w, n, 0 AS i, [CAST(0 AS BIGINT)] AS best FROM wc
      UNION ALL
      SELECT f.w, f.n, f.i + 1 AS i,
             list_append(f.best, greatest({cands})) AS best
      FROM fwd{r} f{fjoins}
      WHERE f.i < length(f.w)
    )
    , bwd{r} AS (
      SELECT w, n, best, CAST(length(w) AS BIGINT) AS pos,
             CAST(NULL AS VARCHAR) AS piece
      FROM fwd{r} WHERE i = length(w)
      UNION ALL
      SELECT t.w, t.n, t.best, t.pos - t.gp AS pos,
             substr(t.w, CAST(t.pos - t.gp + 1 AS INT),
                    CAST(t.gp AS INT)) AS piece
      FROM (
        SELECT b.w, b.n, b.best, b.pos,
               CASE {whens}
                    ELSE {G} END AS gp
        FROM bwd{r} b{bjoins}
        WHERE b.pos > 0
      ) t
    )
    , seg{r} AS MATERIALIZED (
      SELECT w, n, piece FROM bwd{r} WHERE piece IS NOT NULL
    )"""

    parts = [f"""
    WITH RECURSIVE twords AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    wc AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM twords
      WHERE length(w) BETWEEN 1 AND {max_word_len} GROUP BY w
    ),
    grams AS (
      SELECT substr(w, CAST(s AS INT), CAST(g AS INT)) AS piece, n
      FROM wc, range(1, {G} + 1) tg(g),
           range(1, {max_word_len} + 1) ts(s)
      WHERE s + g - 1 <= length(w)
    ),
    seed AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
             FROM grams GROUP BY piece),
    chars AS (SELECT piece FROM seed WHERE length(piece) = 1),
    multis0 AS (SELECT piece FROM seed WHERE length(piece) > 1
                ORDER BY cnt DESC, piece LIMIT {seed_multi}),
    v0 AS (
      SELECT s.piece, s.cnt AS sc FROM seed s
      JOIN (SELECT piece FROM chars
            UNION ALL SELECT piece FROM multis0) k USING (piece)
    ),
    lp0 AS MATERIALIZED (
      SELECT piece, CAST(floor(1000000 * ln(sc * 1.0
               / (SELECT sum(sc) FROM v0))) AS BIGINT) AS lp
      FROM v0
    )"""]
    for r in range(1, em_iters + 1):
        parts.append(viterbi_ctes(r))
        parts.append(f"""
    , cnt{r} AS MATERIALIZED (
      SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
      FROM seg{r} GROUP BY piece
    )
    , keepm{r} AS (SELECT piece FROM cnt{r} WHERE length(piece) > 1
                   ORDER BY cnt DESC, piece LIMIT {keep_multi})
    , v{r} AS MATERIALIZED (
      SELECT k.piece, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
             CAST(coalesce(c.cnt, 0) + 1 AS BIGINT) AS sc
      FROM (SELECT piece FROM chars
            UNION ALL SELECT piece FROM keepm{r}) k
      LEFT JOIN cnt{r} c USING (piece)
    )
    , lp{r} AS MATERIALIZED (
      SELECT piece, CAST(floor(1000000 * ln(sc * 1.0
               / (SELECT sum(sc) FROM v{r}))) AS BIGINT) AS lp
      FROM v{r}
    )""")
    n = em_iters
    if mode == "train":
        parts.append(f"""
    SELECT rank, piece, piece_len, n_viterbi, prob FROM (
      SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT)
               AS rank,
             piece, CAST(length(piece) AS INT) AS piece_len,
             cnt AS n_viterbi,
             round(sc * 1.0 / (SELECT sum(sc) FROM v{n}), 6) AS prob
      FROM v{n}
    ) t WHERE rank <= {top_k}""")
        return "".join(parts)
    parts.append(viterbi_ctes(n + 1))
    parts.append(f"""
    , wnp AS MATERIALIZED (SELECT w, CAST(count(*) AS INT) AS np
              FROM seg{n + 1} GROUP BY w)
    , dwords AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ws_tokens,
           CAST(sum(coalesce(np, length(w))) AS BIGINT)
             AS n_unigram_tokens,
           round(sum(coalesce(np, length(w))) * 1.0 / count(*), 6)
             AS pieces_per_word
    FROM (SELECT doc_id, w FROM dwords WHERE length(w) >= 1) d
    LEFT JOIN wnp USING (w) GROUP BY doc_id""")
    return "".join(parts)


QUERIES["tokenize_unigram_train"] = _bind(corpus_stats.unigram_train,
                                          "documents")
ORACLE["tokenize_unigram_train"] = _unigram_sql("train")

QUERIES["tokenize_unigram_apply"] = _bind(corpus_stats.unigram_apply,
                                          "documents")
ORACLE["tokenize_unigram_apply"] = _unigram_sql("apply")

QUERIES["text_hash_embeddings"] = _bind(textops.hash_embedding_stats,
                                        "documents")
# in-engine feature-hashing embeddings (Weinberger et al. 2009): signed
# token counts in md5-bucketed dims; integer components — the checksum
# idiom of quantize_embeddings_int8 makes the vector bit-checkable
def _he_vec_sql(src: str = "documents") -> str:
    """The hash-embedding CTE chain over relation `src` (must expose
    doc_id, text) — shared by the embedding stats, the ANN composition,
    and the embedding-decontamination oracles."""
    return _HE_VEC.replace("FROM __HE_SRC__", f"FROM {src}")


_HE_VEC = """
    he_toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM __HE_SRC__
    ),
    he_pb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % 64 AS INT) AS b,
             CASE WHEN ('0x' || substr(md5(t), 9, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM he_toks
    ),
    he_sums AS (
      SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS val
      FROM he_pb GROUP BY 1, 2
    ),
    he_full AS (
      SELECT d.doc_id, r.i AS b, coalesce(p.val, 0) AS val
      FROM (SELECT DISTINCT doc_id FROM he_toks) d
      CROSS JOIN range(0, 64) r(i)
      LEFT JOIN he_sums p ON p.doc_id = d.doc_id AND p.b = r.i
    ),
    he_vec AS (
      SELECT doc_id, list(val ORDER BY b) AS v
      FROM he_full GROUP BY doc_id
    )"""
ORACLE["text_hash_embeddings"] = "WITH " + _he_vec_sql() + """
    SELECT doc_id,
           CAST(len([x for x in v if x != 0]) AS INT) AS nnz,
           CAST(list_aggregate([abs(x) for x in v], 'sum') AS BIGINT)
             AS l1,
           round(sqrt(CAST(list_aggregate([x * x for x in v], 'sum')
                           AS DOUBLE)), 6) AS l2,
           md5(array_to_string(v, ',')) AS v_checksum
    FROM he_vec
"""


def _he_bucket_sql(vexpr: str, n_planes: int = 4, dim: int = 64) -> str:
    """Sign-LSH bucket of a hashed-embedding vector as inline plane
    literals (repr() round-trips the doubles bit-identically — the
    `_lsh_planes_sql` idiom)."""
    planes = similarity.hash_planes(1, n_planes, dim)[0]
    return " || ".join(
        f"(CASE WHEN list_dot_product(CAST({vexpr} AS DOUBLE[]), "
        f"[{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
        "THEN '1' ELSE '0' END)"
        for p in planes)


QUERIES["decontaminate_embedding"] = _bind(
    curation.decontaminate_embedding, "documents")
# semantic decontamination: hash-embed the synthetic-dup corpus, sign-LSH
# bucket both sides, cosine-verify same-bucket (train x benchmark) pairs
ORACLE["decontaminate_embedding"] = (
    _CORPUS + "," + _he_vec_sql("corpus") + f"""
    , emb AS (
      SELECT doc_id, CAST(v AS DOUBLE[]) AS v,
             {_he_bucket_sql("v")} AS bkt
      FROM he_vec
    ),
    bench AS (
      SELECT doc_id AS bench_id, v AS bv, bkt FROM emb
      WHERE doc_id % 13 = 0 AND doc_id < 100000
    ),
    train AS (
      SELECT doc_id AS train_id, v, bkt FROM emb
      WHERE NOT (doc_id % 13 = 0 AND doc_id < 100000)
    )
    SELECT train_id, bench_id, round(cosine, 6) AS cosine FROM (
      SELECT t.train_id, b.bench_id,
             list_dot_product(t.v, b.bv)
             / (sqrt(list_dot_product(t.v, t.v))
                * sqrt(list_dot_product(b.bv, b.bv))) AS cosine
      FROM train t JOIN bench b USING (bkt)
    ) s WHERE cosine >= 0.99
""")


def _hash_embed_topk(spark, sf_dir):
    """End-to-end text→vector→ANN composition: embed the corpus
    in-engine (hashing trick), then exact cosine top-k with doc_id < 10
    as queries — the pipeline that retires the 'embeddings arrive from
    outside' assumption."""
    docs = ensure_views(spark, sf_dir)["documents"]
    emb = textops.hash_embeddings(docs).select(
        F.col("doc_id").alias("vec_id"), F.col("v").alias("embedding"))
    return similarity.brute_force_topk(emb)


QUERIES["similarity_hash_embed_topk"] = _hash_embed_topk
ORACLE["similarity_hash_embed_topk"] = "WITH " + _he_vec_sql() + """
    SELECT query_id, neighbor_id, rank FROM (
      SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.doc_id
               ORDER BY list_dot_product(CAST(q.v AS DOUBLE[]),
                                         CAST(c.v AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(q.v AS DOUBLE[]),
                                                 CAST(q.v AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(c.v AS DOUBLE[]),
                                                   CAST(c.v AS DOUBLE[]))))
                        DESC, c.doc_id
             ) AS rank
      FROM he_vec q JOIN he_vec c ON c.doc_id >= 10
      WHERE q.doc_id < 10
    ) t WHERE rank <= 3
"""

QUERIES["dedup_bloom_filter"] = _bind(dedup.bloom_filter_dedup,
                                      "documents")
# portable bloom-filter membership: k=4 disjoint 32-bit md5 slices mod
# m=2^18, existing-corpus bit set vs new-batch probes, exact membership
# as the false-positive oracle — every bit reproducible in DuckDB
_BLOOM_BITS = ", ".join(
    f"(('0x' || substr(digest, {h * 8 + 1}, 8))::BIGINT % 262144)"
    for h in range(4))
ORACLE["dedup_bloom_filter"] = _CORPUS + f"""
    , digests AS (SELECT doc_id, md5(text) AS digest FROM corpus),
    existing AS (SELECT * FROM digests WHERE doc_id < 100000),
    new_batch AS (SELECT * FROM digests WHERE doc_id >= 100000),
    bits AS (
      SELECT DISTINCT bit FROM (
        SELECT unnest([{_BLOOM_BITS}]) AS bit FROM existing) b
    ),
    pos AS (
      SELECT doc_id, unnest([{_BLOOM_BITS}]) AS bit FROM new_batch
    ),
    hits AS (
      SELECT doc_id, count(*) AS n_set
      FROM pos JOIN bits USING (bit) GROUP BY doc_id
    ),
    exact AS (SELECT DISTINCT digest FROM existing)
    SELECT n.doc_id,
           coalesce(h.n_set, 0) = 4 AS bloom_maybe,
           e.digest IS NOT NULL AS exact_dup,
           (coalesce(h.n_set, 0) = 4 AND e.digest IS NULL)
             AS false_positive
    FROM new_batch n
    LEFT JOIN hits h USING (doc_id)
    LEFT JOIN exact e USING (digest)
"""

def _lsh_match_sql(idx_sql: str, probe_sql: str,
                   threshold: float = 0.5) -> str:
    """DuckDB mirror of the MinHash band matcher (streaming near-dup /
    persisted LSH index): relations `idx` and `probe` (doc_id, text) →
    banded candidates → exact-Jaccard-verified (doc_a=index,
    doc_b=probe, jaccard) pairs. Same md5-slice minhash math as the
    dedup_minhash_lsh oracle."""
    mins = ", ".join(
        f"min(substr(md5(shingle), {h * 5 + 1}, 5)) AS mh{h}"
        for h in range(6))
    return f"""
    WITH idx AS ({idx_sql}),
    probe AS ({probe_sql}),
    tok_c AS (
      SELECT doc_id, list_distinct([array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)]) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM idx) t
    ),
    tok_i AS (
      SELECT doc_id, list_distinct([array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)]) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM probe) t
    ),
    sig_c AS (
      SELECT doc_id, {mins}
      FROM (SELECT doc_id, unnest(sh) AS shingle FROM tok_c) s
      GROUP BY doc_id
    ),
    sig_i AS (
      SELECT doc_id, {mins}
      FROM (SELECT doc_id, unnest(sh) AS shingle FROM tok_i) s
      GROUP BY doc_id
    ),
    bands_c AS (
      SELECT doc_id, 0 AS band, mh0 || mh1 AS bucket FROM sig_c
      UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM sig_c
      UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM sig_c
    ),
    bands_i AS (
      SELECT doc_id, 0 AS band, mh0 || mh1 AS bucket FROM sig_i
      UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM sig_i
      UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM sig_i
    ),
    cand AS (
      SELECT DISTINCT c.doc_id AS doc_a, i.doc_id AS doc_b
      FROM bands_c c JOIN bands_i i USING (band, bucket)
    )
    SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(ta.sh, tb.sh))) AS jaccard
      FROM cand
      JOIN tok_c ta ON cand.doc_a = ta.doc_id
      JOIN tok_i tb ON cand.doc_b = tb.doc_id
    ) v WHERE jaccard >= {threshold}
"""


_LSH_ORIGINALS = ("SELECT doc_id, text FROM documents "
                  "WHERE doc_id % 100000 < 200")
_LSH_INCOMING = """
      SELECT doc_id + 100000 AS doc_id, text FROM documents
      WHERE doc_id % 100000 < 200 AND doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, 'zzz ' || text FROM documents
      WHERE doc_id % 100000 < 200 AND doc_id % 3 = 0
"""
_LSH_EXACTS = ("SELECT doc_id + 100000 AS doc_id, text FROM documents "
               "WHERE doc_id % 100000 < 200 AND doc_id % 2 = 0")
_LSH_NEARS = ("SELECT doc_id + 200000 AS doc_id, 'zzz ' || text AS text "
              "FROM documents "
              "WHERE doc_id % 100000 < 200 AND doc_id % 3 = 0")


def _lsh_index_persisted(spark, sf_dir):
    """Persisted LSH dedup index lifecycle: build from the bounded
    originals, query the planted arrival batch — identical result set to
    the streaming near-dup matcher, whose oracle it shares."""
    docs = ensure_views(spark, sf_dir)["documents"]
    d = similarity._index_scratch()
    dedup.lsh_index_build(docs, d)
    incoming = dedup._bounded_corpus(docs, 200).filter(
        F.col("doc_id") >= 100000)
    return dedup.lsh_index_query(spark, d, incoming)


QUERIES["dedup_lsh_index_persisted"] = _lsh_index_persisted
ORACLE["dedup_lsh_index_persisted"] = _lsh_match_sql(
    _LSH_ORIGINALS, _LSH_INCOMING)


def _lsh_index_add_batch(spark, sf_dir):
    """Index lifecycle with incremental admission: the exact copies
    (+100000) are ADDED to the index after the build, then the near-dups
    (+200000) probe the enlarged index — they must now also match the
    admitted copies, not just the originals."""
    docs = ensure_views(spark, sf_dir)["documents"]
    d = similarity._index_scratch()
    dedup.lsh_index_build(docs, d)
    bounded = dedup._bounded_corpus(docs, 200)
    dedup.lsh_index_add_batch(
        spark, d, bounded.filter((F.col("doc_id") >= 100000)
                                 & (F.col("doc_id") < 200000)))
    return dedup.lsh_index_query(
        spark, d, bounded.filter(F.col("doc_id") >= 200000))


QUERIES["dedup_lsh_index_add_batch"] = _lsh_index_add_batch
ORACLE["dedup_lsh_index_add_batch"] = _lsh_match_sql(
    f"{_LSH_ORIGINALS} UNION ALL {_LSH_EXACTS}", _LSH_NEARS)


def _lsh_index_delete(spark, sf_dir):
    """Index lifecycle with merge-on-read DELETE: build from the bounded
    originals, tombstone the doc_id % 4 == 0 quarter (one O(|keys|)
    manifest bump — no index data rewritten), then probe with the exact
    copies of the EVEN originals. Copies of deleted originals
    (doc_id % 4 == 0) must no longer match; copies of surviving evens
    (doc_id % 4 == 2) still do — equivalent to an index built without
    the deleted docs, which is exactly what the oracle builds."""
    docs = ensure_views(spark, sf_dir)["documents"]
    d = similarity._index_scratch()
    dedup.lsh_index_build(docs, d)
    bounded = dedup._bounded_corpus(docs, 200)
    dedup.lsh_index_delete(
        spark, d,
        bounded.filter((F.col("doc_id") < 100000)
                       & (F.col("doc_id") % 4 == 0)).select("doc_id"))
    return dedup.lsh_index_query(
        spark, d,
        bounded.filter((F.col("doc_id") >= 100000)
                       & (F.col("doc_id") < 200000)))


QUERIES["dedup_lsh_index_delete"] = _lsh_index_delete
ORACLE["dedup_lsh_index_delete"] = _lsh_match_sql(
    f"{_LSH_ORIGINALS} AND doc_id % 4 <> 0", _LSH_EXACTS)


def _lsh_index_compact(spark, sf_dir):
    """Full index lifecycle: build → tombstone the doc_id % 4 == 0
    quarter → COMPACT (tombstones materialized away, one fresh dir per
    table, no anti-join left in the read path) → probe with the exact
    copies. Compaction changes layout, never content — the result (and
    oracle) is identical to the pre-compaction delete key."""
    docs = ensure_views(spark, sf_dir)["documents"]
    d = similarity._index_scratch()
    dedup.lsh_index_build(docs, d)
    bounded = dedup._bounded_corpus(docs, 200)
    dedup.lsh_index_delete(
        spark, d,
        bounded.filter((F.col("doc_id") < 100000)
                       & (F.col("doc_id") % 4 == 0)).select("doc_id"))
    dedup.lsh_index_compact(spark, d)
    return dedup.lsh_index_query(
        spark, d,
        bounded.filter((F.col("doc_id") >= 100000)
                       & (F.col("doc_id") < 200000)))


QUERIES["dedup_lsh_index_compact"] = _lsh_index_compact
ORACLE["dedup_lsh_index_compact"] = _lsh_match_sql(
    f"{_LSH_ORIGINALS} AND doc_id % 4 <> 0", _LSH_EXACTS)


def _lsh_index_reinsert(spark, sf_dir):
    """Index lifecycle with DELETE-THEN-RE-ADMIT — the sequence the
    streaming ingest gate makes likely (a doc is removed, then a later
    batch legitimately re-ingests it): build → tombstone the
    doc_id % 4 == 0 quarter → `lsh_index_add_batch` re-admits the
    doc_id % 8 == 0 half of the deleted docs → probe with the exact
    copies of the evens. SEQUENCED tombstones (r12) make the re-added
    docs matchable at HEAD — their re-add dirs outsequence the
    tombstone — so the visible index is originals with
    doc_id % 4 != 0 OR doc_id % 8 == 0, which is exactly what the
    oracle builds. Under the pre-r12 unsequenced semantics the
    re-admitted half stayed invisible (silently lost data)."""
    docs = ensure_views(spark, sf_dir)["documents"]
    d = similarity._index_scratch()
    dedup.lsh_index_build(docs, d)
    bounded = dedup._bounded_corpus(docs, 200)
    deleted = bounded.filter((F.col("doc_id") < 100000)
                             & (F.col("doc_id") % 4 == 0))
    dedup.lsh_index_delete(spark, d, deleted.select("doc_id"))
    dedup.lsh_index_add_batch(
        spark, d, deleted.filter(F.col("doc_id") % 8 == 0))
    return dedup.lsh_index_query(
        spark, d,
        bounded.filter((F.col("doc_id") >= 100000)
                       & (F.col("doc_id") < 200000)))


QUERIES["dedup_lsh_index_reinsert"] = _lsh_index_reinsert
ORACLE["dedup_lsh_index_reinsert"] = _lsh_match_sql(
    f"{_LSH_ORIGINALS} AND (doc_id % 4 <> 0 OR doc_id % 8 = 0)",
    _LSH_EXACTS)


QUERIES["tokenize_bpe_merge_order"] = _bind(
    corpus_stats.bpe_apply_merge_order, "documents")
# merge-ORDER application: the train chain's FINAL vocabulary state (v6,
# now carrying the word key) IS each trained word's segmentation; corpus
# words outside the trained vocab fall back to per-character pieces
ORACLE["tokenize_bpe_merge_order"] = (
    _bpe_train_oracle_sql().rsplit("SELECT 1 AS step", 1)[0].rstrip()
    .rstrip(",")
    + """,
    words AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    wp AS (SELECT w, len(syms) AS np FROM v6)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ws_tokens,
           CAST(sum(coalesce(np, length(w))) AS BIGINT) AS n_bpe_tokens,
           round(sum(coalesce(np, length(w))) * 1.0 / count(*), 6)
             AS pieces_per_word
    FROM words LEFT JOIN wp USING (w)
    GROUP BY doc_id
""")

QUERIES["quality_classifier_scores"] = _bind(
    curation.quality_classifier_scores, "documents")
# logistic quality classifier (curation.quality_classifier_scores):
# identical feature math and literal weights; exp() is IEEE double on
# both engines (same precedent as the DSIR ln()-based oracle)
ORACLE["quality_classifier_scores"] = """
    WITH f AS (
      SELECT doc_id,
             string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS n,
             length(replace(text, ' ', '')) AS n_nonspace,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS n_digits
      FROM documents
    ),
    feat AS (
      SELECT doc_id, n,
             CAST(len([t for t in toks
                       if t IN ('the','a','of','and','to',
                                'in','is','it','for','on')]) AS DOUBLE) / n
               AS stop_ratio,
             CAST(n_nonspace AS DOUBLE) / n AS avg_len,
             1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n AS dup_frac,
             CAST(n_digits AS DOUBLE) / n_chars AS digit_ratio
      FROM f
    ),
    scored AS (
      SELECT doc_id, n, stop_ratio, dup_frac, digit_ratio,
             -1.5 + 0.55 * ln(CAST(n AS DOUBLE) + 1.0)
                  + 6.0 * stop_ratio
                  - 0.35 * abs(avg_len - 5.0)
                  - 4.0 * dup_frac
                  - 2.5 * digit_ratio AS logit
      FROM feat
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           round(stop_ratio, 6) AS stop_ratio,
           round(dup_frac, 6) AS dup_token_frac,
           round(digit_ratio, 6) AS digit_ratio,
           round(logit, 6) AS quality_logit,
           round(1.0 / (1.0 + exp(-logit)), 6) AS quality_prob,
           1.0 / (1.0 + exp(-logit)) >= 0.5 AS keep
    FROM scored
"""

QUERIES["pack_sequences_bpe"] = _bind(packing.pack_sequences_bpe,
                                      "documents")
# packing under BPE budgets: the tokenize_bpe_apply oracle's CTE chain
# (vocab -> greedy walk -> per-word pieces) feeding the pack_sequences
# running-offset arithmetic
ORACLE["pack_sequences_bpe"] = ORACLE["tokenize_bpe_apply"].rsplit(
    "SELECT doc_id,", 1)[0] + """, per_doc AS (
      SELECT doc_id,
             CAST(sum(coalesce(p.n_pieces, 0)) AS BIGINT) AS n_tokens
      FROM words LEFT JOIN pieces p USING (w)
      GROUP BY doc_id
    ),
    based AS (
      SELECT d.doc_id, substr(md5(d.text), 1, 2) AS bucket, pd.n_tokens
      FROM documents d JOIN per_doc pd USING (doc_id)
    ),
    packed AS (
      SELECT doc_id, bucket, n_tokens,
             sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start
      FROM based
    )
    SELECT doc_id, bucket, n_tokens,
           CAST(start // 512 AS BIGINT) AS seq_id,
           CAST(start % 512 AS BIGINT) AS tok_offset
    FROM packed
"""


def _pq_sql(k: int = 3, n_queries: int = 10, m: int = 4, ks: int = 16,
            iters: int = 1, dim: int = 64) -> str:
    """DuckDB oracle for `similarity.pq_topk`: per-subspace Lloyd
    codebooks (same deterministic spec), corpus encoding, ADC lookup-sum,
    per-query top-k."""
    sd = dim // m
    d2 = (f"list_aggregate([ (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]) "
          f"for i in range(1, {sd} + 1) ], 'sum')")
    subs = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS j, v[{j * sd + 1}:{(j + 1) * sd}] AS sv "
        "FROM emb"
        for j in range(m))
    parts = [f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sub AS ({subs}),
    cb0 AS (
      SELECT j, CAST(vec_id AS INT) AS cluster, sv AS cv
      FROM sub WHERE vec_id < {ks}
    )"""]
    for it in range(1, iters + 1):
        parts.append(f"""
    , a{it} AS (
      SELECT j, cluster, sv FROM (
        SELECT s.vec_id, s.j, s.sv, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2}, c.cluster) AS rn
        FROM sub s JOIN cb{it - 1} c USING (j)
      ) r WHERE rn = 1
    )
    , p{it} AS (
      SELECT j, cluster, t.i AS i, sum(sv[t.i]) / count(*) AS mu
      FROM a{it} CROSS JOIN range(1, {sd} + 1) AS t(i)
      GROUP BY j, cluster, t.i
    )
    , cb{it} AS (
      SELECT j, cluster, list(mu ORDER BY i) AS cv
      FROM p{it} GROUP BY j, cluster
    )""")
    parts.append(f"""
    , codes AS (
      SELECT vec_id, j, cluster AS code FROM (
        SELECT s.vec_id, s.j, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2}, c.cluster) AS rn
        FROM sub s JOIN cb{iters} c USING (j)
        WHERE s.vec_id >= {n_queries}
      ) r WHERE rn = 1
    )
    , lut AS (
      SELECT s.vec_id AS query_id, s.j, c.cluster, {d2} AS d2
      FROM sub s JOIN cb{iters} c USING (j)
      WHERE s.vec_id < {n_queries}
    )
    , adc AS (
      SELECT l.query_id, co.vec_id, sum(l.d2) AS approx_d2
      FROM codes co JOIN lut l ON l.j = co.j AND l.cluster = co.code
      GROUP BY l.query_id, co.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank,
           round(approx_d2, 6) AS approx_d2
    FROM (
      SELECT query_id, vec_id, approx_d2,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY approx_d2, vec_id)
                  AS INT) AS rank
      FROM adc
    ) t WHERE rank <= {k}""")
    return "".join(parts)


QUERIES["similarity_pq_topk"] = _bind(similarity.pq_topk, "embeddings")
ORACLE["similarity_pq_topk"] = _pq_sql()

QUERIES["dedup_substring_stats"] = _bind(dedup.exact_substring_dedup_stats,
                                         "documents")
# per-doc duplicated-span coverage: the spans oracle's CTE chain rolled
# up per doc and left-joined onto subset token counts
ORACLE["dedup_substring_stats"] = ORACLE["dedup_exact_substrings"].rsplit(
    "SELECT doc_id,", 1)[0] + """, per_span AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 16 AS e
      FROM spans GROUP BY doc_id, span_id
    ),
    per_doc AS (
      SELECT doc_id, sum(e - s) AS dup_tokens FROM per_span GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
      FROM subset
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS INT) AS n_tokens,
           CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(coalesce(pd.dup_tokens, 0) * 1.0 / b.n_tokens, 6)
             AS dup_frac
    FROM base b LEFT JOIN per_doc pd USING (doc_id)
"""

QUERIES["perplexity_bigram"] = _bind(corpus_stats.perplexity_bigram,
                                     "documents")
# add-one-smoothed bigram LM (corpus_stats.perplexity_bigram):
# p(w2|w1) = (count(w1 w2)+1) / (count(w1)+V), V = unigram vocab size
ORACLE["perplexity_bigram"] = """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(
        [struct_pack(w1 := l[i], gram := concat_ws(' ', l[i], l[i+1]))
         for i in range(1, len(l))]) AS g
      FROM toks WHERE len(l) >= 2
    ),
    tf AS (
      SELECT doc_id, g.w1 AS w1, g.gram AS gram, count(*) AS tf
      FROM grams GROUP BY doc_id, g.w1, g.gram
    ),
    blm AS (SELECT w1, gram, sum(tf) AS bcnt FROM tf GROUP BY w1, gram),
    ulm AS (SELECT w1, sum(tf) AS ucnt FROM tf GROUP BY w1),
    vocab AS (
      SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS token
        FROM documents) t
    ),
    scored AS (
      SELECT tf.doc_id, tf.tf,
             -log2((blm.bcnt + 1.0) / (ulm.ucnt + vocab.v)) AS bits
      FROM tf JOIN blm USING (w1, gram) JOIN ulm USING (w1), vocab
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             round(sum(tf * bits) / sum(tf), 6) AS bits_per_bigram
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, bits_per_bigram,
           bits_per_bigram > 12.0 AS high_ppl
    FROM per_doc
"""

QUERIES["assign_contiguous_ids"] = _bind(packing.assign_contiguous_ids,
                                         "documents")
# two-pass offset id assignment: the oracle IS the single-window form
# the scale path avoids
ORACLE["assign_contiguous_ids"] = """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
             AS new_id
    FROM documents
"""

QUERIES["weighted_sample_topk"] = _bind(curation.weighted_sample_topk,
                                        "documents")
# Efraimidis-Spirakis weighted sampling without replacement: priority =
# ln(u)/w in log space, md5 uniform, global top-k
ORACLE["weighted_sample_topk"] = """
    SELECT doc_id, weight, priority, CAST(rank AS INT) AS rank FROM (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             round(p, 6) AS priority,
             row_number() OVER (ORDER BY p DESC, doc_id) AS rank
      FROM (
        SELECT doc_id, n_chars,
               ln(CAST(('0x' || substr(md5(doc_id || ':' || text), 1, 15))
                       ::BIGINT AS DOUBLE) / 1152921504606846976.0)
                 / CAST(n_chars AS DOUBLE) AS p
        FROM documents) t
    ) r WHERE rank <= 100
"""

QUERIES["agg_hll_portable"] = _bind(corpus_stats.hll_distinct_tokens,
                                    "documents")
# portable HyperLogLog (Flajolet et al. 2007): md5-slice bucket/rho, so
# the sketch itself — not just its row count — reproduces in DuckDB
ORACLE["agg_hll_portable"] = """
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
    ),
    hashed AS (
      SELECT ('0x' || substr(md5(t), 1, 3))::BIGINT % 1024 AS bucket,
             ('0x' || substr(md5(t), 4, 13))::BIGINT AS tail,
             t
      FROM toks
    ),
    regs AS (
      SELECT bucket,
             max(CASE WHEN tail = 0 THEN 53
                      ELSE 52 - CAST(floor(log2(tail)) AS BIGINT)
                 END) AS M
      FROM hashed GROUP BY bucket
    ),
    stats AS (
      SELECT sum(power(2.0, -M)) AS s, count(*) AS nz FROM regs
    ),
    exact AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS n_exact
              FROM toks),
    est AS (
      SELECT s, nz, n_exact,
             (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
               / (s + (1024 - nz)) AS est_raw,
             1024.0 - nz AS zeros
      FROM stats, exact
    )
    SELECT CAST(n_exact AS BIGINT) AS n_exact,
           round(CASE WHEN est_raw <= 2.5 * 1024 AND zeros > 0
                      THEN 1024 * ln(1024.0 / zeros)
                      ELSE est_raw END, 6) AS hll_estimate,
           round(abs(CASE WHEN est_raw <= 2.5 * 1024 AND zeros > 0
                          THEN 1024 * ln(1024.0 / zeros)
                          ELSE est_raw END - n_exact) / n_exact, 6)
             AS rel_err,
           CAST(nz AS BIGINT) AS n_registers
    FROM est
"""

QUERIES["dedup_edit_distance"] = _bind(dedup.edit_distance_pairs,
                                       "documents")
# MinHash-band candidates + exact character-level Levenshtein verify —
# both engines implement the same classic edit distance, so the pair
# set reproduces exactly
ORACLE["dedup_edit_distance"] = _CORPUS + f"""
    , subset AS (SELECT * FROM corpus WHERE doc_id % 100000 < 200)
    , shingled AS (
      SELECT doc_id, unnest(list_distinct([
               array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM subset) t
    )
    , sig AS (
      SELECT doc_id,
             {", ".join(f"min(substr(md5(shingle), {h * 5 + 1}, 5)) AS mh{h}"
                        for h in range(6))}
      FROM shingled GROUP BY doc_id
    )
    , bands AS (
      SELECT doc_id, 0 AS band, mh0 || mh1 AS bucket FROM sig
      UNION ALL SELECT doc_id, 1, mh2 || mh3 FROM sig
      UNION ALL SELECT doc_id, 2, mh4 || mh5 FROM sig
    )
    , cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta.text, tb.text) AS INT) AS edit_dist
    FROM cand JOIN subset ta ON cand.doc_a = ta.doc_id
              JOIN subset tb ON cand.doc_b = tb.doc_id
    WHERE levenshtein(ta.text, tb.text) <= 8
"""

QUERIES["multimodal_phash_dedup"] = _bind(
    multimodal.phash_dedup_pairs, "documents")
# perceptual (dHash) image near-dup pairs over the REAL BMP
# encode→decode Arrow path; the oracle regenerates the pixel arithmetic
# from the text (no codec in SQL — the hash match proves the container
# roundtrip bit-faithful) and mirrors the 5-band (13/13/13/13/12-bit)
# banding rule exactly — 5 bands so the pigeonhole recall guarantee
# holds at radius 4 (n_bands > max_hamming).
# The brightness shift adds 3*shift to every channel sum (ASCII corpus —
# never clips), which cancels in the dHash comparisons: the planted
# +200000 variants match at hamming 0 with exact_dup = false.
ORACLE["multimodal_phash_dedup"] = """
    WITH corpus AS (
      SELECT doc_id, text, 0 AS shift FROM documents
      WHERE doc_id % 100000 < 200
      UNION ALL
      SELECT doc_id + 100000, text, 0 FROM documents
      WHERE doc_id % 100000 < 200 AND doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 200000, text, 8 FROM documents
      WHERE doc_id % 100000 < 200 AND doc_id % 3 = 0
    ),
    px AS (
      SELECT doc_id, shift, text,
             list_transform(range(0, 72), p ->
               ord(substr(text, ((3*p)   % len(text)) + 1, 1))
             + ord(substr(text, ((3*p+1) % len(text)) + 1, 1))
             + ord(substr(text, ((3*p+2) % len(text)) + 1, 1))
             + 3 * shift) AS s
      FROM corpus
    ),
    hashes AS (
      SELECT doc_id,
             array_to_string(list_transform(range(0, 64), i ->
               CASE WHEN s[(i // 8) * 9 + (i % 8) + 2]
                         > s[(i // 8) * 9 + (i % 8) + 1]
                    THEN '1' ELSE '0' END), '') AS phash,
             array_to_string(list_transform(range(0, 216), i ->
               CAST(least(ord(substr(text, (i % len(text)) + 1, 1))
                          + shift, 255) AS VARCHAR)), ',') AS rgbkey
      FROM px
    ),
    bands AS (
      SELECT doc_id, phash, rgbkey, b,
             substr(phash, b * 13 + 1,
                    CASE WHEN b = 4 THEN 12 ELSE 13 END) AS key
      FROM hashes CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS b) bb
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.phash AS ha, b.phash AS hb,
             (a.rgbkey = b.rgbkey) AS exact_dup
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming, exact_dup FROM (
      SELECT doc_a, doc_b,
             CAST(len(list_filter(range(1, 65),
                  i -> substr(ha, i, 1) <> substr(hb, i, 1))) AS INT)
               AS hamming,
             exact_dup
      FROM cand
    ) v WHERE hamming <= 4
"""

QUERIES["multimodal_audio_windows"] = _bind(
    multimodal.audio_window_features, "documents")
# all-integer windowed audio features over the real WAV byte path; the
# oracle regenerates the LCG waveform arithmetically (no bytes needed)
ORACLE["multimodal_audio_windows"] = """
    WITH samples AS (
      SELECT doc_id, i,
             ((doc_id * 1103515245 + i * 12345) % 65536) - 32768 AS s
      FROM documents, (SELECT unnest(range(0, 1024)) AS i)
    ),
    flagged AS (
      SELECT doc_id, i, s, CAST(i // 256 AS INT) AS win_idx,
             CASE WHEN i % 256 > 0 AND (s >= 0) <>
                  (lag(s) OVER (PARTITION BY doc_id ORDER BY i) >= 0)
                  THEN 1 ELSE 0 END AS zc
      FROM samples
    )
    SELECT doc_id, win_idx, CAST(count(*) AS INT) AS n,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(sum(zc) AS INT) AS zero_cross,
           CAST(max(abs(s)) AS INT) AS peak
    FROM flagged GROUP BY doc_id, win_idx
"""

QUERIES["pipeline_pretrain_e2e"] = _bind(pipeline.pretrain_pipeline,
                                         "documents")
# end-to-end clean → exact-dedup → decontaminate → pack composition
# (datapipe/pipeline.py): the oracle chains each stage's existing CTE
# shape over the shared synthetic-dup corpus
ORACLE["pipeline_pretrain_e2e"] = _CORPUS + """
    , feats AS (
      SELECT doc_id, text, l,
             CAST(len(l) AS BIGINT) AS n_tokens,
             CAST(round(
               CASE WHEN len(l) >= 20 THEN 0.4 ELSE 0.0 END
               + CASE WHEN (CAST(length(replace(text, ' ', '')) AS DOUBLE)
                            / len(l)) >= 3
                      AND (CAST(length(replace(text, ' ', '')) AS DOUBLE)
                           / len(l)) <= 10 THEN 0.3 ELSE 0.0 END
               + CASE WHEN (CAST(len(list_filter(l, t -> t IN
                     ('the','a','of','and','to','in','is','it','for','on')))
                     AS DOUBLE) / len(l)) >= 0.05
                 THEN 0.3 ELSE 0.0 END, 2) AS DOUBLE) AS quality,
             len(list_filter(l, t -> t IN
               ('the','a','of','and','to','in','is','it','for','on')))
               AS en_votes,
             len(list_filter(l, t -> t IN
               ('der','die','das','und','ist','nicht','ein','zu')))
               AS de_votes,
             len(list_filter(l, t -> t IN
               ('le','la','les','et','est','un','une','pas'))) AS fr_votes
      FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS l
            FROM corpus) t
    ),
    cleaned AS (
      SELECT doc_id, text, l, n_tokens, quality FROM feats
      WHERE quality >= 0.7 AND en_votes >= de_votes AND en_votes >= fr_votes
    ),
    kept AS (
      SELECT md5(text) AS digest, min(doc_id) AS doc_id,
             min(n_tokens) AS n_tokens, min(quality) AS quality
      FROM cleaned GROUP BY 1
    ),
    bench AS (
      SELECT DISTINCT unnest([
               substr(md5(array_to_string(l[i:i+3], ' ')), 1, 16)
               for i in range(1, greatest(len(l) - 3, 1) + 1)]) AS shingle
      FROM (SELECT string_split(lower(text), ' ') AS l FROM documents
            WHERE doc_id % 13 = 0) t
    ),
    flagged AS (
      SELECT DISTINCT md5(text) AS digest
      FROM (
        SELECT text, unnest(list_distinct([
                 substr(md5(array_to_string(l[i:i+3], ' ')), 1, 16)
                 for i in range(1, greatest(len(l) - 3, 1) + 1)])) AS shingle
        FROM cleaned) s
      JOIN bench USING (shingle)
    ),
    survivors AS (
      SELECT * FROM kept
      WHERE digest NOT IN (SELECT digest FROM flagged)
    )
    SELECT doc_id, substr(digest, 1, 2) AS bucket, n_tokens, quality,
           CAST(floor(start / 512) AS BIGINT) AS seq_id,
           CAST(start % 512 AS BIGINT) AS tok_offset
    FROM (
      SELECT doc_id, digest, n_tokens, quality,
             sum(n_tokens) OVER (PARTITION BY substr(digest, 1, 2)
                                 ORDER BY doc_id) - n_tokens AS start
      FROM survivors) p
"""

QUERIES["layout_zorder_stats"] = _bind(layout.zorder_layout_stats, "events")
# Morton/Z-order layout (Morton 1966): exact integer rank + bit
# interleave, so the bucket assignment — the thing the layout write
# range-partitions on — reproduces bit-for-bit in SQL
ORACLE["layout_zorder_stats"] = layout.zorder_oracle_sql()

QUERIES["token_heavy_hitters_bounded"] = _bind(
    corpus_stats.token_heavy_hitters_bounded, "documents")
# two-pass Misra-Gries (1982): bounded-memory candidates + exact recount.
# The threshold compare is pure-integer (n*(k+1) > N), so the EXACT
# result reproduces in SQL even though the Spark plan never aggregates
# the full vocabulary.
ORACLE["token_heavy_hitters_bounded"] = """
    WITH terms AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, count(*) AS n FROM terms GROUP BY token
    ),
    tot AS (SELECT sum(n) AS total FROM counts)
    SELECT token, CAST(n AS BIGINT) AS n_occurrences,
           round(n / CAST(total AS DOUBLE), 6) AS share,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank
    FROM counts, tot
    WHERE n * 201 > total
"""

QUERIES["perplexity_kneser_ney"] = _bind(corpus_stats.perplexity_kneser_ney,
                                         "documents")
# interpolated Kneser-Ney bigram LM (Kneser & Ney 1995 / Chen & Goodman
# 1998): absolute discount D=0.75 + continuation-probability backoff —
# identical expression order to the engine, log2/div are IEEE on both
ORACLE["perplexity_kneser_ney"] = """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    grams AS (
      SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
      FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
            FROM toks WHERE len(ts) >= 2) g
    ),
    tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM grams
           GROUP BY 1, 2, 3),
    blm AS (SELECT w1, w2, sum(tf) AS bcnt FROM tf GROUP BY 1, 2),
    ulm AS (SELECT w1, sum(tf) AS ucnt FROM tf GROUP BY 1),
    nc1 AS (SELECT w1, count(*) AS n1w1 FROM blm GROUP BY 1),
    nc2 AS (SELECT w2, count(*) AS n1w2 FROM blm GROUP BY 1),
    tt AS (SELECT CAST(count(*) AS DOUBLE) AS bt FROM blm),
    scored AS (
      SELECT doc_id, tf,
             -log2(greatest(bcnt - 0.75, 0.0) / ucnt
                   + (0.75 * n1w1 / ucnt) * (n1w2 / bt)) AS bits
      FROM tf
      JOIN blm USING (w1, w2)
      JOIN ulm USING (w1)
      JOIN nc1 USING (w1)
      JOIN nc2 USING (w2), tt
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             round(sum(tf * bits) / sum(tf), 6) AS bits_per_bigram
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, bits_per_bigram,
           bits_per_bigram > 10.0 AS high_ppl
    FROM per_doc
"""

QUERIES["domain_temperature_mix"] = _bind(curation.domain_temperature_mix,
                                          "documents")
# T=0.5 temperature mixture over planted geometric strata: quotas from
# the broadcast sqrt-mass total, exact per-stratum hash-order pick (same
# 60-bit md5 uniform as the stratified oracle)
ORACLE["domain_temperature_mix"] = """
    WITH corpus AS (
      SELECT doc_id,
             'bin' || CAST(floor(log2(doc_id + 2)) AS INT) AS source
      FROM documents
    ),
    s AS (
      SELECT source, doc_id,
             CAST(('0x' || substr(md5(source || ':' || doc_id), 1, 15))
                  ::BIGINT AS DOUBLE) / 1152921504606846976.0 AS u
      FROM corpus
    ),
    c AS (SELECT source, count(*) AS n_stratum FROM s GROUP BY source),
    z AS (SELECT sum(sqrt(CAST(n_stratum AS DOUBLE))) AS z FROM c),
    q AS (
      SELECT source, n_stratum,
             least(n_stratum,
                   CAST(floor(200 * sqrt(CAST(n_stratum AS DOUBLE)) / z.z
                              + 0.5) AS BIGINT)) AS quota
      FROM c, z
    ),
    j AS (
      SELECT s.source, q.n_stratum, q.quota, s.doc_id, s.u
      FROM s JOIN q USING (source)
    ),
    surv AS (
      SELECT * FROM j WHERE u * n_stratum < quota * 4.0
    ),
    -- coverage repair (mirrors the engine): strata whose pre-filter
    -- survivors land under quota re-rank unfiltered
    short AS (
      SELECT q.source
      FROM q LEFT JOIN (SELECT source, count(*) AS n_surv
                        FROM surv GROUP BY source) sc USING (source)
      WHERE coalesce(sc.n_surv, 0) < q.quota
    ),
    pool AS (
      SELECT * FROM surv
      WHERE source NOT IN (SELECT source FROM short)
      UNION ALL
      SELECT * FROM j WHERE source IN (SELECT source FROM short)
    ),
    ranked AS (
      SELECT source, n_stratum, quota, doc_id,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY u, doc_id) AS INT) AS pick
      FROM pool
    )
    SELECT source, CAST(n_stratum AS BIGINT) AS n_stratum, quota,
           doc_id, pick
    FROM ranked WHERE pick <= quota
"""

QUERIES["dedup_canonical"] = _bind(dedup.canonical_dedup_decisions,
                                   "documents")
# canonical-text exact dedup: same normalization chain (lower -> strip
# non-alnum to spaces -> collapse runs -> trim) in DuckDB's RE2
ORACLE["dedup_canonical"] = _CORPUS + """
    , full_corpus AS (
      SELECT doc_id, text FROM corpus
      UNION ALL
      SELECT doc_id + 300000 AS doc_id, upper(text) AS text
      FROM documents WHERE doc_id % 7 = 1
    )
    SELECT md5(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
             AS digest,
           min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM full_corpus
    GROUP BY digest HAVING count(*) > 1
"""


def _clf_train_chain(steps: int = 3, lr: float = 0.5) -> str:
    """The trainer's CTE chain ONLY (feats + unrolled gradient steps,
    ending at CTE ``s{steps}``) — shared verbatim by the train oracle's
    final SELECT and the eval oracle's scoring chain, so neither has to
    string-split the other's formatted SQL (r10 advisor finding)."""
    z = " + ".join(f"w.w{j} * f.x{j}" for j in range(6))
    parts = ["""
    WITH feats AS (
      SELECT 1.0 AS x0,
             ln(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) + 1.0)
               AS x1,
             CAST(len([t for t in string_split(lower(text), ' ')
                       if t IN ('the','a','of','and','to',
                                'in','is','it','for','on')]) AS DOUBLE)
               / len(string_split(lower(text), ' ')) AS x2,
             abs(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(lower(text), ' ')) - 5.0) AS x3,
             1.0 - CAST(len(list_distinct(string_split(lower(text), ' ')))
                        AS DOUBLE)
                   / len(string_split(lower(text), ' ')) AS x4,
             CAST(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS DOUBLE) / length(text) AS x5,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    ),
    s0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2,
                  0.0 AS w3, 0.0 AS w4, 0.0 AS w5)"""]
    for t in range(1, steps + 1):
        gs = ", ".join(
            f"avg((1.0 / (1.0 + exp(-({z}))) - f.y) * f.x{j}) AS g{j}"
            for j in range(6))
        ws = ", ".join(f"w.w{j} - {lr} * g.g{j} AS w{j}" for j in range(6))
        parts.append(f"""
    , g{t} AS (SELECT {gs} FROM feats f, s{t - 1} w)
    , s{t} AS (SELECT {ws} FROM s{t - 1} w, g{t} g)""")
    return "".join(parts)


def _clf_train_sql(steps: int = 3, lr: float = 0.5) -> str:
    """DuckDB oracle for `curation.quality_classifier_train`: identical
    feature math (the quality_classifier_scores oracle's feat CTE) with
    the gradient steps unrolled as chained CTEs (`_clf_train_chain`)."""
    z = " + ".join(f"w.w{j} * f.x{j}" for j in range(6))
    p = f"1.0 / (1.0 + exp(-({z})))"
    names = ["w_bias", "w_log_n", "w_stop", "w_avg_pen", "w_dup", "w_digit"]
    sel = ", ".join(f"round(w.w{j}, 6) AS {nm}"
                    for j, nm in enumerate(names))
    return _clf_train_chain(steps, lr) + f"""
    SELECT {sel},
           round(avg(-(f.y * ln({p}) + (1.0 - f.y) * ln(1.0 - ({p})))), 6)
             AS logloss
    FROM feats f, s{steps} w
    GROUP BY {", ".join(f"w.w{j}" for j in range(6))}"""


QUERIES["quality_classifier_train"] = _bind(
    curation.quality_classifier_train, "documents")
ORACLE["quality_classifier_train"] = _clf_train_sql()


def _clf_ngram_sql(steps: int = 3, lr: float = 0.5,
                   dim: int = 1024) -> str:
    """DuckDB oracle for `curation.quality_classifier_train_ngram`:
    hashed unigram+bigram sparse features (the md5 bucket/sign idiom of
    the hash-embedding oracle), full-batch logistic GD unrolled as
    chained CTEs over the (b, w) weight table — only observed buckets
    carry weight rows; unobserved ones stay 0 forever (gradient 0), so
    the summaries equal Spark's dense broadcast array form."""
    parts = [f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS ts
      FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(list_concat(ts,
        [ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))])) AS t
      FROM toks
    ),
    pb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % {dim} AS INT)
               AS b,
             CASE WHEN ('0x' || substr(md5(t), 9, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM grams
    ),
    sv AS MATERIALIZED (
      SELECT doc_id, b, sum(s) AS sv FROM pb GROUP BY 1, 2
    ),
    ngr AS MATERIALIZED (
      SELECT doc_id, 2 * len(ts) - 1 AS ng,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM toks
    ),
    feats AS MATERIALIZED (
      SELECT doc_id, b, sv * 1.0 / ng AS v
      FROM sv JOIN ngr USING (doc_id)
      UNION ALL
      SELECT doc_id, {dim} AS b, 1.0 AS v FROM ngr
    ),
    nd AS (SELECT count(*) AS n FROM ngr),
    w0 AS (SELECT DISTINCT b, 0.0 AS w FROM feats)"""]
    for t in range(1, steps + 1):
        parts.append(f"""
    , z{t} AS (
      SELECT f.doc_id, sum(f.v * w.w) AS z
      FROM feats f JOIN w{t - 1} w USING (b) GROUP BY 1
    )
    , r{t} AS (
      SELECT l.doc_id, 1.0 / (1.0 + exp(-z.z)) - l.y AS r
      FROM ngr l JOIN z{t} z USING (doc_id)
    )
    , g{t} AS (
      SELECT f.b, sum(r.r * f.v) / (SELECT n FROM nd) AS g
      FROM feats f JOIN r{t} r USING (doc_id) GROUP BY 1
    )
    , w{t} AS MATERIALIZED (
      SELECT w.b, w.w - {lr} * coalesce(g.g, 0.0) AS w
      FROM w{t - 1} w LEFT JOIN g{t} g USING (b)
    )""")
    parts.append(f"""
    , zf AS (
      SELECT f.doc_id, sum(f.v * w.w) AS z
      FROM feats f JOIN w{steps} w USING (b) GROUP BY 1
    )
    , ll AS (
      SELECT count(*) AS n_docs,
             round(avg(-(l.y * ln(1.0 / (1.0 + exp(-z.z)))
                         + (1.0 - l.y)
                           * ln(1.0 - 1.0 / (1.0 + exp(-z.z))))), 6)
               AS logloss
      FROM ngr l JOIN zf z USING (doc_id)
    )
    SELECT CAST(ll.n_docs AS BIGINT) AS n_docs,
           (SELECT count(DISTINCT b) FROM sv) AS n_buckets,
           (SELECT round(w, 6) FROM w{steps} WHERE b = {dim}) AS w_bias,
           (SELECT round(sqrt(sum(w * w)), 6) FROM w{steps}) AS w_l2,
           ll.logloss
    FROM ll""")
    return "".join(parts)


QUERIES["quality_classifier_train_ngram"] = _bind(
    curation.quality_classifier_train_ngram, "documents")
ORACLE["quality_classifier_train_ngram"] = _clf_ngram_sql()

QUERIES["text_html_strip"] = _bind(textops.html_strip_extract, "documents")
# HTML main-text extraction over planted markup: the identical regex
# chain in DuckDB's RE2 ('s' flag for dot-matches-newline)
ORACLE["text_html_strip"] = """
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               '<html><head><script>var x=1;</script></head><body>'
               || '<nav>home | about</nav><p>' || text
               || '</p><div class="footer">&copy; 2026</div></body></html>'
             ELSE text END AS text
      FROM documents
    ),
    cleaned AS (
      SELECT doc_id, text,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text,
                           '<script.*?</script>', ' ', 'gs'),
                         '<style.*?</style>', ' ', 'gs'),
                       '<[^>]*>', ' ', 'g'),
                     '&copy;', ' ', 'g'),
                   '&amp;', '&', 'g'),
                 '&nbsp;', ' ', 'g'),
               ' +', ' ', 'g')) AS clean
      FROM corpus
    )
    SELECT doc_id,
           text LIKE '<html>%' AS is_html,
           round(CAST(length(text) - length(clean) AS DOUBLE)
                 / length(text), 6) AS markup_frac,
           md5(clean) AS clean_digest,
           CAST(length(clean) AS INT) AS n_clean_chars
    FROM cleaned
"""


def _ivf_pq_sql(k: int = 3, n_queries: int = 10, n_cells: int = 8,
                coarse_iters: int = 1, nprobe: int = 2, m: int = 4,
                ks: int = 16, pq_iters: int = 1, dim: int = 64,
                train_pred: str | None = None) -> str:
    """DuckDB oracle for `similarity.ivf_pq_topk`: the coarse-kmeans CTE
    chain (shared generator) + PQ codebooks/codes/LUT + the probe-bounded
    ADC ranking. ``train_pred`` (add-batch lifecycle): coarse + PQ
    TRAINING read only rows matching the predicate, while encode/probe/
    LUT still read the full corpus — encoding against frozen codebooks is
    deterministic, so build-time vs add-time encoding cannot differ."""
    sd = dim // m
    d2s = (f"list_aggregate([ (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]) "
           f"for i in range(1, {sd} + 1) ], 'sum')")
    subs = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS j, v[{j * sd + 1}:{(j + 1) * sd}] AS sv "
        "FROM emb"
        for j in range(m))
    if train_pred is None:
        kmeans = _kmeans_cte(n_cells, coarse_iters, dim)
        tsub = "sub"
        subt_cte = ""
    else:
        emb_sql = f"""emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), embt AS (SELECT * FROM emb WHERE {train_pred})"""
        kmeans = _kmeans_cte(n_cells, coarse_iters, dim,
                             emb_sql=emb_sql, src="embt")
        tsub = "subt"
        subt_cte = f"""
    , subt AS (SELECT * FROM sub WHERE {train_pred})"""
    parts = [kmeans, f"""
    , cells AS (
      SELECT vec_id, cluster AS cell FROM (
        SELECT e.vec_id, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_aggregate([ (e.v[i] - c.cv[i])
                          * (e.v[i] - c.cv[i])
                          for i in range(1, {dim} + 1) ], 'sum'),
                          c.cluster) AS rn
        FROM emb e CROSS JOIN c{coarse_iters} c
        WHERE e.vec_id >= {n_queries}
      ) r WHERE rn = 1
    )
    , probes AS (
      SELECT query_id, cluster AS cell FROM (
        SELECT e.vec_id AS query_id, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_aggregate([ (e.v[i] - c.cv[i])
                          * (e.v[i] - c.cv[i])
                          for i in range(1, {dim} + 1) ], 'sum'),
                          c.cluster) AS rn
        FROM emb e CROSS JOIN c{coarse_iters} c
        WHERE e.vec_id < {n_queries}
      ) r WHERE rn <= {nprobe}
    )
    , sub AS ({subs}){subt_cte}
    , cb0 AS (
      SELECT j, CAST(vec_id AS INT) AS cluster, sv AS cv
      FROM {tsub} WHERE vec_id < {ks}
    )"""]
    for it in range(1, pq_iters + 1):
        parts.append(f"""
    , pa{it} AS (
      SELECT j, cluster, sv FROM (
        SELECT s.vec_id, s.j, s.sv, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2s}, c.cluster) AS rn
        FROM {tsub} s JOIN cb{it - 1} c USING (j)
      ) r WHERE rn = 1
    )
    , pp{it} AS (
      SELECT j, cluster, t.i AS i, sum(sv[t.i]) / count(*) AS mu
      FROM pa{it} CROSS JOIN range(1, {sd} + 1) AS t(i)
      GROUP BY j, cluster, t.i
    )
    , cb{it} AS (
      SELECT j, cluster, list(mu ORDER BY i) AS cv
      FROM pp{it} GROUP BY j, cluster
    )""")
    parts.append(f"""
    , codes AS (
      SELECT vec_id, j, cluster AS code FROM (
        SELECT s.vec_id, s.j, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2s}, c.cluster) AS rn
        FROM sub s JOIN cb{pq_iters} c USING (j)
        WHERE s.vec_id >= {n_queries}
      ) r WHERE rn = 1
    )
    , lut AS (
      SELECT s.vec_id AS query_id, s.j, c.cluster, {d2s} AS d2
      FROM sub s JOIN cb{pq_iters} c USING (j)
      WHERE s.vec_id < {n_queries}
    )
    , adc AS (
      SELECT l.query_id, co.vec_id, sum(l.d2) AS approx_d2
      FROM codes co
      JOIN cells ce ON ce.vec_id = co.vec_id
      JOIN probes p ON p.cell = ce.cell
      JOIN lut l ON l.query_id = p.query_id
                AND l.j = co.j AND l.cluster = co.code
      GROUP BY l.query_id, co.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank,
           round(approx_d2, 6) AS approx_d2
    FROM (
      SELECT query_id, vec_id, approx_d2,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY approx_d2, vec_id)
                  AS INT) AS rank
      FROM adc
    ) t WHERE rank <= {k}""")
    return "".join(parts)


QUERIES["similarity_ivf_pq_topk"] = _bind(similarity.ivf_pq_topk,
                                          "embeddings")
ORACLE["similarity_ivf_pq_topk"] = _ivf_pq_sql()


def _ivf_pq_residual_sql(k: int = 3, n_queries: int = 10, n_cells: int = 8,
                         coarse_iters: int = 1, nprobe: int = 2, m: int = 4,
                         ks: int = 16, pq_iters: int = 1, dim: int = 64,
                         train_pred: str | None = None,
                         with_recall: bool = False,
                         rerank_shortlist: int | None = None,
                         emb_sql: str | None = None,
                         visible_pred: str | None = None) -> str:
    """DuckDB oracle for the RESIDUAL (true IVFADC) encoding: the coarse
    CTE chain + residual computation, PQ codebooks trained on residual
    subvectors (seed = the ks lowest TRAIN-corpus vec_ids), residual
    codes, and the per-(query, probed cell) ADC LUT. ``with_recall``
    appends the exact-d2 top-k baseline, the raw-encoding twin (the
    `_ivf_pq_sql` chain verbatim), and per-query recall@k columns for
    both — mirroring `similarity.ivf_pq_residual_topk`'s output.
    ``train_pred`` restricts TRAINING (coarse + PQ + seed) to matching
    rows while encode/probe read everything — the add-batch contract.
    ``visible_pred`` (over ``co.vec_id``) filters the CODES at scoring
    time only — training, encoding, and probes untouched — mirroring
    the engine's sequenced-tombstone visibility (deletes never
    retrain): the delete/re-insert key's contract."""
    sd = dim // m
    d2s = (f"list_aggregate([ (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]) "
           f"for i in range(1, {sd} + 1) ], 'sum')")
    rsubs = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS j, rv[{j * sd + 1}:{(j + 1) * sd}] AS sv "
        "FROM resid"
        for j in range(m))
    if train_pred is None:
        # emb_sql overrides the corpus CTE (the clustered fixture key
        # regenerates its md5-derived table instead of reading parquet)
        kmeans = _kmeans_cte(n_cells, coarse_iters, dim, emb_sql=emb_sql)
        tsubr, tpred = "subr", "TRUE"
        subrt_cte = ""
    else:
        emb_sql = f"""emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), embt AS (SELECT * FROM emb WHERE {train_pred})"""
        kmeans = _kmeans_cte(n_cells, coarse_iters, dim,
                             emb_sql=emb_sql, src="embt")
        tsubr, tpred = "subrt", train_pred
        subrt_cte = f"""
    , subrt AS (SELECT * FROM subr WHERE {train_pred})"""
    ci = coarse_iters
    parts = [kmeans, f"""
    , cells AS (
      SELECT vec_id, cluster AS cell FROM (
        SELECT e.vec_id, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_aggregate([ (e.v[i] - c.cv[i])
                          * (e.v[i] - c.cv[i])
                          for i in range(1, {dim} + 1) ], 'sum'),
                          c.cluster) AS rn
        FROM emb e CROSS JOIN c{ci} c
        WHERE e.vec_id >= {n_queries}
      ) r WHERE rn = 1
    )
    , probes AS (
      SELECT query_id, cluster AS cell FROM (
        SELECT e.vec_id AS query_id, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_aggregate([ (e.v[i] - c.cv[i])
                          * (e.v[i] - c.cv[i])
                          for i in range(1, {dim} + 1) ], 'sum'),
                          c.cluster) AS rn
        FROM emb e CROSS JOIN c{ci} c
        WHERE e.vec_id < {n_queries}
      ) r WHERE rn <= {nprobe}
    )
    , resid AS (
      SELECT ce.vec_id, ce.cell,
             [ e.v[i] - cc.cv[i] for i in range(1, {dim} + 1) ] AS rv
      FROM cells ce JOIN emb e USING (vec_id)
      JOIN c{ci} cc ON cc.cluster = ce.cell
    )
    , subr AS ({rsubs}){subrt_cte}
    , seed AS (
      SELECT vec_id FROM cells WHERE {tpred}
      ORDER BY vec_id LIMIT {ks}
    )
    , rcb0 AS (
      SELECT j, CAST(vec_id AS INT) AS cluster, sv AS cv
      FROM subr WHERE vec_id IN (SELECT vec_id FROM seed)
    )"""]
    for it in range(1, pq_iters + 1):
        parts.append(f"""
    , ra{it} AS (
      SELECT j, cluster, sv FROM (
        SELECT s.vec_id, s.j, s.sv, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2s}, c.cluster) AS rn
        FROM {tsubr} s JOIN rcb{it - 1} c USING (j)
      ) r WHERE rn = 1
    )
    , rp{it} AS (
      SELECT j, cluster, t.i AS i, sum(sv[t.i]) / count(*) AS mu
      FROM ra{it} CROSS JOIN range(1, {sd} + 1) AS t(i)
      GROUP BY j, cluster, t.i
    )
    , rcb{it} AS (
      SELECT j, cluster, list(mu ORDER BY i) AS cv
      FROM rp{it} GROUP BY j, cluster
    )""")
    vis = visible_pred or "TRUE"
    parts.append(f"""
    , rcodes AS (
      SELECT vec_id, j, cluster AS code FROM (
        SELECT s.vec_id, s.j, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2s}, c.cluster) AS rn
        FROM subr s JOIN rcb{pq_iters} c USING (j)
      ) r WHERE rn = 1
    )
    , qres AS (
      SELECT p.query_id, p.cell,
             [ q.v[i] - cc.cv[i] for i in range(1, {dim} + 1) ] AS rv
      FROM probes p JOIN emb q ON q.vec_id = p.query_id
      JOIN c{ci} cc ON cc.cluster = p.cell
    )
    , qsubr AS ({" UNION ALL ".join(
        f"SELECT query_id, cell, {j} AS j, "
        f"rv[{j * sd + 1}:{(j + 1) * sd}] AS sv FROM qres"
        for j in range(m))})
    , rlut AS (
      SELECT s.query_id, s.cell, s.j, c.cluster, {d2s} AS d2
      FROM qsubr s JOIN rcb{pq_iters} c USING (j)
    )
    , radc AS (
      SELECT l.query_id, co.vec_id, sum(l.d2) AS approx_d2
      FROM rcodes co
      JOIN cells ce ON ce.vec_id = co.vec_id
      JOIN rlut l ON l.cell = ce.cell
                 AND l.j = co.j AND l.cluster = co.code
      WHERE {vis}
      GROUP BY l.query_id, co.vec_id
    )
    , rtopk AS (
      SELECT query_id, vec_id, approx_d2,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY approx_d2, vec_id)
                  AS INT) AS rank
      FROM radc
    )""")
    if rerank_shortlist is not None:
        # IVFADC+R (Jégou et al. 2011 §V): exact-rescore the ADC
        # shortlist only, then rank; recall measured for both the
        # re-ranked and the ADC-only top-k
        parts.append(f"""
    , short AS (
      SELECT query_id, vec_id FROM rtopk WHERE rank <= {rerank_shortlist}
    )
    , rer AS (
      SELECT s.query_id, s.vec_id,
             list_aggregate([ (q.v[i] - e.v[i]) * (q.v[i] - e.v[i])
                      for i in range(1, {dim} + 1) ], 'sum') AS exact_d2
      FROM short s
      JOIN emb q ON q.vec_id = s.query_id
      JOIN emb e ON e.vec_id = s.vec_id
    )
    , rrtop AS (
      SELECT query_id, vec_id, exact_d2,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY exact_d2, vec_id)
                  AS INT) AS rank
      FROM rer
    )
    , exactk AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_aggregate([ (q.v[i] - e.v[i])
                          * (q.v[i] - e.v[i])
                          for i in range(1, {dim} + 1) ], 'sum'),
                          e.vec_id) AS rn
        FROM emb q CROSS JOIN emb e
        WHERE q.vec_id < {n_queries} AND e.vec_id >= {n_queries}
      ) r WHERE rn <= {k}
    )
    , rec_rr AS (
      SELECT t.query_id,
             round(count(e.vec_id) * 1.0 / {k}, 6) AS recall_reranked
      FROM rrtop t LEFT JOIN exactk e
        ON e.query_id = t.query_id AND e.vec_id = t.vec_id
      WHERE t.rank <= {k}
      GROUP BY t.query_id
    )
    , rec_adc AS (
      SELECT t.query_id,
             round(count(e.vec_id) * 1.0 / {k}, 6) AS recall_adc
      FROM rtopk t LEFT JOIN exactk e
        ON e.query_id = t.query_id AND e.vec_id = t.vec_id
      WHERE t.rank <= {k}
      GROUP BY t.query_id
    )
    SELECT t.query_id, t.vec_id AS neighbor_id, t.rank,
           round(t.exact_d2, 6) AS exact_d2,
           rr.recall_reranked,
           coalesce(ra.recall_adc, 0.0) AS recall_adc
    FROM rrtop t
    JOIN rec_rr rr ON rr.query_id = t.query_id
    LEFT JOIN rec_adc ra ON ra.query_id = t.query_id
    WHERE t.rank <= {k}""")
        return "".join(parts)
    if not with_recall:
        parts.append(f"""
    SELECT query_id, vec_id AS neighbor_id, rank,
           round(approx_d2, 6) AS approx_d2
    FROM rtopk WHERE rank <= {k}""")
        return "".join(parts)
    # raw-encoding twin (the _ivf_pq_sql chain) + exact baseline + recall
    subs = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS j, v[{j * sd + 1}:{(j + 1) * sd}] AS sv "
        "FROM emb"
        for j in range(m))
    parts.append(f"""
    , sub AS ({subs})
    , cb0 AS (
      SELECT j, CAST(vec_id AS INT) AS cluster, sv AS cv
      FROM sub WHERE vec_id < {ks}
    )""")
    for it in range(1, pq_iters + 1):
        parts.append(f"""
    , pa{it} AS (
      SELECT j, cluster, sv FROM (
        SELECT s.vec_id, s.j, s.sv, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2s}, c.cluster) AS rn
        FROM sub s JOIN cb{it - 1} c USING (j)
      ) r WHERE rn = 1
    )
    , pp{it} AS (
      SELECT j, cluster, t.i AS i, sum(sv[t.i]) / count(*) AS mu
      FROM pa{it} CROSS JOIN range(1, {sd} + 1) AS t(i)
      GROUP BY j, cluster, t.i
    )
    , cb{it} AS (
      SELECT j, cluster, list(mu ORDER BY i) AS cv
      FROM pp{it} GROUP BY j, cluster
    )""")
    parts.append(f"""
    , codes AS (
      SELECT vec_id, j, cluster AS code FROM (
        SELECT s.vec_id, s.j, c.cluster,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                                  ORDER BY {d2s}, c.cluster) AS rn
        FROM sub s JOIN cb{pq_iters} c USING (j)
        WHERE s.vec_id >= {n_queries}
      ) r WHERE rn = 1
    )
    , lut AS (
      SELECT s.vec_id AS query_id, s.j, c.cluster, {d2s} AS d2
      FROM sub s JOIN cb{pq_iters} c USING (j)
      WHERE s.vec_id < {n_queries}
    )
    , adc AS (
      SELECT l.query_id, co.vec_id, sum(l.d2) AS approx_d2
      FROM codes co
      JOIN cells ce ON ce.vec_id = co.vec_id
      JOIN probes p ON p.cell = ce.cell
      JOIN lut l ON l.query_id = p.query_id
                AND l.j = co.j AND l.cluster = co.code
      GROUP BY l.query_id, co.vec_id
    )
    , rawtopk AS (
      SELECT query_id, vec_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY approx_d2, vec_id)
                  AS INT) AS rank
      FROM adc
    )
    , exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_aggregate([ (q.v[i] - e.v[i])
                          * (q.v[i] - e.v[i])
                          for i in range(1, {dim} + 1) ], 'sum'),
                          e.vec_id) AS rn
        FROM emb q CROSS JOIN emb e
        WHERE q.vec_id < {n_queries} AND e.vec_id >= {n_queries}
      ) r WHERE rn <= {k}
    )
    , rec_res AS (
      SELECT t.query_id,
             round(count(e.vec_id) * 1.0 / {k}, 6) AS recall_residual
      FROM rtopk t LEFT JOIN exact e
        ON e.query_id = t.query_id AND e.vec_id = t.vec_id
      WHERE t.rank <= {k}
      GROUP BY t.query_id
    )
    , rec_raw AS (
      SELECT t.query_id,
             round(count(e.vec_id) * 1.0 / {k}, 6) AS recall_raw
      FROM rawtopk t LEFT JOIN exact e
        ON e.query_id = t.query_id AND e.vec_id = t.vec_id
      WHERE t.rank <= {k}
      GROUP BY t.query_id
    )
    SELECT t.query_id, t.vec_id AS neighbor_id, t.rank,
           round(t.approx_d2, 6) AS approx_d2,
           rr.recall_residual,
           coalesce(rw.recall_raw, 0.0) AS recall_raw
    FROM rtopk t
    JOIN rec_res rr ON rr.query_id = t.query_id
    LEFT JOIN rec_raw rw ON rw.query_id = t.query_id
    WHERE t.rank <= {k}""")
    return "".join(parts)


QUERIES["similarity_ivf_pq_residual"] = _bind(
    similarity.ivf_pq_residual_topk, "embeddings")
ORACLE["similarity_ivf_pq_residual"] = _ivf_pq_residual_sql(
    with_recall=True)


def _clustered_emb_sql(n_vecs: int = 120, dim: int = 64,
                       n_centers: int = 8, scale: float = 4.0,
                       noise: float = 0.1) -> str:
    """DuckDB regeneration of `similarity.clustered_embeddings` — the
    identical md5-uniform expression per coordinate, so the fixture is
    bit-equal across engines (same 60-bit-integer-to-double idiom as the
    sampling oracles)."""
    u_c = ("CAST(('0x' || substr(md5('c:' || (t.vec_id % "
           f"{n_centers}) || ':' || j), 1, 15))::BIGINT AS DOUBLE)"
           " / 1152921504606846976.0")
    u_n = ("CAST(('0x' || substr(md5('n:' || t.vec_id || ':' || j), 1, 15))"
           "::BIGINT AS DOUBLE) / 1152921504606846976.0")
    return f"""emb AS (
      SELECT vec_id,
             [ CAST({scale} AS DOUBLE) * ({u_c})
               + CAST({noise} AS DOUBLE) * (({u_n}) - CAST(0.5 AS DOUBLE))
               for j in range(0, {dim}) ] AS v
      FROM range(0, {n_vecs}) AS t(vec_id)
    )"""


def _ivf_pq_clustered(spark, sf_dir):
    """`ivf_pq_residual_topk` over the deterministic clustered fixture
    (mixture of 8 well-separated md5-derived centers) at a finer code
    budget (m=8 subspaces, 2 PQ iterations): the configuration where
    residual (IVFADC) encoding measurably out-recalls raw encoding —
    the Jégou §IV-A gain the op was built to demonstrate, vacuous on
    the uniform `embeddings.parquet` (both ≈ noise there). The recall
    gap is pinned in tests/test_datapipe.py."""
    emb = similarity.clustered_embeddings(spark)
    return similarity.ivf_pq_residual_topk(emb, m=8, pq_iters=2)


QUERIES["similarity_ivf_pq_clustered"] = _ivf_pq_clustered
ORACLE["similarity_ivf_pq_clustered"] = _ivf_pq_residual_sql(
    with_recall=True, m=8, pq_iters=2, emb_sql=_clustered_emb_sql())


def _queries_of(emb, n_queries: int = 10):
    return (emb.select("vec_id",
                       F.col("embedding").cast("array<double>").alias("qv"))
            .filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("query_id"), "qv"))


def _ivf_pq_persisted(spark, sf_dir):
    """The persisted-index lifecycle: TRAIN+ENCODE (residual/IVFADC
    form) to manifest-versioned parquet index tables, then QUERY purely
    from them. Oracle = the residual chain — bit-equality between the
    persisted path and the in-plan residual scoring is the correctness
    contract."""
    emb = ensure_views(spark, sf_dir)["embeddings"]
    d = similarity._index_scratch()
    similarity.ivf_pq_build_index(emb, d)
    return similarity.ivf_pq_query_index(spark, d, _queries_of(emb))


QUERIES["similarity_ivf_pq_persisted"] = _ivf_pq_persisted
ORACLE["similarity_ivf_pq_persisted"] = _ivf_pq_residual_sql()


def _ivf_pq_add_batch(spark, sf_dir):
    """Incremental ingestion: build the index from the EVEN half of the
    corpus (training sees queries + that half), add the odd half against
    the frozen coarse/codebooks (an atomic manifest bump), query the
    combined index. The oracle trains on the same subset and encodes
    everything — residual encoding is deterministic given the frozen
    artifacts, so when it happened (build vs add) cannot matter."""
    emb = ensure_views(spark, sf_dir)["embeddings"]
    d = similarity._index_scratch()
    initial = emb.filter((F.col("vec_id") < 10)
                         | (F.col("vec_id") % 2 == 0))
    similarity.ivf_pq_build_index(initial, d)
    added = emb.filter((F.col("vec_id") >= 10)
                       & (F.col("vec_id") % 2 == 1))
    similarity.ivf_pq_add_batch(spark, d, added)
    return similarity.ivf_pq_query_index(spark, d, _queries_of(emb))


QUERIES["similarity_ivf_pq_add_batch"] = _ivf_pq_add_batch
ORACLE["similarity_ivf_pq_add_batch"] = _ivf_pq_residual_sql(
    train_pred="vec_id < 10 OR vec_id % 2 = 0")


def _ivf_pq_delete(spark, sf_dir):
    """Vector-index DELETE (r13 — the lifecycle asymmetry the r12
    verdict flagged): build the persisted index, tombstone the
    vec_id % 4 == 0 quarter of the corpus (an O(|keys|) sequenced
    manifest bump — no code file rewritten, the takedown/opt-out
    path), query at HEAD. Deleted vectors are anti-joined out of the
    codes scan; training artifacts are frozen, so the oracle encodes
    everything and drops the deleted quarter at scoring time only."""
    emb = ensure_views(spark, sf_dir)["embeddings"]
    d = similarity._index_scratch()
    similarity.ivf_pq_build_index(emb, d)
    similarity.ivf_pq_delete(
        spark, d,
        emb.filter((F.col("vec_id") >= 10)
                   & (F.col("vec_id") % 4 == 0)).select("vec_id"))
    return similarity.ivf_pq_query_index(spark, d, _queries_of(emb))


QUERIES["similarity_ivf_pq_delete"] = _ivf_pq_delete
ORACLE["similarity_ivf_pq_delete"] = _ivf_pq_residual_sql(
    visible_pred="co.vec_id % 4 <> 0")


def _ivf_pq_delete_reinsert(spark, sf_dir):
    """Vector-index DELETE-THEN-RE-ADMIT (the `dedup_lsh_index_reinsert`
    flow on the IVF-PQ index — the r12 verdict's ask #2): build →
    tombstone the vec_id % 4 == 0 quarter → `ivf_pq_add_batch`
    re-admits the vec_id % 8 == 0 half of the deleted vectors (encoded
    against the FROZEN coarse/codebooks — deterministic, so the re-add
    reproduces the original codes) → query at HEAD. SEQUENCED
    tombstones make the re-added vectors retrievable — their re-add
    dir outsequences the tombstone — so the visible corpus is
    vec_id % 4 != 0 OR vec_id % 8 == 0, exactly what the oracle
    scores. Under unsequenced semantics the re-admitted half would
    stay invisible (silently lost takedown reversals)."""
    emb = ensure_views(spark, sf_dir)["embeddings"]
    d = similarity._index_scratch()
    similarity.ivf_pq_build_index(emb, d)
    deleted = emb.filter((F.col("vec_id") >= 10)
                         & (F.col("vec_id") % 4 == 0))
    similarity.ivf_pq_delete(spark, d, deleted.select("vec_id"))
    similarity.ivf_pq_add_batch(
        spark, d, deleted.filter(F.col("vec_id") % 8 == 0))
    return similarity.ivf_pq_query_index(spark, d, _queries_of(emb))


QUERIES["similarity_ivf_pq_delete_reinsert"] = _ivf_pq_delete_reinsert
ORACLE["similarity_ivf_pq_delete_reinsert"] = _ivf_pq_residual_sql(
    visible_pred="(co.vec_id % 4 <> 0 OR co.vec_id % 8 = 0)")


QUERIES["agg_countmin_portable"] = _bind(corpus_stats.countmin_token_freq,
                                         "documents")
# portable Count-Min sketch (Cormode & Muthukrishnan 2005): salted
# md5-slice rows, so the cells AND the min-estimates reproduce in DuckDB
# bit-for-bit; the one-sided overcount is measured against exact counts
ORACLE["agg_countmin_portable"] = """
    WITH tf AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
      ) GROUP BY t
    ),
    hashed AS (
      SELECT t, n, r,
             ('0x' || substr(md5('cm' || r || ':' || t), 1, 8))::BIGINT
               % 512 AS bucket
      FROM tf, range(0, 4) tr(r)
    ),
    cells AS (
      SELECT r, bucket, CAST(sum(n) AS BIGINT) AS cell_n
      FROM hashed GROUP BY r, bucket
    ),
    probes AS (
      SELECT t, n AS n_exact FROM tf ORDER BY n DESC, t LIMIT 15
    ),
    est AS (
      SELECT h.t, min(c.cell_n) AS cm_estimate
      FROM hashed h
      JOIN probes p USING (t)
      JOIN cells c ON c.r = h.r AND c.bucket = h.bucket
      GROUP BY h.t
    )
    SELECT CAST(row_number() OVER (ORDER BY n_exact DESC, t) AS INT)
             AS rank,
           t AS token, n_exact, cm_estimate,
           cm_estimate - n_exact AS overcount
    FROM probes JOIN est USING (t)
"""

QUERIES["sketch_kmv_overlap"] = _bind(corpus_stats.kmv_corpus_overlap,
                                      "documents")
# portable bottom-k (KMV) distinct sketch with set operations
# (Bar-Yossef et al. 2002 / Beyer et al. 2007): the k smallest
# md5-derived hashes per corpus; union-mergeable, so |A∪B|, Jaccard and
# |A∩B| come from two k-row summaries — every hash, threshold and
# estimator arithmetic reproduced bit-for-bit (k=128, M=16^12;
# 127.0 * 281474976710656 mirrors the engine's (k-1)*M literal order)
ORACLE["sketch_kmv_overlap"] = """
    WITH el AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
               AS h
      FROM documents
    ),
    a AS (SELECT DISTINCT h FROM el WHERE doc_id % 2 = 0),
    b AS (SELECT DISTINCT h FROM el WHERE doc_id % 3 = 0),
    u AS (SELECT h FROM a UNION SELECT h FROM b),
    ka AS (SELECT h FROM a ORDER BY h LIMIT 128),
    kb AS (SELECT h FROM b ORDER BY h LIMIT 128),
    ku AS (SELECT h FROM u ORDER BY h LIMIT 128),
    ska AS (SELECT count(*) AS n_sk, max(h) AS hk FROM ka),
    skb AS (SELECT count(*) AS n_sk, max(h) AS hk FROM kb),
    sku AS (SELECT count(*) AS n_sk, max(h) AS hk FROM ku),
    exa AS (SELECT count(*) AS n_exact FROM a),
    exb AS (SELECT count(*) AS n_exact FROM b),
    exu AS (SELECT count(*) AS n_exact FROM u),
    exi AS (SELECT count(*) AS n_exact FROM a
            WHERE h IN (SELECT h FROM b)),
    m AS (SELECT count(*) AS m FROM ku
          WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b))
    SELECT 'distinct_a' AS measure, CAST(exa.n_exact AS BIGINT) AS n_exact,
           round(CASE WHEN ska.n_sk < 128 THEN CAST(ska.n_sk AS DOUBLE)
                 ELSE 127.0 * 281474976710656 / ska.hk END, 4) AS estimate,
           round(abs((CASE WHEN ska.n_sk < 128 THEN CAST(ska.n_sk AS DOUBLE)
                      ELSE 127.0 * 281474976710656 / ska.hk END)
                     - exa.n_exact) / exa.n_exact, 6) AS rel_err
    FROM exa, ska
    UNION ALL
    SELECT 'distinct_b', CAST(exb.n_exact AS BIGINT),
           round(CASE WHEN skb.n_sk < 128 THEN CAST(skb.n_sk AS DOUBLE)
                 ELSE 127.0 * 281474976710656 / skb.hk END, 4),
           round(abs((CASE WHEN skb.n_sk < 128 THEN CAST(skb.n_sk AS DOUBLE)
                      ELSE 127.0 * 281474976710656 / skb.hk END)
                     - exb.n_exact) / exb.n_exact, 6)
    FROM exb, skb
    UNION ALL
    SELECT 'union', CAST(exu.n_exact AS BIGINT),
           round(CASE WHEN sku.n_sk < 128 THEN CAST(sku.n_sk AS DOUBLE)
                 ELSE 127.0 * 281474976710656 / sku.hk END, 4),
           round(abs((CASE WHEN sku.n_sk < 128 THEN CAST(sku.n_sk AS DOUBLE)
                      ELSE 127.0 * 281474976710656 / sku.hk END)
                     - exu.n_exact) / exu.n_exact, 6)
    FROM exu, sku
    UNION ALL
    SELECT 'intersection', CAST(exi.n_exact AS BIGINT),
           round(m.m / CAST(sku.n_sk AS DOUBLE)
                 * (CASE WHEN sku.n_sk < 128 THEN CAST(sku.n_sk AS DOUBLE)
                    ELSE 127.0 * 281474976710656 / sku.hk END), 4),
           round(abs(m.m / CAST(sku.n_sk AS DOUBLE)
                     * (CASE WHEN sku.n_sk < 128
                        THEN CAST(sku.n_sk AS DOUBLE)
                        ELSE 127.0 * 281474976710656 / sku.hk END)
                     - exi.n_exact) / exi.n_exact, 6)
    FROM exi, m, sku
"""

QUERIES["similarity_mips_topk"] = _bind(similarity.mips_topk,
                                        "embeddings")
# MIPS via the order-preserving cosine reduction (Bachrach et al. 2014 /
# Shrivastava & Li 2014): the ENGINE ranks by cosine against the
# Phi-augmented vectors; the ORACLE ranks by the raw inner product — the
# hash match is the order-equivalence demonstration
ORACLE["similarity_mips_topk"] = """
    SELECT query_id, neighbor_id, inner_product, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])), 6)
               AS inner_product,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                         CAST(c.embedding AS DOUBLE[]))
                        DESC, c.vec_id
             ) AS INT) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id >= 10
      WHERE q.vec_id < 10
    ) t WHERE rank <= 3
"""

QUERIES["similarity_hard_negatives"] = _bind(
    similarity.hard_negative_mining, "embeddings")
# contrastive hard-negative mining (FaceNet triplet selection): per
# anchor the top-k most-similar DIFFERENT-label corpus vectors, with the
# semi-hard flag (cosine below the anchor's best positive similarity)
ORACLE["similarity_hard_negatives"] = """
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      FROM embeddings
    ),
    a AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
          FROM emb WHERE vec_id < 20),
    corpus AS (SELECT * FROM emb WHERE vec_id >= 20),
    scored AS (
      SELECT a.query_id, a.qlabel, c.vec_id AS neighbor_id, c.label,
             list_dot_product(a.qv, c.v)
             / (sqrt(list_dot_product(a.qv, a.qv))
                * sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM corpus c CROSS JOIN a
    ),
    best_pos AS (
      SELECT query_id, max(cos) AS best_pos_cos
      FROM scored WHERE label = qlabel GROUP BY query_id
    ),
    negs AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id
             ) AS INT) AS rank
      FROM scored WHERE label <> qlabel
    )
    SELECT n.query_id, n.neighbor_id, round(n.cos, 6) AS cosine, n.rank,
           n.cos < b.best_pos_cos AS semi_hard
    FROM negs n LEFT JOIN best_pos b ON n.query_id = b.query_id
    WHERE n.rank <= 3
"""

QUERIES["similarity_mips_ivf"] = _bind(similarity.mips_ivf_topk,
                                       "embeddings")
# approximate MIPS: the augmentation reduction composed with the
# sampled-centroid IVF — assignment/probing by AUGMENTED cosine
# (aug(x) = x ++ sqrt(phi2 - |x|^2), aug(q) = q ++ 0), in-cell rerank by
# the RAW inner product; same assignment tie-break as similarity_ivf_topk
ORACLE["similarity_mips_ivf"] = """
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
    corpus AS (SELECT * FROM emb WHERE vec_id >= 10),
    phi AS (SELECT max(list_dot_product(v, v)) AS phi2 FROM corpus),
    corpus_a AS (
      SELECT vec_id, v,
             list_concat(v, [sqrt(greatest(
               phi2 - list_dot_product(v, v), 0.0))]) AS va
      FROM corpus, phi
    ),
    cents AS (
      SELECT vec_id AS cell, v AS cv,
             list_concat(v, [sqrt(greatest(
               phi2 - list_dot_product(v, v), 0.0))]) AS cva
      FROM corpus, phi WHERE vec_id % 37 = 0
    ),
    qa AS (SELECT query_id, qv, list_concat(qv, [0.0]) AS qva FROM q),
    assigned AS (
      SELECT vec_id, cell, v FROM (
        SELECT c.vec_id, c.v, ct.cell,
               list_dot_product(c.va, ct.cva)
               / (sqrt(list_dot_product(c.va, c.va))
                  * sqrt(list_dot_product(ct.cva, ct.cva))) AS s
        FROM corpus_a c CROSS JOIN cents ct
      ) t
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY s DESC, cell DESC) = 1
    ),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT qa.query_id, qa.qv, ct.cell,
               list_dot_product(qa.qva, ct.cva)
               / (sqrt(list_dot_product(qa.qva, qa.qva))
                  * sqrt(list_dot_product(ct.cva, ct.cva))) AS s
        FROM qa CROSS JOIN cents ct
      ) t
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY s DESC, cell) <= 4
    )
    SELECT query_id, neighbor_id, inner_product, rank FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(p.qv, a.v), 6) AS inner_product,
             CAST(row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY list_dot_product(p.qv, a.v) DESC, a.vec_id
             ) AS INT) AS rank
      FROM assigned a JOIN probes p ON a.cell = p.cell
    ) t WHERE rank <= 3
"""

QUERIES["retrieval_bm25_topk"] = _bind(curation.bm25_topk, "documents")
# BM25 (Robertson & Zaragoza 2009, Lucene's +1-smoothed idf): per-term
# scores floored to integer micro-units BEFORE the per-document sum, so
# the ranking is exact integer arithmetic in both engines
ORACLE["retrieval_bm25_topk"] = """
    WITH terms AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM terms GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
           FROM tf GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    df_tbl AS (SELECT term, CAST(count(*) AS BIGINT) AS df
               FROM tf GROUP BY term),
    qterms AS (
      SELECT term, df FROM (
        SELECT term, df,
               row_number() OVER (ORDER BY df DESC, term) AS _r
        FROM df_tbl
      ) WHERE _r BETWEEN 5 AND 7
    ),
    micro AS (
      SELECT t.doc_id,
             CAST(floor(
               ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (CAST(t.tf AS DOUBLE) * 2.2)
               / (CAST(t.tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75
                           + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl))
               * 1e6) AS BIGINT) AS _micro
      FROM tf t
      JOIN qterms q USING (term)
      JOIN dl d USING (doc_id)
      CROSS JOIN stats s
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_query_hits,
             CAST(sum(_micro) AS BIGINT) AS score_micro
      FROM micro GROUP BY doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
                AS INT) AS rank,
           doc_id, n_query_hits, score_micro,
           round(score_micro / 1e6, 6) AS bm25
    FROM per_doc ORDER BY score_micro DESC, doc_id LIMIT 10
"""


def _wordpiece_train_oracle_sql(mode: str = "train",
                                n_merges: int = 6) -> str:
    """DuckDB mirror of the WordPiece merge loop
    (`corpus_stats.wordpiece_train_merges`): the BPE chain with a
    likelihood argmax — per level, symbol counts s{k} join the pair
    table and the winner maximizes floor(1e12 * n_pair / (n_lhs*n_rhs))
    (integer election, lexicographic tie-break), then the same
    list_reduce fold re-segments the vocab. ``mode``: 'train' emits the
    merge table, 'apply' the greedy longest-match per-document counts
    (the tokenize_bpe_trained walk over the learned pieces)."""
    levels = "".join(f""",
    s{k} AS MATERIALIZED (
      SELECT sym, CAST(sum(n) AS BIGINT) AS ns
      FROM (SELECT n, unnest(syms) AS sym FROM v{k - 1})
      GROUP BY sym
    ),
    p{k} AS (
      SELECT pr[1] AS lhs, pr[2] AS rhs,
             CAST(sum(n) AS BIGINT) AS n_occurrences
      FROM (SELECT n, unnest(list_zip(syms[1:len(syms)-1], syms[2:]))
                     AS pr FROM v{k - 1})
      GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (
      SELECT p.lhs, p.rhs, p.n_occurrences,
             CAST(floor(CAST(p.n_occurrences AS DOUBLE) * 1e12
                  / (CAST(sl.ns AS DOUBLE) * CAST(sr.ns AS DOUBLE)))
               AS BIGINT) AS score_micro
      FROM p{k} p
      JOIN s{k} sl ON sl.sym = p.lhs
      JOIN s{k} sr ON sr.sym = p.rhs
      ORDER BY score_micro DESC, p.lhs, p.rhs LIMIT 1
    ),
    v{k} AS MATERIALIZED (
      SELECT w, string_split(list_reduce(syms,
               (acc, s) -> CASE WHEN string_split(acc, chr(31))[-1] = b.lhs
                                 AND s = b.rhs
                           THEN acc || s ELSE acc || chr(31) || s END),
             chr(31)) AS syms, n
      FROM v{k - 1}, b{k} b
    )""" for k in range(1, n_merges + 1))
    head = f"""
    WITH {"RECURSIVE " if mode == "apply" else ""}twords AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    v0 AS (
      SELECT w, regexp_split_to_array(w, '') AS syms,
             CAST(count(*) AS BIGINT) AS n
      FROM twords WHERE length(w) >= 2 AND NOT contains(w, chr(31))
      GROUP BY w
    ){levels}"""
    if mode == "train":
        union = " UNION ALL ".join(
            f"SELECT {k} AS step, lhs, rhs, lhs || rhs AS merged, "
            f"n_occurrences, score_micro FROM b{k}"
            for k in range(1, n_merges + 1))
        return head + "\n    " + union
    vocab = " UNION ".join(
        f"SELECT lhs || rhs AS piece FROM b{k}"
        for k in range(1, n_merges + 1))
    return head + f""",
    vocab AS (
      {vocab}
    ),
    grange AS (
      SELECT unnest(range(2, (SELECT max(len(piece)) FROM vocab) + 1))
             AS g
    ),
    words AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    wc AS (SELECT w, count(*) AS n FROM words GROUP BY w),
    pos AS (
      SELECT w, unnest(range(1, len(w) + 1)) AS p FROM wc
      WHERE len(w) >= 1
    ),
    cand AS (
      SELECT w, p, max(g) AS gmax FROM (
        SELECT w, p, g, substr(w, p, CAST(g AS INT)) AS piece
        FROM pos, grange WHERE p + g - 1 <= len(w)
      ) c WHERE piece IN (SELECT piece FROM vocab)
      GROUP BY w, p
    ),
    walk AS (
      SELECT w, len(w) AS l, 1 AS pos, 0 AS cnt FROM wc WHERE len(w) >= 1
      UNION ALL
      SELECT walk.w, walk.l, walk.pos + coalesce(c.gmax, 1), walk.cnt + 1
      FROM walk LEFT JOIN cand c ON c.w = walk.w AND c.p = walk.pos
      WHERE walk.pos <= walk.l
    ),
    pieces AS (SELECT w, max(cnt) AS n_pieces FROM walk GROUP BY w)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ws_tokens,
           CAST(sum(coalesce(p.n_pieces, 0)) AS BIGINT)
             AS n_subword_tokens,
           round(sum(coalesce(p.n_pieces, 0)) * 1.0 / count(*), 6)
             AS pieces_per_word
    FROM words LEFT JOIN pieces p USING (w)
    GROUP BY doc_id"""


QUERIES["tokenize_wordpiece_train"] = _bind(
    corpus_stats.wordpiece_train_merges, "documents")
ORACLE["tokenize_wordpiece_train"] = _wordpiece_train_oracle_sql("train")


def _wordpiece_trained_apply(documents):
    merges = corpus_stats.wordpiece_train_merges(documents)
    return corpus_stats.bpe_apply_tokenize(
        documents, pieces=merges.select(F.col("merged").alias("piece"))
    ).withColumnRenamed("n_bpe_tokens", "n_subword_tokens")


QUERIES["tokenize_wordpiece_trained"] = _bind(_wordpiece_trained_apply,
                                              "documents")
# the learned WordPiece vocab fed through the greedy longest-match
# application (the standard WordPiece inference mode)
ORACLE["tokenize_wordpiece_trained"] = _wordpiece_train_oracle_sql("apply")


def _tokenizer_compare(documents):
    """Tokenizer SELECTION table — the eval a pipeline runs before
    committing a tokenizer: corpus-level compression (words, pieces,
    pieces-per-word) for the three trained tokenizer families side by
    side under their standard configs (frequency-vocab BPE-style
    longest-match, the trained WordPiece vocab, the unigram-LM Viterbi).
    Lower pieces_per_word = better compression at this vocab budget;
    the per-family numbers are exactly the sibling apply keys' sums, so
    this table is the decision artifact, not new math."""
    rolls = []
    for name, df, pieces_col in (
        ("bpe_freq_vocab", corpus_stats.bpe_apply_tokenize(documents),
         "n_bpe_tokens"),
        ("wordpiece", _wordpiece_trained_apply(documents),
         "n_subword_tokens"),
        ("unigram_lm", corpus_stats.unigram_apply(documents),
         "n_unigram_tokens"),
    ):
        rolls.append(df.agg(
            F.lit(name).alias("tokenizer"),
            F.sum("n_ws_tokens").cast("bigint").alias("n_words"),
            F.sum(pieces_col).cast("bigint").alias("n_pieces"),
            F.round(F.sum(pieces_col) * 1.0 / F.sum("n_ws_tokens"), 6)
            .alias("pieces_per_word"),
        ).select("tokenizer", "n_words", "n_pieces", "pieces_per_word"))
    out = rolls[0]
    for r in rolls[1:]:
        out = out.unionByName(r)
    return out


def _tokenizer_compare_sql() -> str:
    def roll(name: str, inner: str, pieces_col: str) -> str:
        return f"""
    SELECT '{name}' AS tokenizer,
           CAST(sum(n_ws_tokens) AS BIGINT) AS n_words,
           CAST(sum({pieces_col}) AS BIGINT) AS n_pieces,
           round(sum({pieces_col}) * 1.0 / sum(n_ws_tokens), 6)
             AS pieces_per_word
    FROM ({inner})"""

    return " UNION ALL ".join([
        roll("bpe_freq_vocab", ORACLE["tokenize_bpe_apply"],
             "n_bpe_tokens"),
        roll("wordpiece", ORACLE["tokenize_wordpiece_trained"],
             "n_subword_tokens"),
        roll("unigram_lm", ORACLE["tokenize_unigram_apply"],
             "n_unigram_tokens"),
    ])


QUERIES["tokenize_compare_eval"] = _bind(_tokenizer_compare, "documents")
ORACLE["tokenize_compare_eval"] = _tokenizer_compare_sql()


QUERIES["similarity_ivf_pq_rerank"] = _bind(
    similarity.ivf_pq_rerank_topk, "embeddings")
# IVFADC+R (Jégou et al. 2011 §V): exact re-scoring of the ADC
# shortlist only — recall measured for both the re-ranked and ADC-only
# top-k against the exact baseline
ORACLE["similarity_ivf_pq_rerank"] = _ivf_pq_residual_sql(
    rerank_shortlist=10)


QUERIES["corpus_zipf_fit"] = _bind(corpus_stats.zipf_fit, "documents")
# Zipf rank-frequency OLS: per-rank moment terms floored to integer
# nano-units before summation, so the regression is float-order-immune
# and reproduces bit-for-bit
ORACLE["corpus_zipf_fit"] = """
    WITH tf AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
      ) GROUP BY t
    ),
    top AS (SELECT t, n FROM tf ORDER BY n DESC, t LIMIT 100),
    ranked AS (
      SELECT n, CAST(row_number() OVER (ORDER BY n DESC, t) AS DOUBLE)
               AS rank
      FROM top
    ),
    terms AS (
      SELECT CAST(floor(ln(rank) * 1e9) AS BIGINT) AS sx,
             CAST(floor(ln(CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS sy,
             CAST(floor(ln(rank) * ln(rank) * 1e9) AS BIGINT) AS sxx,
             CAST(floor(ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE))
                        * 1e9) AS BIGINT) AS syy,
             CAST(floor(ln(rank) * ln(CAST(n AS DOUBLE)) * 1e9) AS BIGINT)
               AS sxy
      FROM ranked
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS r_n,
             sum(sx) / 1e9 AS ex, sum(sy) / 1e9 AS ey,
             sum(sxx) / 1e9 AS exx, sum(syy) / 1e9 AS eyy,
             sum(sxy) / 1e9 AS exy
      FROM terms
    )
    SELECT CAST(r_n AS INT) AS n_ranks,
           round((CAST(r_n AS DOUBLE) * exy - ex * ey)
                 / (CAST(r_n AS DOUBLE) * exx - ex * ex), 6)
             AS zipf_slope,
           round(ey / CAST(r_n AS DOUBLE)
                 - ((CAST(r_n AS DOUBLE) * exy - ex * ey)
                    / (CAST(r_n AS DOUBLE) * exx - ex * ex))
                   * ex / CAST(r_n AS DOUBLE), 6) AS intercept,
           round((CAST(r_n AS DOUBLE) * exy - ex * ey)
                 * (CAST(r_n AS DOUBLE) * exy - ex * ey)
                 / ((CAST(r_n AS DOUBLE) * exx - ex * ex)
                    * (CAST(r_n AS DOUBLE) * eyy - ey * ey)), 6) AS r2
    FROM sums
"""


def _containment_full(documents):
    # max_doc_id >= the synthetic-dup modulus → no subset cap: the whole
    # corpus goes through the df-capped inverted index (the 100 TB shape;
    # completes the family invariant — every pairwise op has a bounded
    # oracle baseline AND a full-corpus path)
    return dedup.containment_pairs(documents, max_doc_id=100000)


QUERIES["dedup_containment"] = _bind(dedup.containment_pairs, "documents")
QUERIES["dedup_containment_full"] = _bind(_containment_full, "documents")
# directed shingle containment (Broder 1997): candidates from the
# df-capped inverted index, EXACT c(A->B) = |A∩B|/|A| verified on the
# full shingle arrays — the asymmetric quote/subset detector Jaccard
# structurally misses
ORACLE["dedup_containment"] = _CORPUS + """
    , subset AS (SELECT * FROM corpus WHERE doc_id % 100000 < 200)
    , shingled AS (
      SELECT doc_id, list_distinct([
               array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)
             ]) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM subset) t
    ),
    sh AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    df_tbl AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50
    ),
    rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN df_tbl USING (shingle)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    )
    SELECT c.doc_a AS contained_id, c.doc_b AS container_id,
           round(len(list_intersect(ta.sh, tb.sh)) * 1.0 / len(ta.sh), 6)
             AS containment,
           CAST(len(ta.sh) AS INT) AS n_sh_contained,
           CAST(len(tb.sh) AS INT) AS n_sh_container
    FROM cand c
    JOIN shingled ta ON ta.doc_id = c.doc_a
    JOIN shingled tb ON tb.doc_id = c.doc_b
    WHERE len(list_intersect(ta.sh, tb.sh)) * 1.0 / len(ta.sh) >= 0.8
"""

# full-corpus twin: identical df-capped inverted-index algorithm with the
# subset cap removed (the oracle mirrors the SAME bounded-fan-out candidate
# generation — never brute force — so it scales with the corpus too)
ORACLE["dedup_containment_full"] = _CORPUS + """
    , shingled AS (
      SELECT doc_id, list_distinct([
               array_to_string(l[i:i+2], ' ')
               for i in range(1, greatest(len(l) - 2, 1) + 1)
             ]) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
            FROM corpus) t
    ),
    sh AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    df_tbl AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50
    ),
    rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN df_tbl USING (shingle)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    )
    SELECT c.doc_a AS contained_id, c.doc_b AS container_id,
           round(len(list_intersect(ta.sh, tb.sh)) * 1.0 / len(ta.sh), 6)
             AS containment,
           CAST(len(ta.sh) AS INT) AS n_sh_contained,
           CAST(len(tb.sh) AS INT) AS n_sh_container
    FROM cand c
    JOIN shingled ta ON ta.doc_id = c.doc_a
    JOIN shingled tb ON tb.doc_id = c.doc_b
    WHERE len(list_intersect(ta.sh, tb.sh)) * 1.0 / len(ta.sh) >= 0.8
"""


def _clf_eval_sql(steps: int = 3, lr: float = 0.5) -> str:
    """DuckDB oracle for `curation.quality_classifier_eval`: the
    `_clf_train_chain` CTE chain, then scoring with the 6dp-ROUNDED
    published weights, the tie-aware histogram AUC (every contribution
    an exact multiple of 0.5 — float-order-immune), and the 0.5
    confusion counts."""
    z = " + ".join(f"w.w{j} * f.x{j}" for j in range(6))
    chain = _clf_train_chain(steps, lr)
    wr = ", ".join(f"round(w{j}, 6) AS w{j}" for j in range(6))
    return chain + f"""
    , wr AS (SELECT {wr} FROM s{steps})
    , scored AS (
      SELECT round(1.0 / (1.0 + exp(-({z}))), 6) AS s, f.y
      FROM feats f, wr w
    )
    , hist AS (
      SELECT s, sum(y) AS np_s, sum(1.0 - y) AS nn_s
      FROM scored GROUP BY s
    )
    , contribs AS (
      SELECT np_s, nn_s,
             np_s * (coalesce(sum(nn_s) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0.0) + nn_s / 2.0) AS c
      FROM hist
    )
    , auc AS (
      SELECT sum(c) AS num, sum(np_s) AS n_pos, sum(nn_s) AS n_neg
      FROM contribs
    )
    , conf AS (
      SELECT sum(CASE WHEN s >= 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN s >= 0.5 AND y = 0.0 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN s < 0.5 AND y = 1.0 THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN s < 0.5 AND y = 0.0 THEN 1 ELSE 0 END) AS tn
      FROM scored
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           round(num / (n_pos * n_neg), 6) AS auc,
           round(tp / (tp + fp), 6) AS precision_at_half,
           round(tp / (tp + fn), 6) AS recall_at_half,
           round((tp + tn) / (tp + fp + fn + tn), 6) AS accuracy
    FROM auc, conf"""


QUERIES["quality_classifier_eval"] = _bind(
    curation.quality_classifier_eval, "documents")
ORACLE["quality_classifier_eval"] = _clf_eval_sql()
