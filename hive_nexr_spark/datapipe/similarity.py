"""Similarity search over an embedding column (`array<float>`).

Baseline: brute-force cosine top-k — broadcast the (small) query set, scan
the corpus once, rank per query. The dot product stays JVM-side via
`zip_with` + `aggregate` (whole-stage codegen — no Python in the hot loop).

Scale path: sign-LSH bucketing (random-hyperplane) — corpus and queries are
hashed to sign-pattern buckets; the exact rerank join touches only same-
bucket candidates. At 100 TB: bucket histogram is skew-checked; hyperplanes
are a broadcast literal; everything shuffles by bucket key only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def brute_force_topk(embeddings: DataFrame, k: int = 3, n_queries: int = 10) -> DataFrame:
    """Exact cosine top-k: query set broadcast against a single corpus scan."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    corpus = emb.filter(F.col("vec_id") >= n_queries)
    scored = corpus.join(F.broadcast(queries)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
         ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_topk(embeddings: DataFrame, n_planes: int = 4, n_queries: int = 10,
             k: int = 1) -> DataFrame:
    """Approximate NN via sign-LSH: bucket = sign bits of dot products with
    `n_planes` fixed hyperplanes (here: the last `n_planes` corpus vectors,
    a deterministic choice any engine can reproduce); exact cosine rerank
    within bucket."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    planes = [
        r["v"]
        for r in emb.filter(F.col("vec_id") > max_id - n_planes)
        .orderBy("vec_id")
        .collect()
    ]

    def bucket(vcol: Column) -> Column:
        bits = [
            F.when(_dot(vcol, F.array(*[F.lit(float(x)) for x in p])) >= 0, "1"
                   ).otherwise("0")
            for p in planes
        ]
        return F.concat(*bits)

    body = emb.filter(F.col("vec_id") <= max_id - n_planes)
    corpus = body.filter(F.col("vec_id") >= n_queries).withColumn("bkt", bucket(F.col("v")))
    queries = (
        body.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .withColumn("bkt", bucket(F.col("qv")))
    )
    scored = corpus.join(F.broadcast(queries), "bkt").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
         ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_cosine_dups(embeddings: DataFrame, threshold: float = 0.99,
                          max_id: int = 200) -> DataFrame:
    """Embedding-cosine near-dup pairs over a bounded subset (the dedup
    flavor of similarity search)."""
    emb = embeddings.filter(F.col("vec_id") < max_id).select(
        "vec_id", _as_double("embedding").alias("v"))
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (_dot(F.col("a.v"), F.col("b.v"))
             / (_norm(F.col("a.v")) * _norm(F.col("b.v")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
