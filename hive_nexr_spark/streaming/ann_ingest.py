"""Streaming ANN-index ingestion: arriving embedding micro-batches encode
against a FROZEN persisted IVF-PQ index and append to its codes table —
the stream-side half of the index lifecycle
(`datapipe/similarity.ivf_pq_build_index` / `ivf_pq_add_batch` /
`ivf_pq_query_index`). The reference has no streaming (SURVEY §2.11);
this is the production ingest shape for a vector store fed by a pipeline.

Scale: per micro-batch work is one broadcast-argmin cell routing + one
broadcast-codebook encoding over the BATCH (the add-batch contract);
the parquet append is the idempotent landing-table pattern shared with
`events.stream_cdc_upsert`. Codebooks never retrain on the stream —
drift is an explicit offline re-train, exactly like the batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe import similarity


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming file source over the embeddings table (the
    shared `io.read_table_stream` convention)."""
    from ..io import read_table_stream

    return read_table_stream(spark, sf_dir, "embeddings")


def stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the index from the even corpus half, stream the odd half in
    (foreachBatch → frozen-codebook encode + append), query the combined
    index. Equal BY CONSTRUCTION to the batch `similarity_ivf_pq_add_batch`
    lifecycle — encoding against frozen codebooks is deterministic, so
    when (and in how many batches) a vector arrives cannot matter; the
    shared oracle pins it."""
    from ..queries.base import ensure_views

    emb = ensure_views(spark, sf_dir)["embeddings"]
    d = similarity._index_scratch()
    initial = emb.filter((F.col("vec_id") < 10)
                         | (F.col("vec_id") % 2 == 0))
    similarity.ivf_pq_build_index(initial, d)

    arriving = read_embeddings_stream(spark, sf_dir).filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") % 2 == 1))

    def ingest(batch_df: DataFrame, _bid: int) -> None:
        similarity.ivf_pq_add_batch(spark, d, batch_df)

    q = arriving.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from ..queries.datapipe_q import _queries_of

    return similarity.ivf_pq_query_index(spark, d, _queries_of(emb))
