"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas functions via `mapInPandas`.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic byte-level features standing in for pixel features, and a
clearly-marked NotImplementedError path for real codecs). The Spark-side
plumbing — binary column construction, schema, batch iteration, partition
behavior — is real and oracle-checked, which is the part that matters for
the engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, first_byte int, head_sum int, modality string"
)


def to_binary_payloads(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct). At scale the
    payload column is the raw image/audio bytes read from the lake; here it
    is the UTF-8 text bytes (a deterministic stand-in)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real codec hook. Kept as an explicit stub: the execution plumbing is
    what this module exercises; swap in PIL/libsndfile when available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs not available in this environment") from exc
    raise NotImplementedError("wire PIL decode here")


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level 'features' — the stub decode path. Arrow
    batches in, Arrow batches out; no per-row Python calls into the JVM."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1
                                           ).astype("int32"),
                "head_sum": payloads.map(lambda b: int(sum(b[:16]) % 256)
                                         ).astype("int32"),
                "modality": pdf["mime"],
            }
        )


def featurize(documents: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column."""
    payloads = to_binary_payloads(documents).select(
        "doc_id", "payload", F.col("meta.mime").alias("mime"))
    return payloads.mapInPandas(_featurize_batches, schema=FEATURE_SCHEMA)
