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


def featurize(documents: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    The batch function is a CLOSURE (like its resize/frame siblings), not
    a module-level function: cloudpickle serializes closures by value, so
    executors never need to import this package — a module-level function
    pickles by reference and dies with ModuleNotFoundError when the
    Python workers start outside the repo root (driver replays)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # deterministic byte-level 'features' — the stub decode path;
        # Arrow batches in/out, no per-row Python calls into the JVM
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1).astype("int32"),
                    "head_sum": payloads.map(
                        lambda b: int(sum(b[:16]) % 256)).astype("int32"),
                    "modality": pdf["mime"],
                }
            )

    payloads = to_binary_payloads(documents).select(
        "doc_id", "payload", F.col("meta.mime").alias("mime"))
    return payloads.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, orig_len int, out_len int, out_sum int"


def resize_payloads(documents: DataFrame, target_len: int = 32) -> DataFrame:
    """'Resize' each payload to `target_len` samples by nearest-neighbor
    downsampling over the byte axis — the exact plumbing an image-resize UDF
    uses (decode → index-remap → re-encode), with the codec stubbed to the
    1-D byte signal. Sampled positions are floor(i·len/target), i<target
    (min(len, target) samples for short payloads). Arrow-batched
    mapInPandas, one output row per input row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]

            def sampled(b: bytes) -> tuple[int, int]:
                n = len(b)
                k = min(n, target_len)
                picks = [b[(i * n) // target_len] for i in range(k)]
                return k, int(sum(picks)) % 2**31

            out = payloads.map(sampled)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_len": payloads.map(len).astype("int32"),
                    "out_len": out.map(lambda t: t[0]).astype("int32"),
                    "out_sum": out.map(lambda t: t[1]).astype("int32"),
                }
            )

    payloads = to_binary_payloads(documents).select("doc_id", "payload")
    return payloads.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_len int, frame_sum int"


def sample_frames(documents: DataFrame, frame_size: int = 64,
                  stride: int = 4) -> DataFrame:
    """Frame sampling: split each payload into fixed-`frame_size` chunks and
    keep every `stride`-th frame — the video-frame-sampling plumbing (emit
    N output rows per input row through mapInPandas, the UDTF shape). The
    per-frame 'feature' is the stubbed codec's byte sum."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doc_ids, idxs, lens, sums = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(b) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    fr = b[fi * frame_size:(fi + 1) * frame_size]
                    doc_ids.append(doc_id)
                    idxs.append(fi)
                    lens.append(len(fr))
                    sums.append(int(sum(fr)) % 2**31)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_sum": pd.Series(sums, dtype="int32"),
                }
            )

    payloads = to_binary_payloads(documents).select("doc_id", "payload")
    return payloads.mapInPandas(batches, schema=FRAME_SCHEMA)
