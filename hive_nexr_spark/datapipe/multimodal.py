"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas functions via `mapInPandas`.

The container has no image/audio codec LIBRARIES, but `decode_image` is a
real stdlib-only decoder for BMP (24-bit BI_RGB) and binary PPM, with
NotImplementedError reserved for genuinely external-codec formats
(JPEG/PNG). The byte-level feature ops below keep their deterministic
stand-in features (oracle-checked, format-independent); the Spark-side
plumbing — binary column construction, schema, Arrow batch iteration,
partition behavior — is real throughout.
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


def decode_image(payload: bytes) -> tuple[int, int, str, bytes]:
    """REAL image decode, stdlib-only (r9 — retires the former
    NotImplementedError stub): parses uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB, 4-byte row padding,
    bottom-up or top-down, BGR byte order — the public Windows DIB
    layout) and binary PPM "P6" (the netpbm format). Returns
    (width, height, "RGB", pixels) with pixels row-major top-down RGB
    triplets. Anything else (JPEG/PNG need external codecs this
    container lacks) still raises NotImplementedError — now a genuine
    unsupported-container signal, not a placeholder."""
    import re
    import struct

    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        (off,) = struct.unpack_from("<I", payload, 10)
        _hsz, w, h, _planes, bpp, comp = struct.unpack_from(
            "<IiiHHI", payload, 14)
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={comp} unsupported")
        row_sz = (w * 3 + 3) & ~3
        hh, topdown = abs(h), h < 0
        out = bytearray()
        for r in range(hh):
            src = r if topdown else hh - 1 - r
            row = payload[off + src * row_sz:off + src * row_sz + w * 3]
            if len(row) < w * 3:
                raise ValueError("truncated BMP pixel data")
            for i in range(0, w * 3, 3):  # BGR → RGB
                out += bytes((row[i + 2], row[i + 1], row[i]))
        return w, hh, "RGB", bytes(out)
    if payload[:2] == b"P6":
        m = re.match(rb"P6\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)"
                     rb"\s+(?:#[^\n]*\s+)*(\d+)[ \t\r\n]", payload)
        if not m:
            raise ValueError("malformed PPM header")
        w, hh, maxval = (int(m.group(i)) for i in (1, 2, 3))
        if maxval > 255:
            raise NotImplementedError("16-bit PPM unsupported")
        px = payload[m.end():m.end() + w * hh * 3]
        if len(px) < w * hh * 3:
            raise ValueError("truncated PPM pixel data")
        return w, hh, "RGB", px
    raise NotImplementedError("unsupported image container "
                              f"(magic {payload[:2]!r})")


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Deterministic 24-bit BMP writer (test fixture generator and the
    re-encode half of a decode→transform→encode pipeline): top-down RGB
    triplets in, standard bottom-up BI_RGB file out."""
    import struct

    row_sz = (width * 3 + 3) & ~3
    img_sz = row_sz * height
    header = (b"BM"
              + struct.pack("<IHHI", 54 + img_sz, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            img_sz, 2835, 2835, 0, 0))
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for c in range(width):
            i = (r * width + c) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # RGB → BGR
        row += b"\x00" * (row_sz - len(row))
        body += row
    return bytes(header) + bytes(body)


DECODE_SCHEMA = ("doc_id long, width int, height int, n_pixels int, "
                 "mean_r double, mean_g double, mean_b double")


def decode_image_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched decode→feature extraction over REAL image bytes:
    mapInPandas calls `decode_image` per payload and emits per-channel
    means — the exact pipeline shape production image featurization
    uses, with the codec now real for BMP/PPM. `payloads`: (doc_id,
    payload binary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _mode, px = decode_image(bytes(b))
                n = w * h
                rows.append((doc_id, w, h, n,
                             sum(px[0::3]) / n, sum(px[1::3]) / n,
                             sum(px[2::3]) / n))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b"])

    return payloads.mapInPandas(batches, schema=DECODE_SCHEMA)


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


def encode_wav(doc_id: int, n_samples: int = 1024,
               sample_rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV (RIFF/WAVE, the public
    Microsoft/IBM container layout): samples come from an integer LCG
    keyed on doc_id — s(i) = ((doc_id*1103515245 + i*12345) % 65536)
    - 32768 — so the decoded waveform is reproducible in pure SQL with
    the same formula, no audio library on either side."""
    import struct

    samples = [
        ((doc_id * 1103515245 + i * 12345) % 65536) - 32768
        for i in range(n_samples)
    ]
    data = struct.pack(f"<{n_samples}h", *samples)
    byte_rate = sample_rate * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                   byte_rate, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_audio(payload: bytes) -> tuple[int, int, bytes]:
    """REAL audio decode, stdlib-only: walks the RIFF chunk list (not a
    fixed offset — real WAVs carry LIST/fact chunks before data), parses
    the fmt chunk, and returns (sample_rate, n_samples, pcm_bytes) for
    16-bit mono PCM. Compressed codecs raise NotImplementedError — a
    genuine unsupported-container signal, like `decode_image`."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise NotImplementedError(
            f"unsupported WAV encoding: fmt={audio_format} ch={channels} "
            f"bits={bits} (only 16-bit mono PCM decodes in-container)")
    return sample_rate, len(data) // 2, data


AUDIO_SCHEMA = ("doc_id long, win_idx int, n int, energy long, "
                "zero_cross int, peak int")


def audio_window_features(documents: DataFrame, window: int = 256,
                          n_samples: int = 1024) -> DataFrame:
    """Windowed audio features over the WAV byte path: encode the
    deterministic PCM payload, DECODE it back through the real RIFF
    parser, then per `window`-sample frame emit all-INTEGER features —
    energy = sum of squared samples, zero-crossing count, peak = max
    absolute sample. Integer-only outputs sidestep float rounding, so
    the whole byte pipeline hash-verifies against a SQL oracle that
    regenerates the LCG waveform arithmetically.

    100 TB shape: one Arrow-batched mapInPandas pass, numpy-vectorized
    per payload, N windows out per row in (the UDTF shape) — and NO
    shuffle anywhere: features are per-document-local, the plan is scan
    → MapInPandas, full stop (asserted in tests/test_plans.py)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, wins, ns, energies, zcs, peaks = [], [], [], [], [], []
            for doc_id in pdf["doc_id"]:
                _sr, n, pcm = decode_audio(
                    encode_wav(int(doc_id), n_samples))
                s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                for w in range(n // window):
                    seg = s[w * window:(w + 1) * window]
                    signs = seg >= 0
                    ids.append(int(doc_id))
                    wins.append(w)
                    ns.append(len(seg))
                    energies.append(int(np.sum(seg * seg)))
                    zcs.append(int(np.sum(signs[1:] != signs[:-1])))
                    peaks.append(int(np.max(np.abs(seg))))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "win_idx": pd.Series(wins, dtype="int32"),
                "n": pd.Series(ns, dtype="int32"),
                "energy": pd.Series(energies, dtype="int64"),
                "zero_cross": pd.Series(zcs, dtype="int32"),
                "peak": pd.Series(peaks, dtype="int32"),
            })

    return documents.select("doc_id").mapInPandas(
        batches, schema=AUDIO_SCHEMA)


PHASH_W, PHASH_H = 9, 8


def _text_rgb(text: str, shift: int) -> bytes:
    """Deterministic synthetic image pixels: the document's UTF-8 bytes
    cycled over a 9×8 RGB raster, plus a per-variant brightness shift
    (clipped at 255; the corpus is ASCII so the +8 shift never clips).
    The stand-in for real lake images — arithmetic simple enough that
    the SQL oracle regenerates the pixels from the text directly."""
    b = text.encode("utf-8")
    n = PHASH_W * PHASH_H * 3
    return bytes(min(b[i % len(b)] + shift, 255) for i in range(n))


def phash_corpus(documents: DataFrame, max_doc_id: int = 200) -> DataFrame:
    """The perceptual-dedup arrival mix: bounded originals (shift 0),
    planted EXACT image copies (+100000, even ids — identical payload
    bytes) and BRIGHTNESS-SHIFTED variants (+200000, %3 ids — every
    pixel +8: different payload bytes, same perceptual content).
    Columns: (doc_id, text, shift)."""
    base = documents.select("doc_id", "text").filter(
        (F.col("doc_id") % 100000) < max_doc_id)
    originals = base.withColumn("shift", F.lit(0))
    exacts = (base.filter(F.col("doc_id") % 2 == 0)
              .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
              .withColumn("shift", F.lit(0)))
    shifted = (base.filter(F.col("doc_id") % 3 == 0)
               .select((F.col("doc_id") + 200000).alias("doc_id"), "text")
               .withColumn("shift", F.lit(8)))
    return originals.unionByName(exacts).unionByName(shifted)


PHASH_SCHEMA = "doc_id long, phash string, digest string"


def image_phashes(corpus: DataFrame) -> DataFrame:
    """REAL encode→decode→hash through the Arrow path: each row's pixels
    are rendered into an actual 24-bit BMP (`encode_bmp`), decoded back
    by the real stdlib decoder (`decode_image` — BGR order, bottom-up
    rows, padding all exercised by the non-multiple-of-4 width 9), then
    reduced to the classic 64-bit dHash (difference hash — public): per
    pixel the channel sum, per row the 8 left<right comparisons of the
    9 columns. Emitted as a 64-char bitstring plus the payload md5 (the
    exact-dup reference). One mapInPandas stage, Arrow-batched."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes, digests = [], [], []
            for doc_id, text, shift in zip(pdf["doc_id"], pdf["text"],
                                           pdf["shift"]):
                payload = encode_bmp(
                    PHASH_W, PHASH_H, _text_rgb(text, int(shift)))
                w, h, _mode, px = decode_image(payload)
                s = [px[3 * p] + px[3 * p + 1] + px[3 * p + 2]
                     for p in range(w * h)]
                bits = "".join(
                    "1" if s[r * w + c + 1] > s[r * w + c] else "0"
                    for r in range(h) for c in range(w - 1))
                ids.append(doc_id)
                hashes.append(bits)
                digests.append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "phash": hashes, "digest": digests})

    return corpus.mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_dedup_pairs(documents: DataFrame, max_dist: int = 4,
                      max_doc_id: int = 200) -> DataFrame:
    """PERCEPTUAL image near-dup pairs — the multimodal member of the
    dedup family: dHash each image (real BMP decode in the Arrow path),
    band the 64-bit hash into 5 substrings (13/13/13/13/12 bits),
    self-join on any equal band (the standard hamming-LSH candidate
    rule: with 5 bands, distance <= 4 differing bits leave at least one
    band intact — zero false negatives within the radius by pigeonhole;
    4 bands would NOT guarantee this at radius 4, since 4 bits can land
    one per band — same `max_hamming < n_bands` rule as simhash
    banding in dedup.py), verify exact hamming <= `max_dist`, and
    report alongside EXACT-byte equality (payload md5): the planted
    brightness-shifted variants match at hamming 0 while their payload
    digests differ — the case byte-exact dedup structurally misses.

    Output: (doc_a, doc_b, hamming, exact_dup), doc_a < doc_b.

    100 TB shape: hashing is one Arrow pass ∝ corpus; candidates shuffle
    (band, 16-bit key) only — never pixels; verification compares
    64-char bitstrings of candidate pairs. The oracle regenerates the
    pixel arithmetic from the text (no codec in SQL) and mirrors the
    banding rule exactly — the engine's hash rides a REAL container
    roundtrip the oracle proves bit-faithful."""
    from ._cache import tracked_persist

    hashes = tracked_persist(
        image_phashes(phash_corpus(documents, max_doc_id)))
    # 5 bands of widths 13/13/13/13/12 over the 64-bit hash: the
    # pigeonhole guarantee needs n_bands > max_dist (5 > 4).
    widths = [13, 13, 13, 13, 12]
    offsets = [0, 13, 26, 39, 52]
    bands = hashes.select(
        "doc_id", "phash", "digest",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.substring("phash", offsets[b] + 1,
                                 widths[b]).alias("key"))
            for b in range(5)
        ])).alias("bb"),
    ).select("doc_id", "phash", "digest", "bb.band", "bb.key")
    cand = (
        bands.alias("a").join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.phash").alias("ha"), F.col("b.phash").alias("hb"),
                (F.col("a.digest") == F.col("b.digest")).alias("exact_dup"))
        .distinct())
    return (
        cand.withColumn(
            "hamming",
            F.size(F.filter(
                F.zip_with(F.split("ha", ""), F.split("hb", ""),
                           lambda x, y: x != y),
                lambda v: v)).cast("int"))
        .filter(F.col("hamming") <= max_dist)
        .select("doc_a", "doc_b", "hamming", "exact_dup")
    )
