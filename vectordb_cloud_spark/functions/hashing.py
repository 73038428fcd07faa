"""Driver-side twins of Spark hash/tokenize expressions (serving hot path).

Serving paths (e.g. the full-text postings router,
``CollectionCatalog.text_match_ids``) need the SAME hash the JVM writer
used — but scheduling a one-row Spark job per request just to reuse
``F.xxhash64`` is pure latency. xxHash64 is a public, stable algorithm
(Yann Collet's XXH64; Spark implements it verbatim in
``org.apache.spark.sql.catalyst.expressions.XxHash64`` with seed 42 over a
string's UTF-8 bytes), so we compute it in Python and pin JVM parity with a
test (tests/test_text_index.py) instead of a per-request job.

Likewise ``word_tokens_py`` is the Python twin of the JVM-side ``word``
tokenizer split used by ``build_text_index`` — Python's ``\\w`` (minus
underscore) and Java's ``[\\p{L}\\p{N}]`` agree on the same Unicode
categories (L*, Nd, Nl, No), pinned by the same parity test.
"""

from __future__ import annotations

import re

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, k: int) -> int:
    return (_rotl((acc + k * _P2) & _M64, 31) * _P1) & _M64


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 of ``data`` — bit-identical to Spark's ``F.xxhash64`` on a
    string column (Spark's default seed is 42), returned as a SIGNED
    64-bit value like the JVM long."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    # to signed 64-bit (what the JVM long / Spark column carries)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod64(value: int, m: int) -> int:
    """Spark ``pmod`` over a signed-long hash: non-negative remainder.
    Python ``%`` with a positive modulus already is the positive mod."""
    return value % m


# Underscore excluded explicitly: Python \w includes it, Qdrant's `word`
# tokenizer (any non-alphanumeric is a separator) does not.
_WORD_SPLIT = re.compile(r"[\W_]+", re.UNICODE)


# Java \s (as used by F.split(col, r"\s+") WITHOUT
# UNICODE_CHARACTER_CLASS) matches ASCII whitespace ONLY: a NBSP or
# em-space is NOT a separator on the JVM side, while Python's bare
# str.split() would split on it — a query tokenized with str.split()
# could then miss a doc whose posting kept 'hello world' whole.
_JAVA_WS_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")


def whitespace_tokens_py(text: str) -> list[str]:
    """Driver-side twin of the ``text_whitespace`` index tokenizer
    (``functions.text.words`` + lower + drop empties): split on ASCII
    whitespace exactly like Java ``\\s+``, lowercase, keep punctuation
    attached. Parity-pinned in tests/test_text_index.py (incl. NBSP)."""
    return [t.lower() for t in _JAVA_WS_SPLIT.split(str(text)) if t]


def word_tokens_py(text: str) -> list[str]:
    """Qdrant's default ``word`` tokenizer, driver-side: lowercase, split
    on every non-alphanumeric character, drop empties. Must stay the exact
    twin of ``functions.text.word_tokens`` (JVM) — parity-tested."""
    return [t for t in _WORD_SPLIT.split(str(text).lower()) if t]


# ---------------------------------------------------------------------------
# Murmur3_x86_32 — the algorithm behind Spark's ``F.hash`` (seed 42).
# Public algorithm (Austin Appleby's MurmurHash3); Spark hashes a LONG as
# two 32-bit halves and a string's UTF-8 bytes as 4-byte little-endian
# words + per-byte tail rounds. Used driver-side to derive the __bucket
# value for one shard-key value without scheduling a one-row Spark job
# (JVM parity pinned in tests/test_text_index.py).
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    # to signed 32-bit (what Spark's int column carries)
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def murmur3_long(value: int, seed: int = 42) -> int:
    """Spark ``F.hash(col.cast('long'))``: the long's low and high 32-bit
    halves, one Murmur3 round each."""
    v = value & ((1 << 64) - 1)  # two's-complement view
    low = v & _M32
    high = (v >> 32) & _M32
    h1 = _mix_h1(seed & _M32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, 8)


def murmur3_string(value: str, seed: int = 42) -> int:
    """Spark ``F.hash(string_col)``: Murmur3 over the UTF-8 bytes —
    4-byte little-endian words, then one round per TRAILING byte (Spark's
    hashUnsafeBytes tail handling; bytes are Java-signed)."""
    data = value.encode("utf-8")
    n = len(data)
    h1 = seed & _M32
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i:i + 4], "little")))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:  # Java byte is signed
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _fmix(h1, n)
