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


def word_tokens_py(text: str) -> list[str]:
    """Qdrant's default ``word`` tokenizer, driver-side: lowercase, split
    on every non-alphanumeric character, drop empties. Must stay the exact
    twin of ``functions.text.word_tokens`` (JVM) — parity-tested."""
    return [t for t in _WORD_SPLIT.split(str(text).lower()) if t]
