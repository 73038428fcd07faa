"""Content-addressed point ids.

The reference derives string point ids as ``uuid.uuid3(NAMESPACE_DNS, text)``
(/root/reference/test_qdrant.py:55) — content addressing that makes upsert a
dedup-by-text. RFC 4122 v3 is md5 over (namespace bytes ++ name bytes) with
two nibble fixups (version=3, variant=10xx), which is fully expressible with
JVM built-ins (md5 over a binary concat + hex-string surgery) — no Python
boundary, whole-stage codegen keeps it at scan speed.

No DuckDB oracle: DuckDB 1.0.0's ``md5`` only accepts VARCHAR and the DNS
namespace bytes (6ba7b810-9dad-11d1-80b4-00c04fd430c8) are not valid UTF-8,
so the namespaced digest cannot be computed SQL-side — the registry entry is
rows-only; exactness is unit-tested against ``uuid.uuid3`` instead.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F


def uuid3_dns(col: Column | str) -> Column:
    """uuid3(NAMESPACE_DNS, text) as pure JVM column expressions.

    digest = md5(ns_bytes ++ utf8(text)); then RFC 4122 §4.3 fixups on the
    32-char hex: nibble 13 (digest byte 6 high nibble) := '3' (version) and
    nibble 17 (byte 8 high nibble) := (nibble & 0x3) | 0x8 (variant 10xx),
    formatted 8-4-4-4-12. Null text hashes as '' (reference coerces falsy
    titles the same way).
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    hx = F.md5(F.concat(F.lit(uuid.NAMESPACE_DNS.bytes), F.encode(c, "UTF-8")))
    variant = F.lower(
        F.conv(
            F.conv(F.substring(hx, 17, 1), 16, 10)
            .cast("int")
            .bitwiseAND(F.lit(0x3))
            .bitwiseOR(F.lit(0x8))
            .cast("string"),
            10,
            16,
        )
    )
    return F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.concat(F.lit("3"), F.substring(hx, 14, 3)),
        F.concat(variant, F.substring(hx, 18, 3)),
        F.substring(hx, 21, 12),
    )
