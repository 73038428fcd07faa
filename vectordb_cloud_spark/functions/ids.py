"""Content-addressed point ids.

The reference derives string point ids as ``uuid.uuid3(NAMESPACE_DNS, text)``
(/root/reference/test_qdrant.py:55) — content addressing that makes upsert a
dedup-by-text. Exact parity needs the RFC 4122 v3 algorithm (md5 over
namespace bytes + name), whose binary namespace prefix isn't expressible in
DuckDB VARCHAR md5 — so this is a (vectorized) Python boundary with a
rows-only oracle; the md5-hex ``doc_fingerprint`` covers the SQL-checkable
content-id case.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def uuid3_dns(col: Column | str) -> Column:
    """uuid3(NAMESPACE_DNS, text) as an Arrow-batched pandas_udf."""

    @F.pandas_udf(StringType())
    def _u3(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: str(uuid.uuid3(uuid.NAMESPACE_DNS, t or "")))

    return _u3(F.col(col) if isinstance(col, str) else col)
