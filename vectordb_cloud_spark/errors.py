"""Shared error types.

Kept dependency-free so both the operator layer and the API facades can
raise them without import cycles.
"""

from __future__ import annotations


class PointNotFoundError(ValueError):
    """A query/recommend/discover document referenced a stored point id
    that doesn't exist. Subclasses ``ValueError`` so library callers keep
    their existing handling, but the HTTP layer maps it to **404 Not
    Found** (Qdrant's status for a missing point referenced by id — e.g.
    a query-by-id or a recommend example id) rather than the 422
    validation envelope (ADVICE r12)."""
