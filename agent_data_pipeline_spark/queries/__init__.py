"""The engine's query registry: every declared operator (SURVEY.md §2.B)
as a QuerySpec — Spark callable + DuckDB oracle SQL (None => rows-only).
"""

from __future__ import annotations

from .core import QuerySpec
from . import extras, extras2, extras3, extras4, extras5, llmdata_q, relational, scalars, temporal

REGISTRY: dict[str, QuerySpec] = {}
for mod in (relational, scalars, temporal, llmdata_q, extras, extras2, extras3, extras4, extras5):
    overlap = REGISTRY.keys() & mod.QUERIES.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    REGISTRY.update(mod.QUERIES)

__all__ = ["REGISTRY", "QuerySpec"]
