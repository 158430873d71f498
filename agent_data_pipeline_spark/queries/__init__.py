"""The engine's query registry: every declared operator (SURVEY.md §2.B)
as a QuerySpec — Spark callable + DuckDB oracle SQL (None => rows-only).
"""

from __future__ import annotations

from .core import QuerySpec
from . import extras, extras2, extras3, extras4, extras5, llmdata_q, relational, scalars, temporal

REGISTRY: dict[str, QuerySpec] = {}
# Verification-completion rotation (final round of it): an external
# correctness harness samples the first N registry entries in THIS order.
# Round 1 verified all 50 of `relational`; round 2 verified
# temporal+llmdata_q+extras2 (50/50). Round 3 leads with the remaining
# never-hard-checked modules (scalars 19 + extras 10 + extras3 6 +
# extras4 6 + extras5 5 = 46, padded to 50 by the head of temporal), which
# completes hard driver rows for all 146 queries. After this round the
# order FREEZES — verification coverage should then be driven by the
# harness/manifest, not by product-registry ordering.
for mod in (scalars, extras, extras3, extras4, extras5, temporal, llmdata_q, extras2, relational):
    overlap = REGISTRY.keys() & mod.QUERIES.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    REGISTRY.update(mod.QUERIES)

__all__ = ["REGISTRY", "QuerySpec"]
