"""Engine-wide expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 2) -> Column:
    """Engine-portable rounding: ``floor(x * 10^n + 0.5) / 10^n``.

    Spark's ``round`` re-parses the double through its shortest decimal
    string (BigDecimal HALF_UP) while DuckDB rounds the binary value, so
    inputs sitting exactly on a half grain (common for products of
    2-decimal money values) round differently between engines. This
    formulation uses only IEEE ops both engines execute identically, so a
    Spark query and its DuckDB oracle produce bit-identical doubles.
    Oracle SQL must spell out the same formula.
    """
    if isinstance(col, str):
        col = F.col(col)
    p = 10**n
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)
