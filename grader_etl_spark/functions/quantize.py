"""Cross-engine display quantization — the ONE spelling both engines
compute identically.

Native ``ROUND(double, n)`` is NOT a cross-engine function: Spark
rounds the exact binary expansion (BigDecimal.HALF_UP on the double's
true value); DuckDB multiplies by 10^n first and rounds the inexact
product. Measured head-to-head (round 5, 1.2M bit-identical doubles
including half-boundary-adjacent adversarial values): native ROUND
disagreed on ~1% of the boundary-adjacent samples even at
|x| < 4.5e9, while the guarded floor spelling below matched on ALL
1.2M. Every displayed float in an oracle-checked query therefore goes
through this helper on the Spark side and the matching
``CASE WHEN abs(x) < 4.5e9 THEN floor(x*1eN + 0.5)/1eN ELSE x END``
spelling in the DuckDB oracle.

The |x| < 4.5e9 guard serves two constraints at once: x·1e6 stays in
the 2^52 integer-exact double range, and Spark's ``floor`` (which
returns BIGINT and SATURATES at 2^63 — found by the round-4 magnitude
fuzz) never sees an overflowing product. Above the guard the value
passes through untouched on both engines — at those magnitudes the
double's own spacing exceeds the decimal scale anyway. NaN/±Inf/NULL
take the pass-through branch too (the guard comparison is false/null),
so ``floor`` never sees a non-finite input.

Semantics note: floor(x·s + 0.5) is round-half-UP (toward +inf), not
ROUND's half-away-from-zero — at an exact negative half boundary the
displayed value differs from ROUND by one last digit. The contract
these queries pin is CROSS-ENGINE EQUALITY of the displayed value,
which only this spelling provides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

GUARD = 4.5e9


def floor_quantize(c: Column | str, digits: int) -> Column:
    """Guarded floor-quantize of a double column to ``digits`` decimal
    places — identical function in Spark and DuckDB (see module doc)."""
    col = F.col(c) if isinstance(c, str) else c
    scale = float(10**digits)
    q = F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
    return F.when(F.abs(col) < F.lit(GUARD), q).otherwise(col)


def fq_sql(expr: str, digits: int) -> str:
    """The DuckDB twin spelling, for composing oracle SQL."""
    scale = f"1e{digits}"
    return (
        f"CASE WHEN abs({expr}) < 4.5e9 "
        f"THEN floor(({expr}) * {scale} + 0.5) / {scale} ELSE ({expr}) END"
    )
