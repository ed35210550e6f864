"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent: Spark's partial/final hash aggregate
adds doubles in a different order than a single-threaded engine, so raw
`SUM(double)` will differ from the DuckDB oracle in the last ulps and fail a
value-hash comparison. The engine-wide convention is therefore:

    aggregate doubles through DECIMAL (exact, order-independent), then cast
    the exact result back to double.

`CAST(x AS DECIMAL(18,2))` of the *same* input double is deterministic in
both engines (ties at .xx5 would need the binary double to be exactly on the
boundary, which is unrepresentable), the decimal SUM is exact, and the final
decimal->double cast is the IEEE-nearest double of the same exact value in
both engines. Derived ratios divide two already-identical doubles, which is
again bit-identical. Mirrors: `ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS
DOUBLE), 2)` on the oracle side.

This also holds at 100 TB: decimal aggregation is whole-stage-codegen'd and
partial-aggregated map-side exactly like double sums.

ROUNDING RULE (sf1-surfaced, r4): the no-op-round argument above only holds
when the round scale EQUALS the decimal scale. When the sum's scale exceeds
the displayed scale (e.g. SUM(DECIMAL(18,4)) rounded to cents), the exact
sum regularly lands on .xx50 — and rounding that tie AFTER the double cast
diverges between engines (Spark rounds the double's exact binary expansion
HALF_UP; DuckDB rounds via value*100 float arithmetic). Two of 148 queries
failed exactly this way at 6M rows (q7/q9, SF1.md). Therefore: round in
the DECIMAL domain, cast to double after —
    Spark : F.round(F.sum(x.cast("decimal(18,4)")), 2).cast("double")
    oracle: CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE)
Both engines round decimal ties half-away-from-zero (probe-verified
positive and negative), so the cents value is identical by construction.

CAST RULE (sf1-surfaced, r5): a DECIMAL -> DOUBLE cast is bit-identical
cross-engine ONLY while the decimal's SCALED INTEGER fits in 2^53.
Spark casts via BigDecimal.doubleValue() (one correctly-rounded step);
DuckDB computes (double)int128 / 10^scale — TWO roundings that diverge
once the int128 itself needs rounding to double. profile_embedding_drift
hit this with a (38,12) sum whose scaled integer was ~2.4e16: d2 values
agreed decimal-exactly, the CASTS disagreed in the last ulp. Therefore:
before any decimal->double cast, ROUND in the decimal domain to a scale
where |value| * 10^scale < 2^53 (~9e15). All scale<=6 money/score sums
here are safely inside the bound; audit any decimal with scale >= 9.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: ColumnOrName, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent sum of a double column (see module docstring).

    Result is DOUBLE, rounded at `scale` (a no-op numerically — the decimal
    already has that scale — but it pins the column type and intent).
    """
    dec = _col(c).cast(f"decimal({precision},{scale})")
    return F.round(F.sum(dec).cast("double"), scale)


def davg(c: ColumnOrName, scale: int = 2, out_scale: int = 4,
         precision: int = 18) -> Column:
    """Order-independent mean: exact decimal sum / count, divided in double.

    Both engines divide the identical (sum, count) pair, so the double
    quotient is bit-identical; round(out_scale) then matches exactly.
    Oracle mirror: ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
                         / COUNT(*), 4).
    """
    dec = _col(c).cast(f"decimal({precision},{scale})")
    return F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), out_scale)


def ratio(num: ColumnOrName, den: ColumnOrName, out_scale: int = 4) -> Column:
    """Deterministic ratio of two exact (integer-valued) columns."""
    return F.round(_col(num).cast("double") / _col(den).cast("double"), out_scale)
