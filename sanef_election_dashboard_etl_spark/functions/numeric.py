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
    """Order-independent mean, rounded at out_scale in EXACT INTEGER
    arithmetic (r6 TIE RULE — the sf0.1 full-registry sweep caught the
    old round(double_quotient) form splitting the engines): when the
    exact quotient sum/count lands ON a half at digit out_scale+1
    (e.g. 0.616992/192 = 0.0032135 exactly), the double quotient is
    0.0032134999... and Spark's exact-expansion HALF_UP rounds DOWN
    while DuckDB's scaled round goes UP. No double may touch the value
    before the final division:

        su  = sum(decimal(x, scale)) * 10^scale          -- exact units
        d   = count * 10^max(0, scale-out_scale)
        s2  = su * 10^max(0, out_scale-scale)
        mu  = sign(s2) * ((2*|s2| + d) DIV (2*d))        -- half-AWAY
        out = mu / 10^out_scale                          -- exact / pow10

    Every step is bigint-exact (callers keep |su| and 2|s2|+d under
    2^53 — fixture sums are far below); the one double division at the
    end divides exact integers and is IEEE-identical cross-engine.
    Oracle mirror (scale=6, out_scale=4 shown):

        CAST(CASE WHEN su >= 0 THEN (2*su + d) // (2*d)
                  ELSE -((-2*su + d) // (2*d)) END AS DOUBLE) / 10000.0
        -- su = CAST(SUM(CAST(x AS DECIMAL(18,6))) * 1000000 AS BIGINT)
        -- d  = COUNT(*) * 100

    Half-away-from-zero matches both engines' ROUND semantics for the
    non-tie values the old form produced, so previously-green entries
    keep their values; only true ties (where the engines disagreed)
    move — to the decimal-correct answer."""
    dec = _col(c).cast(f"decimal({precision},{scale})")
    su = (F.sum(dec) * F.lit(10 ** scale)).cast("long")
    s2 = su * F.lit(10 ** max(0, out_scale - scale))
    d = F.count(F.lit(1)) * F.lit(10 ** max(0, scale - out_scale))
    num = F.abs(s2) * 2 + d
    den = d * 2
    # exact floor division on longs: subtract the remainder, then the
    # double division of an exact multiple below 2^53 is error-free
    mu = ((num - num % den) / den).cast("long")
    mu = F.when(s2 < 0, -mu).otherwise(mu)
    return mu.cast("double") / F.lit(float(10 ** out_scale))


def ratio(num: ColumnOrName, den: ColumnOrName, out_scale: int = 4) -> Column:
    """Deterministic ratio of two exact (integer-valued) columns."""
    return F.round(_col(num).cast("double") / _col(den).cast("double"), out_scale)
