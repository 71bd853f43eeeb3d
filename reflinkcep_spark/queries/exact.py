"""Order-insensitive-exact aggregates for cross-engine oracles.

``SUM(double)`` is order-sensitive: Spark and DuckDB fold partitions in
different orders, so two bit-different doubles can land on opposite
sides of a ``ROUND(x, 2)`` half-boundary and flake the driver's
value-hash at some scale factor even though both answers are "right".
The source columns here are all generated with exactly two decimal
digits, so the fix is to aggregate exactly: cast to ``DECIMAL`` first
(lossless for 2-digit doubles), sum decimals (exact, order-free), and
only then round and cast back to ``DOUBLE``.  Both engines produce the
nearest double of the *same* rational number — identical bits, stable
hash at every SF.

Averages are worse: even with an exact sum, ``ROUND(sum/count, 4)``
on a double can land exactly on a representable half-boundary
(observed: 227673.41875 → Spark .4188, DuckDB .4187 — their tie
handling on binary doubles differs), and DuckDB's ``AVG(DECIMAL)``
returns ``DOUBLE`` while Spark's returns ``DECIMAL`` so decimal
end-to-end isn't portable either.  So the half-up rounding itself is
done in BIGINT arithmetic, identical on both engines:

    round4(s_cents / (100·n)) = floor((200·s + n) / (2·n)) / 10⁴

with ``s`` the exact cent sum and ``n`` the row count (positive
domain).  Every intermediate stays well under 2^53, so the final
double division is the correctly-rounded image of the same rational
on both engines.

The matching DuckDB SQL spellings (kept next to each query string):

    ROUND(SUM(CAST(c AS DECIMAL(18,2))), 2)::DOUBLE
    ((200 * SUM(CAST(CAST(c AS DECIMAL(18,2)) * 100 AS BIGINT)) + COUNT(c))
      // (2 * COUNT(c))) / 10000.0
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dec2",
    "cents",
    "exact_sum2",
    "exact_avg4",
    "unit4_revenue",
    "unit4_product",
    "exact_sum2_from_unit4",
]


def dec2(col, prec: str = "decimal(18,2)") -> Column:
    """Lossless decimal view of a 2-decimal-digit double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(prec)


def cents(col) -> Column:
    """Exact integer cents of a 2-decimal-digit double column."""
    return (dec2(col) * 100).cast("long")


def exact_sum2(col) -> Column:
    """``ROUND(SUM(col), 2)`` with an exact integer-cent accumulator.

    Equivalent bits to the decimal spelling (the sum is the same exact
    rational, and its decimal image casts to the same correctly-rounded
    double) but ~2× faster: the aggregation loop does LONG adds inside
    codegen instead of checked decimal adds (measured 1.0 s → 0.55 s on
    the sf0.1 pricing summary).  The once-per-group ``/100`` runs in
    DECIMAL(38,0) — a long→double divide would double-round once Σcents
    exceeds 2^53 (~9×10¹³ dollars, reachable at 100 TB).  Remaining
    limit: the long accumulator itself wraps at 2^63 ≈ 9.2×10¹⁸ cents
    (~9.2×10¹⁶ dollars) — beyond any real corpus for these columns; use
    a decimal accumulator if a column can exceed it.  The DuckDB oracle
    spelling stays ``ROUND(SUM(CAST(c AS DECIMAL(18,2))), 2)::DOUBLE``.
    """
    s = F.sum(cents(col)).cast("decimal(38,0)")
    return (s / 100).cast("double")


def unit4_revenue(price_col, disc_col) -> Column:
    """``price · (1 - disc)`` per row in exact 10⁻⁴ units (long):
    cents(price) × (100 − percent(disc))."""
    d = (dec2(disc_col, "decimal(3,2)") * 100).cast("long")
    return cents(price_col) * (100 - d)


def unit4_product(price_col, disc_col) -> Column:
    """``price · disc`` per row in exact 10⁻⁴ units (long)."""
    d = (dec2(disc_col, "decimal(3,2)") * 100).cast("long")
    return cents(price_col) * d


def exact_sum2_from_unit4(col4) -> Column:
    """``ROUND(SUM(x), 2)`` where ``col4`` carries x in exact 10⁻⁴
    units: integer half-up to cents, then one exact division.  Positive
    domain (the floor-division trick), matching DuckDB's
    ``ROUND(SUM(DECIMAL), 2)`` half-up.

    The rounding and final divide run in DECIMAL(38,0): in LONG, the
    ``+50``/divide path would double-round once Σunit4 passes 2^53 and
    wrap at 2^63 — exactly the aggregate scale exact_avg4 is hardened
    for.  Per-row accumulation stays LONG (codegen adds); only the
    once-per-group arithmetic pays decimal cost.  The long accumulator
    wraps at Σ|unit4| ≥ 2^63 (~9.2×10¹⁴ dollars in 10⁻⁴ units) —
    documented limit, same as exact_sum2."""
    x = F.sum(col4).cast("decimal(38,0)") + 50
    c = (x - F.pmod(x, 100)) / 100
    return (c / 100).cast("double")


def exact_avg4(col, prec: str = "decimal(18,2)") -> Column:
    """``ROUND(AVG(col), 4)`` with the half-up round done in exact
    integer arithmetic (see module docstring).  Positive domain only:
    the floor-division trick assumes non-negative cent sums.

    The per-row hot path stays LONG (cent casts + long adds in
    codegen); only the once-per-group rounding runs in DECIMAL(38,0),
    because ``s·200`` overflows a long once Σcents exceeds ~4.6e16 —
    a few billion high-valued rows, i.e. exactly the 100 TB regime.
    DuckDB's matching spelling is safe natively (SUM(BIGINT) is
    HUGEINT there).  The decimal quotient is integral by construction
    (x − x mod y divides y), so the division is exact at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum((dec2(c, prec) * 100).cast("long")).cast("decimal(38,0)")
    n = F.count(c).cast("decimal(38,0)")
    x = s * 200 + n
    y = n * 2
    q = ((x - F.pmod(x, y)) / y).cast("long")
    return q / F.lit(10000.0)
