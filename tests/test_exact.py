"""queries/exact.py: order-insensitive money aggregation helpers.

The half-boundary cases here are exactly the ones where rounding a
double sum/quotient flakes between engines (see module docstring)."""

from pyspark.sql import functions as F

from reflinkcep_spark.queries.exact import exact_avg4, exact_sum2


def test_exact_sum2_is_order_insensitive_exact(spark):
    # 0.1 + 0.2 summed as doubles is 0.30000000000000004; decimal is 0.3
    df = spark.createDataFrame([(0.1,), (0.2,), (6.55,)], "v double")
    [row] = df.agg(exact_sum2("v").alias("s")).collect()
    assert row["s"] == 6.85


def test_exact_avg4_rounds_half_up_at_the_boundary(spark):
    # one cent over 200 rows: avg = 0.00005 exactly — the half-boundary
    # where Spark and DuckDB disagree on ROUND(double, 4).
    rows = [(0.01,)] + [(0.0,)] * 199
    df = spark.createDataFrame(rows, "v double")
    [row] = df.agg(exact_avg4("v").alias("a")).collect()
    assert row["a"] == 0.0001  # half-up, deterministically

    # and a plain case for sanity
    df2 = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    [row2] = df2.agg(exact_avg4("v").alias("a")).collect()
    assert row2["a"] == 1.5


def test_exact_sum2_matches_decimal_spelling_bitwise(spark):
    """The long-cent accumulator must be the same correctly-rounded
    double as ROUND(SUM(DECIMAL),2)::DOUBLE for any 2-digit inputs."""
    from reflinkcep_spark.queries.exact import dec2

    rows = [(round(x * 0.01, 2),) for x in range(-500, 500, 7)] + [(9e12,)]
    df = spark.createDataFrame(rows, "v double")
    [row] = df.agg(
        exact_sum2("v").alias("fast"),
        F.round(F.sum(dec2("v")), 2).cast("double").alias("ref"),
    ).collect()
    assert row["fast"] == row["ref"]


def test_unit4_revenue_half_up_rounding(spark):
    """price·(1−disc) with a 10⁻⁴-unit result exactly on a half-cent:
    12.25·(1−0.03) = 11.8825 → 11.88 half-up... pick 0.50·(1−0.15)
    = 0.425 → 0.43 (half-up) — pinned against the decimal spelling."""
    from reflinkcep_spark.queries.exact import (
        dec2,
        exact_sum2_from_unit4,
        unit4_revenue,
    )

    df = spark.createDataFrame([(0.50, 0.15)], "p double, d double")
    [row] = df.agg(
        exact_sum2_from_unit4(unit4_revenue("p", "d")).alias("fast"),
        F.round(F.sum(dec2("p") * (1 - dec2("d", "decimal(3,2)"))), 2)
        .cast("double")
        .alias("ref"),
    ).collect()
    assert row["fast"] == 0.43 == row["ref"]


def test_exact_sum2_survives_sums_beyond_double_precision(spark):
    """Past 2^53 cents a long→double divide would double-round; the
    final /100 runs in DECIMAL(38,0), so the result stays the correctly
    rounded double of the exact rational at any aggregate size."""
    from decimal import Decimal

    from reflinkcep_spark.queries.exact import exact_sum2_from_unit4, unit4_revenue

    # cent sum = 2*4.6e15 + 7 = 9.2e15 + 7 > 2^53 ≈ 9.007e15, and odd —
    # float64 cannot represent it, so naive long/100.0 double-rounds.
    rows = [(4.6e13,), (4.6e13,), (0.07,)]
    df = spark.createDataFrame(rows, "v double")
    [row] = df.agg(exact_sum2("v").alias("s")).collect()
    want = float(Decimal(9_200_000_000_000_007) / 100)  # exact-rational image
    assert row["s"] == want

    # same regime for the 10^-4-unit accumulator (price*(1-disc) units)
    df2 = spark.createDataFrame(
        [(4.6e13, 0.0), (4.6e13, 0.0), (0.07, 0.5)], "p double, d double"
    )
    [row2] = df2.agg(
        exact_sum2_from_unit4(unit4_revenue("p", "d")).alias("s")
    ).collect()
    # unit4 sum = 9.2e17 + 350 -> half-up to cents 9.2e15 + 4, /100
    assert row2["s"] == float(Decimal(9_200_000_000_000_004) / 100)


def test_exact_avg4_survives_sums_beyond_long_range(spark):
    """s*200 would overflow BIGINT once the cent sum passes ~4.6e16 —
    the final rounding runs in DECIMAL(38,0) so huge aggregates stay
    exact (DuckDB's side is HUGEINT natively)."""
    rows = [(9e12,)] * 60  # cent sum 5.4e16 -> s*200 = 1.08e19 > 2^63
    df = spark.createDataFrame(rows, "v double")
    [row] = df.agg(exact_avg4("v").alias("a")).collect()
    assert row["a"] == 9e12
