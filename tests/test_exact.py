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
