"""salted_join ≡ plain join on skewed data (inner and left)."""

from pyspark.sql import functions as F

from reflinkcep_spark.operators.skew import salted_join


def _frames(spark):
    # 90% of left rows share one hot key.
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 50, 2)], "k long, label string"
    )
    return left, right


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain(spark):
    left, right = _frames(spark)
    assert _canon(salted_join(left, right, "k", salt=4)) == _canon(
        left.join(right, "k")
    )


def test_salted_left_equals_plain(spark):
    left, right = _frames(spark)
    assert _canon(salted_join(left, right, "k", salt=4, how="left")) == _canon(
        left.join(right, "k", "left")
    )
