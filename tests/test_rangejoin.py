"""interval_join semantics: inclusive bounds, multi-bucket intervals
matched exactly once, empty intervals dropped, key scoping, input
validation.  (Value-level parity vs DuckDB's native BETWEEN range join
is covered by scripts/check_oracles.py `q_range_join_clicks`.)"""

import pytest

from reflinkcep_spark.operators import interval_join


def _rows(df):
    return sorted(
        (r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()
    )


def test_inclusive_bounds_and_multibucket(spark):
    # bucket_width=10: interval 5..35 covers buckets 0..3; points on
    # both bounds match (inclusive), each pair appears exactly once
    points = spark.createDataFrame(
        [(1, 5), (2, 35), (3, 36), (4, 4), (5, 20)], "pid long, t long"
    )
    ivs = spark.createDataFrame([(100, 5, 35)], "iid long, s long, e long")
    out = interval_join(
        points, ivs, on="t", start="s", end="e", bucket_width=10
    )
    assert _rows(out) == [(1, 100), (2, 100), (5, 100)]


def test_key_scoping_and_overlapping_intervals(spark):
    points = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 10)], "k string, pid long, t long"
    )
    ivs = spark.createDataFrame(
        [("a", 100, 0, 20), ("a", 101, 10, 10), ("b", 102, 11, 20)],
        "k string, iid long, s long, e long",
    )
    out = interval_join(
        points, ivs, on="t", start="s", end="e", by="k", bucket_width=7
    )
    # point (a,10) is inside both of a's intervals; b's point misses
    assert _rows(out) == [(1, 100), (1, 101)]


def test_empty_intervals_dropped_and_validation(spark):
    points = spark.createDataFrame([(1, 10)], "pid long, t long")
    bad = spark.createDataFrame([(100, 20, 10)], "iid long, s long, e long")
    assert (
        interval_join(
            points, bad, on="t", start="s", end="e", bucket_width=5
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(points, bad, on="t", start="s", end="e", bucket_width=0)
    clash = spark.createDataFrame([(100, 1, 2)], "pid long, s long, e long")
    with pytest.raises(ValueError, match="collision"):
        interval_join(points, clash, on="t", start="s", end="e", bucket_width=5)
    with pytest.raises(ValueError, match="join key"):
        interval_join(
            points, bad, on="t", start="s", end="e", by="k", bucket_width=5
        )


# --- randomized differential vs a brute-force reference ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_pts = st.lists(
    st.tuples(st.sampled_from("ab"), st.integers(0, 120)),
    min_size=0, max_size=12,
)
_ivs = st.lists(
    st.tuples(
        st.sampled_from("ab"), st.integers(0, 120), st.integers(-5, 40)
    ),
    min_size=0, max_size=8,
)


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(raw_pts=_pts, raw_ivs=_ivs, width=st.sampled_from([1, 3, 7, 50]))
def test_interval_join_matches_bruteforce(spark, raw_pts, raw_ivs, width):
    pts = [(k, i, t) for i, (k, t) in enumerate(raw_pts)]
    ivs = [(k, 100 + j, s, s + d) for j, (k, s, d) in enumerate(raw_ivs)]
    want = sorted(
        (pid, iid)
        for (pk, pid, t) in pts
        for (ik, iid, s, e) in ivs
        if pk == ik and s <= t <= e
    )
    pdf = spark.createDataFrame(
        pts or [("z", -1, 0)], "k string, pid long, t long"
    )
    idf = spark.createDataFrame(
        ivs or [("z", -1, 1, 0)], "k string, iid long, s long, e long"
    )
    got = interval_join(
        pdf, idf, on="t", start="s", end="e", by="k", bucket_width=width
    )
    assert _rows(got) == (want if pts and ivs else [])
