"""The round-14 `_pre_spread` join-back optimization must be invisible.

`sources.tables.spread` attaches the pre-repartition frame as
``df._pre_spread``; `importance_weights` and the two global paragraph
dedups read it (when present) for their id-only join-back projection,
which is row-set-invariant to partitioning.  Pin that a frame WITH the
attribute and the same frame WITHOUT it produce identical output — the
optimization may change the plan (one fewer round-robin exchange),
never the result.
"""

import pytest

from reflinkcep_spark.functions import text
from reflinkcep_spark.functions.sampling import importance_weights

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta alpha beta gamma delta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, ""),                         # empty doc: join-back must restore it
        (3, "one two"),                  # sub-n-gram doc for importance_weights
        (4, "alpha beta gamma delta alpha beta gamma delta"),
        (5, "unique words only here nothing shared at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _with_pre_spread(df):
    out = df.repartition(8)
    out._pre_spread = df
    return out


def _sorted(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize(
    "fn",
    [
        lambda d: importance_weights(
            d, F.col("doc_id") % 2 == 0, n=2, buckets=64
        ).orderBy("doc_id"),
        lambda d: text.dedup_paragraphs_global(d, unit_tokens=2).orderBy("doc_id"),
        lambda d: text.dedup_paragraphs_global_fuzzy(
            d, unit_tokens=2, shingle_n=2
        ).orderBy("doc_id"),
    ],
    ids=["importance_weights", "paragraphs_global", "paragraphs_global_fuzzy"],
)
def test_pre_spread_attribute_does_not_change_output(spark, fn):
    plain = _docs(spark)
    spreadlike = _with_pre_spread(plain)
    assert _sorted(fn(plain)) == _sorted(fn(spreadlike))
    # every input doc keeps a row through the id-only join-back
    assert {r[0] for r in fn(spreadlike).collect()} == {0, 1, 2, 3, 4, 5}
