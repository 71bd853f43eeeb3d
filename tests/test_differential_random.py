"""Property-based differential testing: RANDOM event streams vs the
reference engine.

The systematic corpora (test_differential.py, tests/corpus.py) enumerate
the query grammar over the reference's FIXED 9-event stream — the same
blind spot the reference's own Flink harness has (exp/generate.py:132).
Here hypothesis fuzzes the other axis: a representative pattern set is
held fixed while streams of random length / types / attribute values are
generated, and both engines must produce identical ordered match
streams.  Shrinking gives a minimal counterexample stream on failure.

Skipped wholesale if the read-only reference checkout is unavailable.
"""

import sys

import pytest

sys.path.insert(0, "/root/reference")
pytest.importorskip("reflinkcep.operator", reason="reference checkout not available")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from tests.test_differential import (  # noqa: E402
    SIMPLE2,
    STRATEGIES,
    _combine,
    _lpat,
    _lpat_inf,
    _our_matches,
    _ref_matches,
    _spat,
)


def _gpat_times(child, frm, to):
    return {"type": "gpat-times", "child": child, "loop": {"from": frm, "to": to}}


def _gpat_inf(child, frm):
    return {"type": "gpat-inf", "child": child, "loop": {"from": frm}}

# Small attr domains maximize boundary collisions with the fixed
# condition constants (name == 1, price < 6, running sum <= 6).
events = st.tuples(
    st.sampled_from(["e", "f"]),
    st.integers(min_value=0, max_value=3),   # name
    st.integers(min_value=0, max_value=6),   # price
)
streams = st.lists(events, min_size=0, max_size=12)


def _mk_stream(raw):
    return [
        (t, {"id": i + 1, "name": n, "price": p})
        for i, (t, n, p) in enumerate(raw)
    ]


PATTERNS = [
    ("spat", _spat()),
    ("lpat-strict", _lpat("strict", 1, 3)),
    ("lpat-relaxed", _lpat("relaxed", 2, 3)),
    ("lpat-nd", _lpat("nd-relaxed", 1, 2)),
    ("lpat-optional", _lpat("strict", 0, 2)),
    ("lpat-iter", _lpat("strict", 1, 3, iterative=True)),
    ("lpat-inf", _lpat_inf("strict", 1)),
    ("lpat-inf-until", _lpat_inf("relaxed", 1, until="price >= 5")),
    ("combine-strict", _combine("strict", _spat("a"), _spat("b", SIMPLE2))),
    ("combine-relaxed", _combine("relaxed", _spat("a"), _spat("b", SIMPLE2))),
    ("combine-nd", _combine("nd-relaxed", _spat("a"), _spat("b", SIMPLE2))),
    (
        "combine-loop",
        _combine("relaxed", _lpat("strict", 1, 2, name="l"), _spat("b", SIMPLE2)),
    ),
    ("gpat-times", _gpat_times(_combine("strict", _spat("a"), _spat("b", SIMPLE2)), 1, 2)),
    ("gpat-inf", _gpat_inf(_combine("strict", _spat("a"), _spat("b", SIMPLE2)), 1)),
]


@pytest.mark.parametrize(
    "pname,pat",
    PATTERNS,
    ids=[p[0] for p in PATTERNS],
)
@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(raw=streams, strategy=st.sampled_from(STRATEGIES))
def test_engines_agree_on_random_streams(pname, pat, raw, strategy):
    stream = _mk_stream(raw)
    assert _our_matches(pat, strategy, stream=stream) == _ref_matches(
        pat, strategy, stream=stream
    )
