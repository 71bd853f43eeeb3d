"""Property pin for `within` under NoSkip: pruning ≡ post-filtering.

Under NoSkip every run is independent — no emitted match ever alters
another run's fate — so the span bound has a closed-form oracle: the
within-bounded match stream must equal the UNBOUNDED stream filtered
to matches whose captured span (max − min captured row offset) is
≤ the bound, in the same emission order.  The streaming kernel's
run-state pruning and the fast path's emission-equivalent span filter
are both built on this identity (cep/runtime.py `within`,
operators/fastpath.py), so it deserves an enumeration-level pin, not
just the two hand queries in test_spark_kernel.py.

(The identity does NOT hold for skip strategies — SkipToNext /
SkipPastLastEvent discard runs based on which matches were EMITTED,
so bounding emission changes later matches.  `within` composes with
those strategies as "prune first, then skip", which the batch/stream
equality tests pin on real data; this file pins the NoSkip algebra.)

Cases come from the same reference-shaped enumeration the
differential corpus uses (tests/corpus.py) — the full div-no-gpat
division plus a stride of gpat-single — over both canonical streams
and every span bound from degenerate to no-op.
"""

from __future__ import annotations

import pytest

from reflinkcep_spark import Query, run_pattern

from tests.corpus import SCHEMA, STREAMS, iter_division

BOUNDS = (0, 2, 5, 8)  # degenerate, tight, mid, nearly-unbounded


def _span(match: dict) -> int:
    ids = [ev["id"] for evs in match.values() if evs for ev in evs]
    return max(ids) - min(ids) if ids else 0


def _cases():
    for cid, pat in iter_division("div-no-gpat"):
        yield cid, pat
    for i, (cid, pat) in enumerate(iter_division("gpat-single")):
        if i % 5 == 0:
            yield cid, pat


@pytest.mark.parametrize("sname", sorted(STREAMS))
def test_within_noskip_equals_span_postfilter(sname):
    stream = [(t, dict(a)) for t, a in STREAMS[sname]]
    bad = []
    n = 0
    for cid, pat in _cases():
        q = Query.from_dict(
            {"patseq": pat, "context": {"schema": SCHEMA, "strategy": "NoSkip"}}
        )
        unbounded = run_pattern(q, stream)
        for w in BOUNDS:
            n += 1
            got = run_pattern(q, stream, within=w)
            want = [m for m in unbounded if _span(m) <= w]
            if got != want:
                bad.append((cid, w, len(got), len(want)))
    assert not bad, (
        f"{len(bad)}/{n} within-vs-postfilter disagreements on "
        f"stream {sname}: {bad[:5]}"
    )
    assert n > 600  # the enumeration actually ran
