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


@pytest.mark.parametrize("sname", sorted(STREAMS))
def test_within_decoupled_stamps_equal_stamp_span_postfilter(sname):
    """Same NoSkip algebra with the stamp DECOUPLED from the row
    offset — the time-based ``within`` path (operators' ``within_col``
    feeds event time while the order column stays a sequence number).
    Stamps grow super-linearly (i²) so stamp spans and offset spans
    disagree on almost every match: a kernel that accidentally pruned
    on offsets would fail nearly every bound here."""
    from reflinkcep_spark.cep.compiler import compile_query
    from reflinkcep_spark.cep.runtime import MatchEngine

    stream = [(t, dict(a)) for t, a in STREAMS[sname]]
    stamps = [i * i for i in range(len(stream))]  # monotone, uneven gaps

    def run_stamped(q, within):
        aut = compile_query(q)
        engine = MatchEngine(aut, q.strategy, within)
        out = []
        for (ev_type, attrs), stamp in zip(stream, stamps):
            for m in engine.feed(ev_type, attrs, stamp):
                out.append(
                    {
                        name: [stream[i][1] for i in idxs]
                        for name, idxs in m.captures.items()
                    }
                )
        return out

    def stamp_span(match):
        ids = [ev["id"] for evs in match.values() if evs for ev in evs]
        if not ids:
            return 0
        # ids are 1-based in the canonical streams (id == position + 1)
        return stamps[max(ids) - 1] - stamps[min(ids) - 1]

    bad = []
    n = 0
    for cid, pat in _cases():
        q = Query.from_dict(
            {"patseq": pat, "context": {"schema": SCHEMA, "strategy": "NoSkip"}}
        )
        unbounded = run_pattern(q, stream)
        for w in (0, 4, 25, 64):  # stamp-domain bounds (i² gaps)
            n += 1
            got = run_stamped(q, w)
            want = [m for m in unbounded if stamp_span(m) <= w]
            if got != want:
                bad.append((cid, w, len(got), len(want)))
    assert not bad, (
        f"{len(bad)}/{n} stamped-within-vs-postfilter disagreements on "
        f"stream {sname}: {bad[:5]}"
    )
    assert n > 600
