"""Differential testing: our engine vs the reference engine as oracle.

Mirrors the reference's own validation strategy (its exp/ harness
enumerated 13,482 queries against real Flink CEP): enumerate the query
grammar — condition {simple, iterative} × contiguity {strict, relaxed,
nd-relaxed} × quantifier {n..m, n..inf, optional, ±until} × combine ×
group quantifiers × after-match strategy — over a fixed 9-event input,
run BOTH engines, and require identical ordered match streams.

The enumeration below is our own; it deliberately avoids the two
constructs the reference cannot compile (non-leaf right child of a
non-strict combine; group pattern not at the head — SURVEY.md §2.3) and
includes one case pinning the reference's "until on finite lpat is
silently ignored" quirk, which we replicate for parity.

Skipped wholesale if the read-only reference checkout is unavailable.
"""

import sys

import pytest

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip("reflinkcep.operator", reason="reference checkout not available")

from reflinkcep.ast import Query as RefQuery  # noqa: E402
from reflinkcep.event import Event as RefEvent  # noqa: E402
from reflinkcep.operator import CEPOperator  # noqa: E402

from reflinkcep_spark import Query, run_pattern  # noqa: E402

# Fixed input: 9 events, two types, attrs (id, name, price).  names hit
# the conditions' constants from several directions; type 'f' events
# exercise the per-other-type ignore edges of relaxed contiguity.
STREAM = [
    ("e", {"id": 1, "name": 1, "price": 2}),
    ("e", {"id": 2, "name": 2, "price": 1}),
    ("e", {"id": 3, "name": 1, "price": 3}),
    ("f", {"id": 4, "name": 1, "price": 0}),
    ("e", {"id": 5, "name": 1, "price": 5}),
    ("e", {"id": 6, "name": 3, "price": 4}),
    ("e", {"id": 7, "name": 1, "price": 1}),
    ("e", {"id": 8, "name": 2, "price": 6}),
    ("e", {"id": 9, "name": 1, "price": 2}),
]
SCHEMA = {"e": ["id", "name", "price"], "f": ["id", "name", "price"]}

SIMPLE = {"expr": "name == 1"}
SIMPLE2 = {"expr": "price < 6"}
ITER = {
    "cndt": {"expr": "name == 1 and X + price <= 6"},
    "variables": {"X": {"update": "X + price", "initial": 0}},
}
CONTIGUITIES = ["strict", "relaxed", "nd-relaxed"]
STRATEGIES = ["NoSkip", "SkipToNext", "SkipPastLastEvent"]


def _spat(name="ps", cndt=SIMPLE, event="e"):
    return {"type": "spat", "name": name, "event": event, "cndt": dict(cndt)}


def _lpat(contig, frm, to, cndt=SIMPLE, name="pl", iterative=False):
    node = {
        "type": "lpat",
        "name": name,
        "event": "e",
        "cndt": dict(cndt),
        "loop": {"contiguity": contig, "from": frm, "to": to},
    }
    if iterative:
        node["cndt"] = dict(ITER["cndt"])
        node["variables"] = ITER["variables"]
    return node


def _lpat_inf(contig, frm, until=None, name="pl", iterative=False):
    node = {
        "type": "lpat-inf",
        "name": name,
        "event": "e",
        "cndt": dict(ITER["cndt"]) if iterative else dict(SIMPLE),
        "loop": {"contiguity": contig, "from": frm},
    }
    if iterative:
        node["variables"] = ITER["variables"]
    if until is not None:
        node["until"] = {"expr": until}
    return node


def _combine(contig, left, right):
    return {"type": "combine", "contiguity": contig, "left": left, "right": right}


def _patterns():
    pats = []
    # Leaves
    pats.append(("spat", _spat()))
    pats.append(("spat2", _spat(cndt=SIMPLE2)))
    # Bounded loops: quantifier × contiguity × condition kind
    for contig in CONTIGUITIES:
        for frm, to in [(0, 2), (1, 2), (2, 2), (2, 3)]:
            pats.append((f"lpat-{contig}-{frm}-{to}", _lpat(contig, frm, to)))
        pats.append((f"lpat-ic-{contig}", _lpat(contig, 1, 3, iterative=True)))
    # Unbounded loops: from × until × contiguity × condition kind
    for contig in CONTIGUITIES:
        for frm in (0, 1, 2):
            pats.append((f"lpinf-{contig}-{frm}", _lpat_inf(contig, frm)))
            pats.append(
                (f"lpinf-u-{contig}-{frm}", _lpat_inf(contig, frm, until="price >= 4"))
            )
        pats.append((f"lpinf-ic-{contig}", _lpat_inf(contig, 1, iterative=True)))
    # until on finite lpat: both engines silently ignore it (quirk parity)
    quirk = _lpat("strict", 1, 2)
    quirk["until"] = {"expr": "price >= 4"}
    pats.append(("lpat-until-quirk", quirk))
    # Sequences: left kind × contiguity (right must be a leaf for
    # non-strict combine — reference limitation, SURVEY.md §2.3)
    lefts = [
        ("spat", _spat(name="a")),
        ("lpat", _lpat("strict", 1, 2, name="a")),
        ("lpinf", _lpat_inf("relaxed", 1, name="a")),
    ]
    for contig in CONTIGUITIES:
        for lname, left in lefts:
            pats.append(
                (
                    f"cat-{contig}-{lname}",
                    _combine(contig, left, _spat(name="b", cndt=SIMPLE2)),
                )
            )
    # Three-element strict chain (nested combine on the left is legal)
    pats.append(
        (
            "cat-chain3",
            _combine(
                "strict",
                _combine("strict", _spat(name="a"), _spat(name="b", cndt=SIMPLE2)),
                _spat(name="c", cndt={"expr": "price > 0"}),
            ),
        )
    )
    # Groups (at the head only): quantified and unbounded, ± until
    child = _combine("strict", _spat(name="a"), _spat(name="b", cndt=SIMPLE2))
    for frm, to in [(0, 2), (1, 2), (2, 2)]:
        pats.append(
            (
                f"gtimes-{frm}-{to}",
                {"type": "gpat-times", "child": child, "loop": {"from": frm, "to": to}},
            )
        )
    for frm in (0, 1):
        for until in (None, "price >= 5"):
            node = {"type": "gpat-inf", "child": child, "loop": {"from": frm}}
            if until:
                node["until"] = {"expr": until}
            pats.append((f"ginf-{frm}-{bool(until)}", node))
    # Plain group wrapper
    pats.append(("gpat-id", {"type": "gpat", "child": child}))
    # Groups over a loop child (the reference's weakest division,
    # gpat-single: 55.9% Flink agreement — OUR oracle is the reference
    # itself, so full parity is required here regardless)
    for contig in ("strict", "relaxed"):
        lchild = _lpat(contig, 1, 2, name="g")
        for frm, to in [(1, 2), (2, 2)]:
            pats.append(
                (
                    f"gtimes-lpat-{contig}-{frm}-{to}",
                    {
                        "type": "gpat-times",
                        "child": lchild,
                        "loop": {"from": frm, "to": to},
                    },
                )
            )
        pats.append(
            (
                f"ginf-lpat-{contig}",
                {"type": "gpat-inf", "child": lchild, "loop": {"from": 1}},
            )
        )
    # Iterative-condition left side of a sequence
    for contig in CONTIGUITIES:
        pats.append(
            (
                f"cat-ic-{contig}",
                _combine(
                    contig,
                    _lpat(contig, 1, 3, name="a", iterative=True),
                    _spat(name="b", cndt=SIMPLE2),
                ),
            )
        )
    # Optional loop inside a sequence (empty-capture propagation)
    pats.append(
        (
            "cat-optional-left",
            _combine("strict", _lpat("strict", 0, 2, name="a"), _spat(name="b")),
        )
    )
    # until that can never fire / always fires immediately
    pats.append(("lpinf-u-never", _lpat_inf("relaxed", 1, until="price >= 100")))
    pats.append(("lpinf-u-always", _lpat_inf("relaxed", 1, until="price >= 0")))
    # Denser quantifier × condition × contiguity grid
    for contig in CONTIGUITIES:
        for frm, to in [(1, 1), (1, 3), (0, 3), (3, 3), (0, 1)]:
            pats.append((f"lp2-{contig}-{frm}-{to}", _lpat(contig, frm, to)))
            pats.append(
                (
                    f"lp2p-{contig}-{frm}-{to}",
                    _lpat(contig, frm, to, cndt=SIMPLE2),
                )
            )
        pats.append((f"lp2-true-{contig}", _lpat(contig, 2, 3, cndt={"expr": "True"})))
        pats.append((f"lpinf3-{contig}", _lpat_inf(contig, 3)))
        pats.append(
            (f"lpinf3-u-{contig}", _lpat_inf(contig, 3, until="name == 3"))
        )
    # Sequences with loop right sides under strict combine (legal: the
    # leaf-right restriction only binds non-strict combines)
    for rcontig in CONTIGUITIES:
        pats.append(
            (
                f"cat-strict-lpatright-{rcontig}",
                _combine(
                    "strict",
                    _spat(name="a"),
                    _lpat(rcontig, 1, 2, name="b", cndt=SIMPLE2),
                ),
            )
        )
        pats.append(
            (
                f"cat-strict-lpinfright-{rcontig}",
                _combine("strict", _spat(name="a"), _lpat_inf(rcontig, 2, name="b")),
            )
        )
    # Three-element chains mixing contiguities (right still a leaf)
    for c1 in CONTIGUITIES:
        for c2 in CONTIGUITIES:
            pats.append(
                (
                    f"chain-{c1}-{c2}",
                    _combine(
                        c2,
                        _combine(c1, _spat(name="a"), _spat(name="b", cndt=SIMPLE2)),
                        _spat(name="c", cndt={"expr": "price > 0"}),
                    ),
                )
            )
    # Four-element chains: deeper nesting through the deterministic
    # (strict/relaxed) and cross-product (nd-relaxed) fast-path shapes
    for cs in (
        ("relaxed", "relaxed", "relaxed"),
        ("strict", "relaxed", "strict"),
        ("relaxed", "strict", "relaxed"),
        ("nd-relaxed", "nd-relaxed", "nd-relaxed"),
    ):
        pats.append(
            (
                f"chain4-{'-'.join(c[:2] for c in cs)}",
                _combine(
                    cs[2],
                    _combine(
                        cs[1],
                        _combine(cs[0], _spat(name="a"), _spat(name="b", cndt=SIMPLE2)),
                        _spat(name="c", cndt={"expr": "price > 0"}),
                    ),
                    _spat(name="d", cndt={"expr": "price < 9"}),
                ),
            )
        )
    # Group-of-group nesting (gpat wrapper inside a quantified group)
    inner = {"type": "gpat", "child": _combine("strict", _spat(name="a"), _spat(name="b", cndt=SIMPLE2))}
    pats.append(
        ("gtimes-nested", {"type": "gpat-times", "child": inner, "loop": {"from": 1, "to": 2}})
    )
    # Iterative condition on the unbounded group child
    ic_child = _combine("strict", _lpat("strict", 1, 2, name="a", iterative=True), _spat(name="b", cndt=SIMPLE2))
    pats.append(
        ("ginf-ic", {"type": "gpat-inf", "child": ic_child, "loop": {"from": 1}})
    )
    # Group patterns on the RIGHT of a strict combine (legal there: the
    # leaf-right restriction, SURVEY.md §2.3, binds non-strict only)
    gchild = _combine("strict", _spat(name="x", cndt=SIMPLE2), _spat(name="y"))
    pats.append(
        (
            "cat-gpat-right",
            _combine("strict", _spat(name="h"), {"type": "gpat", "child": gchild}),
        )
    )
    pats.append(
        (
            "cat-gtimes-right",
            _combine(
                "strict",
                _spat(name="h"),
                {"type": "gpat-times", "child": gchild, "loop": {"from": 1, "to": 2}},
            ),
        )
    )
    return pats


CASES = [
    (f"{pname}/{strat}", pat, strat)
    for pname, pat in _patterns()
    for strat in STRATEGIES
]


def _ref_matches(pat, strategy, stream=STREAM, schema=SCHEMA):
    ctx = {"schema": schema, "strategy": strategy}
    q = RefQuery.from_dict({"patseq": pat, "context": ctx})
    op = CEPOperator.from_query(q)
    out = op << [RefEvent(t, dict(a)) for t, a in stream]
    return [
        {name: [e["id"] for e in evs] for name, evs in m.items()} for m in out
    ]


def _our_matches(pat, strategy, stream=STREAM, schema=SCHEMA):
    q = Query.from_dict({"patseq": pat, "context": {"schema": schema, "strategy": strategy}})
    out = run_pattern(q, [(t, dict(a)) for t, a in stream])
    return [
        {name: [e["id"] for e in evs] for name, evs in m.items()} for m in out
    ]


@pytest.mark.parametrize("cid,pat,strategy", CASES, ids=[c[0] for c in CASES])
def test_engines_agree(cid, pat, strategy):
    assert _our_matches(pat, strategy) == _ref_matches(pat, strategy)


# --- Reference-scale systematic enumeration (tests/corpus.py) --------------
#
# The reference proved itself against Flink with a ~13k-case four-division
# enumeration (exp/gencsv.py:11); tests/corpus.py regenerates it and runs
# every case on TWO streams (the reference's canonical one plus a richer
# stream that actually fires the until/type-mix branches) — ~27k
# engine-pair comparisons.  Chunked per (division × strategy × stream) so
# pytest stays at 24 parametrized tests; a failed chunk reports its first
# diffs and the total disagreement count.

from tests.corpus import (  # noqa: E402
    DIVISIONS as _DIVS,
    SCHEMA as _DIV_SCHEMA,
    STREAMS as _DIV_STREAMS,
    iter_division,
)

_DIV_CHUNKS = [
    (div, strat, sname)
    for div in _DIVS
    for strat in STRATEGIES
    for sname in _DIV_STREAMS
]


@pytest.mark.parametrize(
    "div,strategy,sname",
    _DIV_CHUNKS,
    ids=[f"{d}/{s}/{n}" for d, s, n in _DIV_CHUNKS],
)
def test_division_corpus_agrees(div, strategy, sname):
    stream = _DIV_STREAMS[sname]
    diffs = []
    n = 0
    for cid, pat in iter_division(div):
        n += 1
        ref = _ref_matches(pat, strategy, stream=stream, schema=_DIV_SCHEMA)
        ours = _our_matches(pat, strategy, stream=stream, schema=_DIV_SCHEMA)
        if ours != ref:
            diffs.append((cid, ours, ref))
    assert not diffs, (
        f"{len(diffs)}/{n} cases disagree in {div}/{strategy}/{sname}; "
        f"first 3: {diffs[:3]}"
    )


def test_corpus_is_substantial():
    assert len(CASES) >= 200
    total = sum(1 for div in _DIVS for _ in iter_division(div))
    # 42 lpats drive 126 + 420 + 1260 + 3780 patterns; × 3 strategies
    # × 2 streams ≈ 33.5k engine-pair comparisons incl. CASES.
    assert total * len(STRATEGIES) * len(_DIV_STREAMS) >= 26000
