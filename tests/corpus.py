"""Systematic differential corpus: the reference's own four-division
query enumeration, re-generated in-process.

The reference validated itself against real Flink CEP by enumerating
13k+ query ASTs across four divisions (exp/gencsv.py:11) and diffing
ordered match streams.  We reproduce the same enumeration — same
condition choices, loop grids, contiguities, group loopings and
after-match strategies — from its generators:

* ``div-no-gpat``      — combine(spat, lpat, θ)           (exp/generate-nogpat.py:147-154)
* ``gpat-single``      — group(lpat)                      (exp/generate-gpat-single.py:177-184)
* ``gpat-combine``     — group(combine(spat, lpat, θ))    (exp/generate4.py:175-185)
* ``gpat-combine-gpat``— group₂(group₁(combine(…)))       (exp/generate-gpat-combine-gpat.py:190-201)

lpat family (exp/generate.py:44-93): condition ∈ {simple ``name == 2``,
iterative running-sum ``z1 + price <= 10``} × contiguity ∈ {strict,
relaxed, nd-relaxed} × quantifier ∈ {(0,3),(1,3),(3,3) bounded;
from∈{0,1} unbounded ± ``until name == 3``} = 42 variants.  Group
loopings (exp/generate.py:156-170): plain gpat, gpat-times over the
same grid, gpat-inf from∈{0,1} ± until = 10; the outer group of the
nested division uses the 3-choice tiny grid
(exp/generate-gpat-combine-gpat.py:172-185).

Streams: the reference's canonical 9-event stream
(exp/generate.py:134-138) never satisfies ``name == 3``, so its until
branches are enumerated but dead; we therefore run every case on a
second stream that fires until/iterative/type-mix paths (the one
test_differential.py's hand-written corpus uses).
"""

from __future__ import annotations

__all__ = ["CONTIGUITIES", "STRATEGIES", "STREAMS", "SCHEMA", "iter_division", "DIVISIONS"]

CONTIGUITIES = ["strict", "relaxed", "nd-relaxed"]
STRATEGIES = ["NoSkip", "SkipToNext", "SkipPastLastEvent"]
SCHEMA = {"e": ["id", "name", "price"], "f": ["id", "name", "price"]}

# exp/generate.py:134-138 — all type 'e'; no name==3 → until never fires.
_REF_STREAM = [
    ("e", {"id": i + 1, "name": n, "price": p})
    for i, (n, p) in enumerate(
        [(1, 0), (2, 5), (1, 0), (2, 2), (1, 0), (2, 2), (1, 0), (2, 5), (1, 8)]
    )
]

# Richer: name==3 fires `until name == 3`; a type-'f' event exercises
# the ignore edges of relaxed contiguity; price mix feeds z1+price<=10
# from several directions.
_RICH_STREAM = [
    ("e", {"id": 1, "name": 1, "price": 2}),
    ("e", {"id": 2, "name": 2, "price": 1}),
    ("e", {"id": 3, "name": 1, "price": 3}),
    ("f", {"id": 4, "name": 1, "price": 0}),
    ("e", {"id": 5, "name": 2, "price": 5}),
    ("e", {"id": 6, "name": 3, "price": 4}),
    ("e", {"id": 7, "name": 1, "price": 1}),
    ("e", {"id": 8, "name": 2, "price": 6}),
    ("e", {"id": 9, "name": 3, "price": 2}),
]

STREAMS = {"ref": _REF_STREAM, "rich": _RICH_STREAM}


def _spat():
    # exp/generate.py:34-40
    return {"type": "spat", "name": "ps", "event": "e", "cndt": {"expr": "name == 1"}}


def _iter_lpat():
    # exp/generate.py:44-93: 2 conditions × (3×3 bounded + 3×2×2 unbounded) = 42
    scndt = {"cndt": {"expr": "name == 2"}}
    icndt = {
        "cndt": {"expr": "z1 + price <= 10"},
        "variables": {"z1": {"update": "z1 + price", "initial": 0}},
    }
    loops = []
    for contiguity in CONTIGUITIES:
        for n, m in [(0, 3), (1, 3), (3, 3)]:
            loops.append(
                {"type": "lpat", "loop": {"contiguity": contiguity, "from": n, "to": m}}
            )
        for until in ({}, {"until": {"expr": "name == 3"}}):
            for n in (0, 1):
                loops.append(
                    {
                        "type": "lpat-inf",
                        "loop": {"contiguity": contiguity, "from": n},
                        **until,
                    }
                )
    for cndt in (scndt, icndt):
        for loop in loops:
            yield {"name": "pl", "event": "e", **cndt, **loop}


def _combine(left, right, theta):
    return {"type": "combine", "contiguity": theta, "left": left, "right": right}


def _loopings():
    # exp/generate.py:156-170: 1 + 3 + 2×2 = 10
    yield "g", {"type": "gpat"}
    for n, m in [(0, 3), (1, 3), (3, 3)]:
        yield f"t{n}{m}", {"type": "gpat-times", "loop": {"from": n, "to": m}}
    for until in ({}, {"until": {"expr": "name == 3"}}):
        for n in (0, 1):
            u = "u" if until else ""
            yield f"i{n}{u}", {"type": "gpat-inf", "loop": {"from": n}, **until}


def _tiny_loopings():
    # exp/generate-gpat-combine-gpat.py:172-185: 3 outer choices
    yield "g", {"type": "gpat"}
    yield "t03", {"type": "gpat-times", "loop": {"from": 0, "to": 3}}
    yield "i1", {"type": "gpat-inf", "loop": {"from": 1}}


def _group(child, looping):
    return {"child": child, **looping}


def iter_division(div: str):
    """Yield ``(case_id, pattern_ast)`` for one division."""
    if div == "div-no-gpat":
        for i, lpat in enumerate(_iter_lpat()):
            for theta in CONTIGUITIES:
                yield f"ng-{i}-{theta}", _combine(_spat(), lpat, theta)
    elif div == "gpat-single":
        for i, lpat in enumerate(_iter_lpat()):
            for lk, looping in _loopings():
                yield f"gs-{i}-{lk}", _group(dict(lpat), looping)
    elif div == "gpat-combine":
        for i, lpat in enumerate(_iter_lpat()):
            for theta in CONTIGUITIES:
                for lk, looping in _loopings():
                    yield (
                        f"gc-{i}-{theta}-{lk}",
                        _group(_combine(_spat(), lpat, theta), looping),
                    )
    elif div == "gpat-combine-gpat":
        for i, lpat in enumerate(_iter_lpat()):
            for theta in CONTIGUITIES:
                for lk, inner in _loopings():
                    for ok, outer in _tiny_loopings():
                        yield (
                            f"gg-{i}-{theta}-{lk}-{ok}",
                            _group(_group(_combine(_spat(), lpat, theta), inner), outer),
                        )
    else:  # pragma: no cover
        raise ValueError(f"unknown division {div!r}")


DIVISIONS = ["div-no-gpat", "gpat-single", "gpat-combine", "gpat-combine-gpat"]
