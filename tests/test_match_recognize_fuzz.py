"""Differential fuzz for SQL:2016 match selection (round 14).

An INDEPENDENT reference implementation of row-pattern matching for
the front end's flat strict subset — per-quantifier lexicographic
backtracking (greedy tries the longest extent first, reluctant the
shortest; earlier pattern variables dominate) with AFTER MATCH SKIP
start advancement — compared against the full Spark pipeline
(`match_recognize`: parser → AST → NoSkip kernel → per-start fold →
`_sql_select` → measures projection) on seeded random patterns and
streams.  The hand pins in test_match_recognize.py check chosen
examples; this checks the ALGEBRA: lexicographic-max over the feasible
assignment set must equal greedy backtracking by construction, so any
disagreement is an enumeration, fold, skip, or projection bug.

Kept deterministic (seeded) so CI failures reproduce.
"""

from __future__ import annotations

import random

import pytest

from reflinkcep_spark.cep.match_recognize import match_recognize


def _max_run(feas_row, pos, n):
    L = 0
    while pos + L < n and feas_row[pos + L]:
        L += 1
    return L


def _preferred(feas, s, quants, n, prefer):
    """Lexicographic-preferred assignment for a match starting at row
    ``s``: per-variable segment lengths chosen left to right, greedy
    trying longest first / reluctant shortest first, backtracking on
    failure.  ``feas[i][r]`` = row r satisfies variable i's condition.
    Returns [(seg_start, seg_len), …] or None."""

    def rec(i, pos):
        if i == len(quants):
            return []
        lo, hi = quants[i]
        cap = _max_run(feas[i], pos, n)
        hi_eff = cap if hi is None else min(hi, cap)
        if hi_eff < lo:
            return None
        order = (
            range(hi_eff, lo - 1, -1)
            if prefer == "longest"
            else range(lo, hi_eff + 1)
        )
        for L in order:
            rest = rec(i + 1, pos + L)
            if rest is not None:
                return [(pos, L)] + rest
        return None

    got = rec(0, s)
    if got is not None and sum(L for _p, L in got) == 0:
        return None  # nothing anchored (translate forbids this anyway)
    return got


def _reference(values, thresholds, quants, prefer, skip_mode):
    """All matches for one key per SQL:2016 selection: scan starts in
    row order, emit the preferred assignment per eligible start,
    advance per the skip mode.  Variable i's condition is
    ``value > thresholds[i]`` (None = undefined, matches any row)."""
    n = len(values)
    feas = [
        [True] * n if t is None else [v > t for v in values]
        for t in thresholds
    ]
    out = []
    min_start = 0
    for s in range(n):
        if s < min_start:
            continue
        segs = _preferred(feas, s, quants, n, prefer)
        if segs is None:
            continue
        # anchor on captured rows only (a leading L=0 variable does
        # not shift the match start)
        pos = [
            (i, p, L) for i, (p, L) in enumerate(segs) if L > 0
        ]
        start = min(p for _i, p, _L in pos)
        end = max(p + L - 1 for _i, p, L in pos)
        if start < min_start:
            continue
        out.append((start, end, segs))
        if skip_mode == "past_last":
            min_start = end + 1
        else:  # to_next
            min_start = start + 1
    return out


def _case(seed):
    rng = random.Random(seed)
    k = rng.randint(2, 4)
    prefer = rng.choice(["longest", "shortest"])
    skip_mode = rng.choice(["past_last", "to_next"])
    quant_pool = [(1, 1), (0, 1), (1, None), (0, None), (1, 3), (2, 2)]
    while True:
        quants = [rng.choice(quant_pool) for _ in range(k)]
        if sum(lo for lo, _hi in quants) >= 1:
            break
    thresholds = [
        rng.choice([None, 2, 5, 8]) for _ in range(k)
    ]
    n = rng.randint(8, 16)
    values = [float(rng.randint(0, 10)) for _ in range(n)]
    return prefer, skip_mode, quants, thresholds, values


def _spec(prefer, skip_mode, quants, thresholds):
    names = [f"V{i}" for i in range(len(quants))]
    pats = []
    for name, (lo, hi) in zip(names, quants):
        if (lo, hi) == (1, 1):
            pats.append(name)
        elif (lo, hi) == (0, 1):
            pats.append(f"{name}?")
        elif hi is None:
            pats.append(f"{name}{'+' if lo == 1 else '{%d,}' % lo}")
        else:
            pats.append(f"{name}{{{lo},{hi}}}")
        if (lo, hi) != (1, 1) and prefer == "shortest":
            pats[-1] += "?"
    measures = ", ".join(
        f"COUNT({v}.*) AS n_{v.lower()}, FIRST({v}.event_id) AS f_{v.lower()}, "
        f"LAST({v}.event_id) AS l_{v.lower()}"
        for v in names
    )
    defines = ", ".join(
        f"{v} AS {v}.value > {t}"
        for v, t in zip(names, thresholds)
        if t is not None
    )
    skip = (
        "AFTER MATCH SKIP PAST LAST ROW"
        if skip_mode == "past_last"
        else "AFTER MATCH SKIP TO NEXT ROW"
    )
    spec = (
        f"PARTITION BY user_id ORDER BY event_id MEASURES {measures} "
        f"{skip} PATTERN ({' '.join(pats)})"
    )
    if defines:
        spec += f" DEFINE {defines}"
    return spec, names


SEEDS = list(range(40))


@pytest.mark.parametrize("batch", [SEEDS[:14], SEEDS[14:27], SEEDS[27:]])
def test_sql_selection_matches_backtracking_reference(spark, batch):
    for seed in batch:
        prefer, skip_mode, quants, thresholds, values = _case(seed)
        # reluctant-on-singleton is meaningless; _spec only marks
        # flexible quantifiers reluctant, so a shortest case with all
        # fixed extents degenerates to greedy — fine, same semantics.
        spec, names = _spec(prefer, skip_mode, quants, thresholds)
        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(values)],
            "user_id int, event_id int, value double",
        )
        got = sorted(
            tuple(r)
            for r in match_recognize(df, spec).collect()
        )

        want = []
        for seq, (_start, _end, segs) in enumerate(
            _reference(values, thresholds, quants, prefer, skip_mode)
        ):
            row = [1, seq]
            for pos, L in segs:
                row += [
                    L,
                    pos if L else None,
                    pos + L - 1 if L else None,
                ]
            want.append(tuple(row))
        assert got == sorted(want), (
            f"seed {seed}: spec={spec!r} values={values} "
            f"got={got} want={sorted(want)}"
        )
