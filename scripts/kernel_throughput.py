#!/usr/bin/env python3
"""Single-core NFA throughput: our runtime vs the reference engine.

Same query (relaxed signup→purchase sequence), same synthetic stream.
The reference advances configurations by deepcopy per transition
(reference DST.py:141-166); our runtime uses shared-tail cons-list
captures + copy-on-write environments, measured ~5-6x faster per core
— before the Spark kernel multiplies it by the cluster width.

Usage: python3 scripts/kernel_throughput.py [N_EVENTS]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q_YAML = """
type: query
patseq:
  type: combine
  contiguity: relaxed
  left: {type: spat, name: a, event: signup, cndt: {expr: "True"}}
  right: {type: spat, name: b, event: purchase, cndt: {expr: value > 50}}
context:
  schema: {signup: [], purchase: [], error: [], click: [], view: []}
"""
TYPES = ["signup", "purchase", "error", "click", "view"]


def gen(n: int):
    rng = random.Random(42)
    return [
        (rng.choice(TYPES), {"id": i, "value": int(rng.uniform(0, 200))})
        for i in range(n)
    ]


def ours(events) -> tuple[float, int]:
    from reflinkcep_spark import Query
    from reflinkcep_spark.cep.compiler import compile_query
    from reflinkcep_spark.cep.runtime import MatchEngine

    q = Query.from_yaml(Q_YAML)
    eng = MatchEngine(compile_query(q), q.strategy)
    t0 = time.perf_counter()
    nm = sum(len(eng.feed(t, a)) for t, a in events)
    return time.perf_counter() - t0, nm


def reference(events) -> tuple[float, int] | None:
    sys.path.append("/root/reference")
    try:
        import yaml
        from reflinkcep.ast import Query as RQ
        from reflinkcep.event import Event
        from reflinkcep.operator import CEPOperator
    except ImportError:
        return None
    op = CEPOperator.from_query(RQ.from_dict(yaml.safe_load(Q_YAML)))
    evs = [Event(t, dict(a)) for t, a in events]
    t0 = time.perf_counter()
    out = op << evs
    return time.perf_counter() - t0, len(out)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    events = gen(n)
    dt, nm = ours(events)
    print(f"ours:      {n / dt / 1e3:8.1f}k ev/s  ({nm} matches, {dt:.2f}s, n={n})")
    ref = reference(events)
    if ref is None:
        print("reference: unavailable (no /root/reference checkout)")
        return 0
    rdt, rnm = ref
    assert rnm == nm, f"match count diverged: ours {nm} vs reference {rnm}"
    print(f"reference: {n / rdt / 1e3:8.1f}k ev/s  ({rnm} matches, {rdt:.2f}s)")
    print(f"speedup:   {rdt / dt:.1f}x per core")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
