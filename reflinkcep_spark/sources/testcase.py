"""Loaders for the reference engine's on-disk artifacts.

A reflinkcep user owns two YAML dialects (reference exp/run.py:52-61,
exp/generate.py:138-143):

* **query files** — ``{type: query, patseq: …, context: …}``
  (example-patseq-asts/*.yml) → already accepted verbatim by
  :meth:`reflinkcep_spark.cep.query.Query.from_yaml`;
* **testcase files** — ``{query: <query dict>, input: [{type, attrs},
  …]}`` → loaded here, runnable on the pure-Python engine or as a
  Spark DataFrame through the batch kernel.

This makes the switchover story literal: point these loaders at the
files the reference runs today.
"""

from __future__ import annotations

from typing import Mapping, Optional

import yaml

from reflinkcep_spark.cep.query import Query

__all__ = ["load_testcase", "testcase_events_df", "run_testcase"]


def load_testcase(path_or_stream) -> tuple[Query, list[tuple[str, dict]]]:
    """Parse a reference testcase YAML into (Query, [(type, attrs)…])."""
    if hasattr(path_or_stream, "read"):
        tc = yaml.safe_load(path_or_stream)
    else:
        with open(path_or_stream) as f:
            tc = yaml.safe_load(f)
    query = Query.from_dict(tc["query"])
    events = [(e["type"], dict(e["attrs"])) for e in tc["input"]]
    return query, events


def testcase_events_df(spark, events: list[tuple[str, dict]], *,
                       type_col: str = "type", order_col: str = "seq"):
    """The testcase stream as a DataFrame: one row per event, arrival
    order in ``order_col``, one column per attribute (missing → NULL).
    Attribute values are integers throughout the reference corpus
    (reference defs.py:1)."""
    attr_keys: list[str] = []
    for _t, attrs in events:
        for k in attrs:
            if k not in attr_keys:
                attr_keys.append(k)
    rows = [
        tuple([i + 1, t] + [attrs.get(k) for k in attr_keys])
        for i, (t, attrs) in enumerate(events)
    ]
    schema = ", ".join(
        [f"{order_col} long", f"{type_col} string"]
        + [f"{k} long" for k in attr_keys]
    )
    return spark.createDataFrame(rows, schema)


def run_testcase(path_or_stream, spark=None) -> list[dict]:
    """Execute a reference testcase end to end.

    Without ``spark``: the pure-Python engine (drop-in for the
    reference's exp/run.py run_test).  With ``spark``: through the
    batch kernel on a single global stream, returning the same
    ``{name: [attrs…]}`` match dicts (in kernel emission order).
    """
    query, events = load_testcase(path_or_stream)
    if spark is None:
        from reflinkcep_spark.cep.runtime import run_pattern

        return run_pattern(query, events)

    from reflinkcep_spark.operators import match_pattern

    df = testcase_events_df(spark, events)
    attr_cols = [c for c in df.columns if c not in ("type",)]
    # Reference testcases are single total-order streams of a few
    # events by construction — the unkeyed-kernel single-task warning
    # is intended for production callers, not this replay path.
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message="match_pattern called without partition_by"
        )
        out = match_pattern(
            df, query, order_by="seq", partition_by=None, type_col="type",
            allow_fastpath=False,
        ).collect()
    results = []
    for row in sorted(out, key=lambda r: r["match_seq"]):
        m: dict = {}
        for name in query.names:
            evs = row[name]
            if evs is not None:
                m[name] = [
                    {k: e[k] for k in attr_cols if k != "seq" and e[k] is not None}
                    for e in evs
                ]
        results.append(m)
    return results
