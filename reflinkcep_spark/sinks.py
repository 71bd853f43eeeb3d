"""Result sinks.

The reference engine's only sink is rendered text: matches written as
``name: type(attr,…), …; name2: …`` lines (reference exp/run.py:70-80
via Event.__repr__, event.py:19-22).  :func:`render_matches` reproduces
that format byte-for-byte so existing reference result files diff
cleanly against ours — the golden tests compare through it.

For data-scale output, :func:`write_matches` lands a match DataFrame as
partitioned parquet — matches are just rows here, so every Spark sink
(parquet/json/kafka/delta) works; this helper only standardizes layout.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Optional, Sequence

__all__ = ["render_match", "render_matches", "write_matches"]


def render_match(match: Mapping[str, list], type_of=None) -> str:
    """One match → the reference's one-line format.

    ``match`` maps capture name → list of attr dicts (the shape
    ``run_pattern``/``run_testcase`` return).  ``type_of`` optionally
    maps an event's attrs to its type tag; defaults to the constant
    ``'e'`` used by the whole reference corpus.
    """

    def ev(attrs: Mapping) -> str:
        t = type_of(attrs) if type_of else "e"
        return "{}({})".format(t, ",".join(str(v) for v in attrs.values()))

    return "; ".join(
        "{}: {}".format(name, ", ".join(ev(a) for a in evs))
        for name, evs in match.items()
    )


def render_matches(matches: Iterable[Mapping[str, list]], type_of=None) -> str:
    return "\n".join(render_match(m, type_of) for m in matches)


def write_matches(
    df,
    path: str,
    *,
    partition_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Write a match DataFrame as parquet, partitioned by the match key
    columns (a 100 TB match stream is read back by key, so colocate
    it).  Thin by design: any Spark sink works on match frames."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
