#!/usr/bin/env python3
"""Self-check mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf=0.01, compare row count, sorted column names, and values
(columns sorted by name, rows sorted by all columns).

Usage: python3 scripts/check_oracles.py [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the kind the driver's hash is
    sensitive to: int vs uint vs float vs bool vs object.  DuckDB
    HUGEINT and a nullable Spark BIGINT both come back as 'O'/'f'
    oddities sometimes; treat all-null object columns as wildcards."""
    k = s.dtype.kind
    if k == "O" and s.isna().all():
        return "*"
    return {"i": "i", "u": "i", "f": "f", "b": "b"}.get(k, "O")


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"row count {len(got)} != {len(want)}")
        return problems
    g, w = normalize(got), normalize(want)
    for col in g.columns:
        gc, wc = g[col], w[col]
        # The driver's value-hash is TYPE-sensitive: int64 13 and
        # float64 13.0 hash differently.  Every red driver row across
        # rounds 1-4 was exactly this class (oracle HUGEINT, Spark
        # percentile_disc DOUBLE), invisible to a values-only compare —
        # so fail loudly on any dtype-kind disagreement before (and in
        # addition to) the value check.
        gk, wk = _dtype_kind(gc), _dtype_kind(wc)
        if gk != wk and "*" not in (gk, wk):
            problems.append(
                f"col {col}: dtype kind mismatch spark={gc.dtype} "
                f"oracle={wc.dtype} (driver hash is type-sensitive)"
            )
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            # EXACT float equality (NaN==NaN): the driver hashes raw
            # values, so a tolerance here would hide real gate failures.
            gf, wf = gc.astype(float), wc.astype(float)
            neq = ~((gf == wf) | (gf.isna() & wf.isna()))
        else:
            # Elementwise != treats two nulls as different; mask
            # both-null positions explicitly.
            neq = (gc != wc) & ~(gc.isna() & wc.isna())
        if neq.any():
            i = int(neq.to_numpy().argmax())
            problems.append(
                f"col {col}: {int(neq.sum())} mismatches, first at row {i}: "
                f"{gc[i]!r} != {wc[i]!r}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from reflinkcep_spark.session import get_spark
    from reflinkcep_spark.sources import TABLES

    spark = get_spark(app_name="check-oracles")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            got = qs[name](spark, args.sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({elapsed:.1f}s) [rows-only]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL  {name}: ({elapsed:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(got)} rows ({elapsed:.1f}s)")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
