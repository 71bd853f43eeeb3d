"""Catalyst fast paths for patterns that don't need the NFA kernel.

Three pattern shapes run entirely JVM-side (whole-stage codegen, no
Python, no Arrow transfer):

1. **Single ``spat``** → a plain ``filter`` — predicate pushdown can
   reach the parquet scan.
2. **All-strict chains of ``spat``** (``a · b · c``) → ``lead()``
   window conjunctions: a match is L consecutive rows each satisfying
   its leaf condition.
3. **Strict, non-iterative bounded loops** (``lpat`` with
   ``contiguity: strict``, no data variables, no until) → a sliding
   ``collect_list`` window + higher-order functions computing the
   satisfying-prefix length, exploded into one row per admissible
   length.

Output schema matches the kernel's
(keys | match_seq | start_ord | end_ord | per-name capture arrays), so
``match_pattern`` can dispatch transparently.  Match *sets* are
identical to the kernel; emission order (hence ``match_seq``
numbering) can differ for shape 3, where the kernel orders by
completion event and the fast path by start.  Fast paths decline
(return ``None``) whenever after-match skip strategies or iterative
state would change results — those run in the kernel.

Equivalence with the kernel is asserted over the golden corpus in
tests/test_fastpath.py.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflinkcep_spark.cep.expr import to_sql
from reflinkcep_spark.cep.query import Query

__all__ = ["try_fast_path"]


def _strict_spat_chain(node: Mapping) -> Optional[list[Mapping]]:
    """Flatten ``node`` into a list of spat leaves if it is an
    all-strict concatenation of simple (variable-free) spats."""
    t = node["type"]
    if t == "spat":
        return None if node.get("variables") else [node]
    if t == "gpat":
        return _strict_spat_chain(node["child"])
    if t == "combine" and node["contiguity"] == "strict":
        left = _strict_spat_chain(node["left"])
        right = _strict_spat_chain(node["right"])
        if left is not None and right is not None:
            return left + right
    return None


def _strict_simple_lpat(node: Mapping) -> Optional[Mapping]:
    if (
        node["type"] == "lpat"
        and node["loop"]["contiguity"] == "strict"
        and not node.get("variables")
        and "until" not in node  # until on finite lpat is a no-op anyway
    ):
        return node
    return None


def _leaf_condition_sql(
    leaf: Mapping, type_col: Optional[str], column_map: Mapping[str, str] | None = None
) -> str:
    sql = to_sql(str(leaf["cndt"]["expr"]), column_map)
    if type_col is not None:
        tc = (column_map or {}).get(type_col, type_col)
        ev = str(leaf["event"]).replace("'", "''")
        sql = f"({tc} = '{ev}') AND ({sql})"
    return sql


def try_fast_path(
    df: DataFrame,
    query: Query,
    *,
    order_by: str,
    keys: Sequence[str],
    type_col: Optional[str],
    attr_cols: Sequence[str],
) -> Optional[DataFrame]:
    """Return a pure-DataFrame plan for ``query`` or ``None``."""
    try:
        chain = _strict_spat_chain(query.patseq)
        if chain is not None:
            if len(chain) > 1 and query.strategy == "SkipPastLastEvent":
                return None
            names = [leaf["name"] for leaf in chain]
            if len(set(names)) != len(names):
                return None
            return _plan_spat_chain(
                df, chain, order_by=order_by, keys=keys,
                type_col=type_col, attr_cols=attr_cols,
            )
        lpat = _strict_simple_lpat(query.patseq)
        if lpat is not None and query.strategy == "NoSkip":
            return _plan_strict_lpat(
                df, lpat, order_by=order_by, keys=keys,
                type_col=type_col, attr_cols=attr_cols,
            )
        pair = _relaxed_spat_pair(query.patseq)
        # SkipToNext is a no-op here: each start offset emits at most
        # one match anyway (a run takes the FIRST qualifying right
        # event).  SkipPastLastEvent is order-dependent → kernel.
        if pair is not None and query.strategy in ("NoSkip", "SkipToNext"):
            return _plan_relaxed_pair(
                df, pair, query, order_by=order_by, keys=keys,
                type_col=type_col, attr_cols=attr_cols,
            )
    except Exception:
        return None  # anything untranslatable falls back to the kernel
    return None


def _relaxed_spat_pair(node: Mapping) -> Optional[tuple[Mapping, Mapping]]:
    if (
        node["type"] == "combine"
        and node["contiguity"] == "relaxed"
        and node["left"].get("type") == "spat"
        and node["right"].get("type") == "spat"
        and not node["left"].get("variables")
        and not node["right"].get("variables")
        and node["left"]["name"] != node["right"]["name"]
    ):
        return node["left"], node["right"]
    return None


def _plan_relaxed_pair(
    df: DataFrame,
    pair: tuple[Mapping, Mapping],
    query: Query,
    *,
    order_by: str,
    keys: Sequence[str],
    type_col: Optional[str],
    attr_cols: Sequence[str],
) -> DataFrame:
    """``a followedBy b``: for every left match, the FIRST subsequent
    event the automaton cannot skip — a qualifying right event (match)
    or an event of an undeclared type (run death, since relaxed ignore
    edges are enumerated from the declared schema — reference
    compile.py:414-453).  One window pass, no join, no Python.
    """
    a_leaf, b_leaf = pair
    base = df.select(*keys, *attr_cols)
    is_a = F.expr(_leaf_condition_sql(a_leaf, type_col))
    is_b = F.expr(_leaf_condition_sql(b_leaf, type_col))
    blocking = is_b
    if type_col is not None:
        declared = [str(t) for t in query.schema.keys()]
        blocking = blocking | ~F.col(type_col).isin(declared)

    ev = F.struct(*[F.col(c).alias(c) for c in attr_cols])
    w_follow = (
        Window.partitionBy(*keys)
        .orderBy(order_by)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    # min over (ord, payload) structs = earliest blocking event.
    first_block = F.min(
        F.when(blocking, F.struct(F.col(order_by).alias("o"), is_b.alias("hit"), ev.alias("ev")))
    ).over(w_follow)

    matched = (
        base.select(*keys, *attr_cols, is_a.alias("__a"), first_block.alias("__b"))
        .filter(F.col("__a") & F.col("__b").isNotNull() & F.col("__b.hit"))
    )
    mw = Window.partitionBy(*keys).orderBy(F.col("__b.o"), F.col(order_by))
    return matched.select(
        *keys,
        (F.row_number().over(mw) - F.lit(1)).cast("long").alias("match_seq"),
        F.col(order_by).alias("start_ord"),
        F.col("__b.o").alias("end_ord"),
        F.array(ev).alias(a_leaf["name"]),
        F.array(F.col("__b.ev")).alias(b_leaf["name"]),
    )


def _plan_spat_chain(
    df: DataFrame,
    chain: list[Mapping],
    *,
    order_by: str,
    keys: Sequence[str],
    type_col: Optional[str],
    attr_cols: Sequence[str],
) -> DataFrame:
    base = df.select(*keys, *attr_cols)
    L = len(chain)
    w = Window.partitionBy(*keys).orderBy(order_by)

    # Offset j's event attributes live in lead(col, j).
    cols = list(base.columns)
    for j in range(1, L):
        for c in attr_cols:
            cols.append(F.lead(c, j).over(w).alias(f"__l{j}_{c}"))
    staged = base.select(*cols)

    conds = [F.expr(_leaf_condition_sql(chain[0], type_col))]
    for j in range(1, L):
        cmap = {c: f"__l{j}_{c}" for c in attr_cols}
        conds.append(F.expr(_leaf_condition_sql(chain[j], type_col, cmap)))
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    matched = staged.filter(pred)

    def event_struct(j: int):
        if j == 0:
            return F.struct(*[F.col(c).alias(c) for c in attr_cols])
        return F.struct(*[F.col(f"__l{j}_{c}").alias(c) for c in attr_cols])

    end_ord = F.col(order_by) if L == 1 else F.col(f"__l{L - 1}_{order_by}")
    mw = Window.partitionBy(*keys).orderBy(order_by)
    out = matched.select(
        *keys,
        (F.row_number().over(mw) - F.lit(1)).cast("long").alias("match_seq"),
        F.col(order_by).alias("start_ord"),
        end_ord.alias("end_ord"),
        *[
            F.array(event_struct(j)).alias(leaf["name"])
            for j, leaf in enumerate(chain)
        ],
    )
    return out


def _plan_strict_lpat(
    df: DataFrame,
    node: Mapping,
    *,
    order_by: str,
    keys: Sequence[str],
    type_col: Optional[str],
    attr_cols: Sequence[str],
) -> DataFrame:
    """Strict {n,m} loop: for every row, look at the next m rows; the
    length of the satisfying prefix bounds the admissible match
    lengths, one output row per length in [n, prefix]."""
    n = max(int(node["loop"]["from"]), 1)
    m = int(node["loop"]["to"])
    name = node["name"]

    base = df.select(*keys, *attr_cols)
    cond = F.expr(_leaf_condition_sql(node, type_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_by)
        .rowsBetween(Window.currentRow, m - 1)
    )
    ev = F.struct(*[F.col(c).alias(c) for c in attr_cols])
    staged = base.select(
        *keys,
        F.col(order_by).alias("__ord"),
        cond.alias("__ok"),
        F.collect_list(F.struct(cond.alias("ok"), ev.alias("ev"))).over(w).alias("__win"),
    ).filter(F.col("__ok"))

    # Length of the all-satisfying prefix of the m-row window.
    prefix = F.aggregate(
        F.col("__win"),
        F.struct(F.lit(0).alias("n"), F.lit(False).alias("stop")),
        lambda acc, x: F.struct(
            F.when(acc.stop | ~x.ok, acc.n).otherwise(acc.n + 1).alias("n"),
            (acc.stop | ~x.ok).alias("stop"),
        ),
    )["n"]

    # Guard prefix >= n: Spark's sequence() would otherwise count DOWN.
    lens = (
        staged.withColumn("__prefix", prefix)
        .filter(F.col("__prefix") >= n)
        .select(
            *keys,
            F.col("__ord"),
            F.col("__win"),
            F.explode(
                F.sequence(F.lit(n), F.least(F.lit(m), F.col("__prefix")))
            ).alias("__len"),
        )
    )

    capture = F.slice(F.transform(F.col("__win"), lambda x: x.ev), 1, F.col("__len"))
    mw = Window.partitionBy(*keys).orderBy("__ord", "__len")
    out = lens.select(
        *keys,
        (F.row_number().over(mw) - F.lit(1)).cast("long").alias("match_seq"),
        F.col("__ord").alias("start_ord"),
        F.element_at(capture, -1)[order_by].alias("end_ord"),
        capture.alias(name),
    )
    return out
