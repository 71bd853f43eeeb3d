"""SQL:2016 row-pattern recognition: a ``MATCH_RECOGNIZE`` front end.

The SQL-first entry point to the CEP engine: parse the standard
``MATCH_RECOGNIZE`` clause (the subset Flink SQL / Oracle support most
heavily) and translate it onto the existing pattern AST + Spark kernel
— a thin compiler, zero new runtime.  The reference has no SQL surface
at all (patterns enter via YAML only), so this is strictly
beyond-reference; the translation targets are the same audited
primitives every other CEP query uses (``Query`` AST →
``operators.match_pattern`` grouped kernel, ONE exchange on the
partition key).

Supported subset
----------------
::

    MATCH_RECOGNIZE (
      PARTITION BY <col>
      ORDER BY <col>
      MEASURES <expr> AS <name> [, ...]
      [ONE ROW PER MATCH]
      [AFTER MATCH SKIP PAST LAST ROW
        | AFTER MATCH SKIP TO NEXT ROW
        | AFTER MATCH SKIP TO {FIRST|LAST} <var>]
      PATTERN ( <var>[<quant>] ... )
      DEFINE <var> AS <condition> [, ...]
    )

* ``PATTERN`` — concatenation of variables with optional quantifiers
  ``* + ? {n} {n,} {n,m}``, each optionally reluctant (trailing ``?``).
  SQL pattern matching is over CONTIGUOUS rows (every row of the
  matched segment is consumed by some variable — use an undefined
  filler variable like ``G*`` for gaps), so concatenation translates
  to STRICT combine and quantifiers to STRICT loops.  Alternation
  ``|``, grouping, ``PERMUTE``, anchors and exclusions are not
  supported (clear errors).
* Quantifier preference: SQL default is GREEDY (maximal rows); a
  trailing ``?`` makes a quantifier reluctant.  The engine emits every
  nondeterministic assignment (NoSkip) and the kernel's SQL selection
  layer keeps, per eligible start row, the match with the greatest
  (greedy) or smallest (reluctant) END row — exactly
  lexicographic-greedy when one variable is quantified, a documented
  longest-overall approximation when several are.  Mixing greedy and
  reluctant quantifiers in one pattern raises (the per-start
  preference would be ambiguous).
* ``DEFINE`` — boolean conditions over the CURRENT row's columns,
  written SQL-style (``B.value > 50 AND B.event_type = 'error'``);
  the ``var.`` qualifier must be the variable being defined
  (navigation like ``LAST(A.x)`` / ``PREV(x)`` inside DEFINE is not
  supported — use the YAML surface's iterative conditions for that).
  Undefined variables match any row (SQL semantics).  Conditions are
  translated into the engine's expression sub-language and validated
  by its sandbox (:mod:`reflinkcep_spark.cep.expr`).

  NULL handling: a row with NULL (or NaN) in ANY column the
  variable's condition references does NOT match that variable — the
  translator prepends an in-language null guard per referenced
  column, mirroring SQL's rule that a predicate over NULL is never
  TRUE (and preventing the Python-side ``None < x`` TypeError the raw
  2-valued evaluation would raise).  The one divergence from full
  three-valued logic: a condition that would be TRUE *regardless* of
  the NULL operand (e.g. ``x = 5 OR TRUE``) matches in SQL but not
  here, because the guard rejects the row before the condition runs.
  Undefined (always-TRUE) variables have no referenced columns and
  match NULL rows, exactly as in SQL.
* ``MEASURES`` — ``FIRST(V.col)``, ``LAST(V.col)``, ``COUNT(V.*)``
  (or bare ``COUNT(V)``), ``SUM/MIN/MAX(V.col)`` (NULL over an empty
  optional capture, SQL aggregate semantics; SUM widens integrals to
  BIGINT, keeps DECIMAL exact at precision 38 / same scale, and
  floats to DOUBLE), and ``V.col`` (≡ ``LAST(V.col)``
  under ONE ROW PER MATCH final semantics), each ``AS``-aliased.
  Projected Spark-side from the kernel's capture arrays
  (``element_at`` / ``size`` / ``aggregate`` — codegen, no Python).
* ``ONE ROW PER MATCH`` (the default) and ``ALL ROWS PER MATCH`` —
  the latter emits one output row per MATCHED INPUT ROW: the
  partition column, ``match_seq``, the implicit ``classifier`` column
  (which pattern variable consumed the row — SQL's ``CLASSIFIER()``),
  every event column, then the measures.  Measures use FINAL
  semantics in both modes (SQL's ``FINAL agg(...)``; the optional
  ``FINAL`` keyword is accepted, ``RUNNING`` raises — running
  aggregates are not supported).  Both modes project from the same
  kernel output: all-rows mode labels each variable's capture array,
  concatenates, sorts by the order column, and explodes — codegen
  array algebra, no second kernel pass.
* The four ``AFTER MATCH SKIP`` modes above (default ``PAST LAST
  ROW``).  ``SKIP TO FIRST/LAST v`` raises at runtime if ``v``
  captured nothing or resolves to the match's own start row
  (SQL:2016's infinite-loop rule).

Scale shape: identical to every kernel CEP query — project to the
referenced columns, ONE exchange on the partition key, Arrow-batched
``applyInPandas``; the measures projection is plain column algebra on
the kernel's output.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Sequence

from reflinkcep_spark.cep import expr as expr_mod
from reflinkcep_spark.cep.query import Query

if TYPE_CHECKING:  # pragma: no cover - typing only
    from pyspark.sql import DataFrame

__all__ = ["match_recognize", "MatchRecognizeError", "translate"]


class MatchRecognizeError(ValueError):
    """Raised for MATCH_RECOGNIZE specs outside the supported subset."""


# --- tokenizer --------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(
        '(?:[^']|'')*'          # SQL string literal ('' escape)
      | \d+\.\d+ | \.\d+ | \d+  # numbers
      | [A-Za-z_][A-Za-z_0-9]*  # identifiers / keywords
      | <> | != | <= | >= | \{- | -\}
      | [(),.{}*+?|^$<>=-]
      | /
    )
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise MatchRecognizeError(
                f"cannot tokenize MATCH_RECOGNIZE spec at: {text[pos:pos+30]!r}"
            )
        out.append(m.group(1))
        pos = m.end()
    return out


_CLAUSE_KEYWORDS = (
    "PARTITION",
    "ORDER",
    "MEASURES",
    "ONE",
    "ALL",
    "AFTER",
    "PATTERN",
    "DEFINE",
)


def _split_clauses(tokens: list[str]) -> dict[str, list[str]]:
    """Split the token stream into clause-keyword → body tokens (the
    keyword token(s) included), tracking paren depth so identifiers
    inside expressions never open a clause."""
    clauses: dict[str, list[str]] = {}
    current: str | None = None
    depth = 0
    for tok in tokens:
        up = tok.upper()
        if depth == 0 and up in _CLAUSE_KEYWORDS:
            if up in clauses:
                raise MatchRecognizeError(f"duplicate {up} clause")
            clauses[up] = []
            current = up
            continue
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
            if depth < 0:
                raise MatchRecognizeError("unbalanced parentheses")
        if current is None:
            raise MatchRecognizeError(
                f"unexpected token {tok!r} before any clause keyword"
            )
        clauses[current].append(tok)
    if depth != 0:
        raise MatchRecognizeError("unbalanced parentheses")
    return clauses


def _strip_wrapper(text: str) -> str:
    """Accept both the bare clause list and the full
    ``MATCH_RECOGNIZE ( ... )`` form."""
    s = text.strip()
    m = re.match(r"(?is)^\s*MATCH_RECOGNIZE\s*\(", s)
    if m:
        if not s.endswith(")"):
            raise MatchRecognizeError("MATCH_RECOGNIZE( ... ) not closed")
        s = s[m.end() :].rstrip()[:-1]
    return s


# --- clause parsers ---------------------------------------------------


def _parse_by(tokens: list[str], clause: str) -> str:
    # tokens: BY <ident> [ASC]
    if not tokens or tokens[0].upper() != "BY":
        raise MatchRecognizeError(f"{clause} must be followed by BY")
    body = tokens[1:]
    if body and body[-1].upper() in ("ASC",):
        body = body[:-1]
    if body and body[-1].upper() == "DESC":
        raise MatchRecognizeError(
            f"{clause} BY ... DESC is not supported (patterns read the "
            "stream forward)"
        )
    if len(body) != 1 or not re.match(r"^[A-Za-z_]\w*$", body[0]):
        raise MatchRecognizeError(
            f"{clause} BY supports exactly one plain column, got {body!r}"
        )
    return body[0]


def _split_top_commas(tokens: list[str]) -> list[list[str]]:
    parts, cur, depth = [], [], 0
    for tok in tokens:
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        if tok == "," and depth == 0:
            parts.append(cur)
            cur = []
        else:
            cur.append(tok)
    if cur:
        parts.append(cur)
    return parts


def _parse_measures(tokens: list[str]) -> list[tuple]:
    """→ list of (kind, var, col, alias); kind ∈ first|last|count."""
    out = []
    for part in _split_top_commas(tokens):
        if len(part) < 3 or part[-2].upper() != "AS":
            raise MatchRecognizeError(
                f"each measure needs 'AS <alias>': {' '.join(part)!r}"
            )
        alias = part[-1]
        if not re.match(r"^[A-Za-z_]\w*$", alias):
            raise MatchRecognizeError(f"bad measure alias {alias!r}")
        body = part[:-2]
        if body and body[0].upper() == "RUNNING":
            raise MatchRecognizeError(
                "RUNNING measure semantics are not supported (measures "
                "are FINAL in both row-per-match modes)"
            )
        if body and body[0].upper() == "FINAL":
            body = body[1:]  # FINAL is our semantics already
        if not body:
            raise MatchRecognizeError(
                f"empty measure expression before 'AS {alias}'"
            )
        up0 = body[0].upper()
        if (
            up0 in ("FIRST", "LAST", "SUM", "MIN", "MAX")
            and len(body) == 6
            and body[1] == "("
        ):
            # FIRST|LAST|SUM|MIN|MAX ( V . col )
            if body[3] != "." or body[5] != ")":
                raise MatchRecognizeError(
                    f"bad measure {' '.join(body)!r} (expected "
                    f"{up0}(var.col))"
                )
            out.append((up0.lower(), body[2], body[4], alias))
        elif up0 == "COUNT" and len(body) >= 4 and body[1] == "(" and body[-1] == ")":
            inner = body[2:-1]
            if len(inner) == 3 and inner[1] == "." and inner[2] == "*":
                out.append(("count", inner[0], None, alias))
            elif len(inner) == 1:
                out.append(("count", inner[0], None, alias))
            else:
                raise MatchRecognizeError(
                    f"COUNT measure supports COUNT(V.*) / COUNT(V): "
                    f"{' '.join(body)!r}"
                )
        elif len(body) == 3 and body[1] == ".":
            # V.col ≡ LAST(V.col) under ONE ROW PER MATCH final semantics
            out.append(("last", body[0], body[2], alias))
        else:
            raise MatchRecognizeError(
                f"unsupported measure {' '.join(body)!r} (supported: "
                "FIRST/LAST/SUM/MIN/MAX(V.col), COUNT(V.*), V.col)"
            )
    if not out:
        raise MatchRecognizeError("MEASURES clause is empty")
    return out


def _parse_skip(tokens: list[str]) -> tuple[str, str | None]:
    # tokens: MATCH SKIP ...
    ups = [t.upper() for t in tokens]
    if ups[:2] != ["MATCH", "SKIP"]:
        raise MatchRecognizeError("AFTER must be followed by MATCH SKIP")
    rest = ups[2:]
    if rest == ["PAST", "LAST", "ROW"]:
        return ("past_last", None)
    if rest == ["TO", "NEXT", "ROW"]:
        return ("to_next", None)
    if len(rest) == 3 and rest[0] == "TO" and rest[1] in ("FIRST", "LAST"):
        return ("to_" + rest[1].lower(), tokens[4])
    raise MatchRecognizeError(
        f"unsupported AFTER MATCH SKIP form: {' '.join(tokens[2:])!r} "
        "(supported: PAST LAST ROW, TO NEXT ROW, TO FIRST v, TO LAST v)"
    )


_QUANT_OPEN = {"*": (0, None), "+": (1, None), "?": (0, 1)}


def _parse_pattern(tokens: list[str]) -> list[tuple]:
    """→ list of (var, from, to|None, reluctant|None).  ``to`` None
    means unbounded; quantifier None (singleton) has from=to=1 and
    reluctant=None."""
    if not tokens or tokens[0] != "(" or tokens[-1] != ")":
        raise MatchRecognizeError("PATTERN needs parentheses")
    body = tokens[1:-1]
    for bad, why in (
        ("|", "alternation"),
        ("^", "anchors"),
        ("$", "anchors"),
        ("{-", "exclusions"),
        ("(", "grouping"),
    ):
        if bad in body:
            raise MatchRecognizeError(
                f"PATTERN {why} is not supported in this subset"
            )
    elems: list[tuple] = []
    i = 0
    while i < len(body):
        var = body[i]
        if not re.match(r"^[A-Za-z_]\w*$", var):
            raise MatchRecognizeError(f"bad pattern variable {var!r}")
        i += 1
        lo, hi, quantified = 1, 1, False
        if i < len(body) and body[i] in _QUANT_OPEN:
            lo, hi = _QUANT_OPEN[body[i]]
            quantified = True
            i += 1
        elif i < len(body) and body[i] == "{":
            try:
                j = body.index("}", i)
                nums = body[i + 1 : j]
                if len(nums) == 2 and nums[1] == ",":
                    lo, hi = int(nums[0]), None
                elif len(nums) == 3 and nums[1] == ",":
                    lo, hi = int(nums[0]), int(nums[2])
                elif len(nums) == 1:
                    lo = hi = int(nums[0])
                else:
                    raise ValueError(" ".join(nums))
            except ValueError as exc:
                raise MatchRecognizeError(
                    f"bad quantifier after {var!r}: {{{exc}}}"
                ) from exc
            quantified = True
            i = j + 1
        if hi is not None and hi == 0:
            raise MatchRecognizeError(
                f"quantifier {{{lo},{hi}}} on {var!r}: an always-empty "
                "variable is not supported (drop it from the pattern)"
            )
        if hi is not None and hi < lo:
            raise MatchRecognizeError(
                f"quantifier {{{lo},{hi}}} on {var!r}: upper bound below "
                "lower bound"
            )
        reluctant = None
        if quantified:
            reluctant = False
            if i < len(body) and body[i] == "?":
                reluctant = True
                i += 1
        elems.append((var, lo, hi, reluctant))
    if not elems:
        raise MatchRecognizeError("PATTERN is empty")
    seen = set()
    for var, *_ in elems:
        if var in seen:
            raise MatchRecognizeError(
                f"pattern variable {var!r} appears twice (captures are "
                "per-variable; rename the second occurrence)"
            )
        seen.add(var)
    return elems


_SQL_KEYWORD_MAP = {"AND": "and", "OR": "or", "NOT": "not", "TRUE": "True", "FALSE": "False"}


def _condition_to_expr(var: str, tokens: list[str]) -> str:
    """Translate a SQL DEFINE condition into the engine's expression
    sub-language: strip the self-variable qualifier, map operators and
    keywords, keep literals.  Validated by expr.validate afterwards."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        up = tok.upper()
        if (
            re.match(r"^[A-Za-z_]\w*$", tok)
            and i + 2 < len(tokens)
            and tokens[i + 1] == "."
        ):
            if tok != var:
                raise MatchRecognizeError(
                    f"DEFINE {var}: condition references {tok}.{tokens[i+2]} "
                    "— only the variable being defined may qualify columns "
                    "in this subset (cross-variable navigation needs the "
                    "YAML surface's iterative conditions)"
                )
            out.append(tokens[i + 2])
            i += 3
            continue
        if up in _SQL_KEYWORD_MAP:
            out.append(_SQL_KEYWORD_MAP[up])
        elif tok == "=":
            out.append("==")
        elif tok == "<>":
            out.append("!=")
        elif tok.startswith("'"):
            # SQL string literal → Python literal ('' unescapes)
            out.append(repr(tok[1:-1].replace("''", "'")))
        else:
            out.append(tok)
        i += 1
    return " ".join(out)


# --- translation ------------------------------------------------------


def translate(spec: str, columns: Sequence[str]) -> dict:
    """Parse a MATCH_RECOGNIZE spec and build the translation record:
    ``{query, partition_by, order_by, measures, skip, prefer}``.
    Pure function — no Spark session needed (unit-testable)."""
    tokens = _tokenize(_strip_wrapper(spec))
    clauses = _split_clauses(tokens)

    for required in ("PARTITION", "ORDER", "PATTERN", "MEASURES"):
        if required not in clauses:
            raise MatchRecognizeError(f"missing {required} clause")
    rows_per_match = "one"
    if "ALL" in clauses and "ONE" in clauses:
        raise MatchRecognizeError(
            "both ONE ROW PER MATCH and ALL ROWS PER MATCH given"
        )
    if "ALL" in clauses:
        ups = [t.upper() for t in clauses["ALL"]]
        if ups != ["ROWS", "PER", "MATCH"]:
            raise MatchRecognizeError("expected ALL ROWS PER MATCH")
        rows_per_match = "all"
    if "ONE" in clauses:
        ups = [t.upper() for t in clauses["ONE"]]
        if ups != ["ROW", "PER", "MATCH"]:
            raise MatchRecognizeError("expected ONE ROW PER MATCH")

    partition_by = _parse_by(clauses["PARTITION"], "PARTITION")
    order_by = _parse_by(clauses["ORDER"], "ORDER")
    measures = _parse_measures(clauses["MEASURES"])
    skip = (
        _parse_skip(clauses["AFTER"]) if "AFTER" in clauses else ("past_last", None)
    )
    elems = _parse_pattern(clauses["PATTERN"])

    defines: dict[str, str] = {}
    if "DEFINE" in clauses:
        for part in _split_top_commas(clauses["DEFINE"]):
            if len(part) < 3 or part[1].upper() != "AS":
                raise MatchRecognizeError(
                    f"each DEFINE needs '<var> AS <condition>': "
                    f"{' '.join(part)!r}"
                )
            var = part[0]
            if var in defines:
                raise MatchRecognizeError(f"variable {var!r} defined twice")
            defines[var] = _condition_to_expr(var, part[2:])

    pattern_vars = [e[0] for e in elems]
    for var in defines:
        if var not in pattern_vars:
            raise MatchRecognizeError(
                f"DEFINE {var!r} does not appear in PATTERN {pattern_vars}"
            )
    if skip[1] is not None and skip[1] not in pattern_vars:
        raise MatchRecognizeError(
            f"AFTER MATCH SKIP targets unknown variable {skip[1]!r}"
        )
    seen_aliases: set = set()
    # names the output projection already owns — a colliding measure
    # alias would raise an AMBIGUOUS_REFERENCE AnalysisException later
    # (or silently duplicate a column name); reject it here instead.
    reserved = {partition_by, "match_seq"}
    if rows_per_match == "all":
        reserved.add("classifier")
        reserved.update(columns)
    for kind, var, col, alias in measures:
        if var not in pattern_vars:
            raise MatchRecognizeError(
                f"measure {alias!r} references unknown variable {var!r}"
            )
        if col is not None and col == partition_by:
            raise MatchRecognizeError(
                f"measure {alias!r} references the PARTITION BY column "
                f"{col!r} — it is the grouping key, not a captured event "
                "attribute (project it directly: it is already an output "
                "column)"
            )
        if col is not None and col not in columns:
            raise MatchRecognizeError(
                f"measure {alias!r} references unknown column {col!r}"
            )
        if alias in seen_aliases:
            raise MatchRecognizeError(f"duplicate measure alias {alias!r}")
        if alias in reserved:
            raise MatchRecognizeError(
                f"measure alias {alias!r} collides with an output column "
                f"({'partition/match_seq/classifier/event columns' if rows_per_match == 'all' else 'partition column or match_seq'})"
            )
        seen_aliases.add(alias)

    reluctants = {e[3] for e in elems if e[3] is not None}
    if len(reluctants) > 1:
        raise MatchRecognizeError(
            "mixing greedy and reluctant quantifiers in one PATTERN is "
            "not supported (the per-start preference would be ambiguous)"
        )
    prefer = "shortest" if reluctants == {True} else "longest"

    import ast as _pyast

    attr_cols = [c for c in columns if c != partition_by]
    for var, cond in list(defines.items()):
        try:
            expr_mod.validate(cond)
        except expr_mod.ExprError as exc:
            raise MatchRecognizeError(
                f"DEFINE condition not in the supported sub-language: {exc}"
            ) from exc
        # Names must resolve at kernel time: the condition sees the
        # current row's non-key columns (the partition column is the
        # grouping key, not an event attribute) — catch a bad name
        # here instead of a KeyError inside a running executor.
        referenced = []
        for node in _pyast.walk(_pyast.parse(cond, mode="eval")):
            if isinstance(node, _pyast.Name):
                if node.id == partition_by:
                    raise MatchRecognizeError(
                        f"DEFINE {var}: column {node.id!r} is the "
                        "PARTITION BY key — it is constant within a "
                        "match and not visible to conditions"
                    )
                if node.id not in attr_cols:
                    raise MatchRecognizeError(
                        f"DEFINE {var}: unknown column {node.id!r} "
                        f"(row columns: {attr_cols})"
                    )
                if node.id not in referenced:
                    referenced.append(node.id)
        # SQL NULL rule (module docstring): NULL/NaN in any referenced
        # column → the variable does not match the row.  `c == c`
        # rejects NaN (NaN != NaN), `c != None` rejects None; `and`
        # short-circuits, so ordered comparisons never see a None.
        if referenced:
            guard = " and ".join(
                f"({c} == {c} and {c} != None)" for c in referenced
            )
            defines[var] = f"{guard} and ({cond})"

    # SQL matches CONTIGUOUS rows: strict combine + strict loops.
    def leaf(var: str, lo: int, hi: int | None) -> dict:
        cndt = {"expr": defines.get(var, "True")}
        if lo == 1 and hi == 1:
            return {"type": "spat", "name": var, "event": "row", "cndt": cndt}
        if hi is None:
            return {
                "type": "lpat-inf",
                "name": var,
                "event": "row",
                "cndt": cndt,
                "loop": {"contiguity": "strict", "from": lo},
            }
        return {
            "type": "lpat",
            "name": var,
            "event": "row",
            "cndt": cndt,
            "loop": {"contiguity": "strict", "from": lo, "to": hi},
        }

    patseq = leaf(*elems[0][:3])
    for var, lo, hi, _rel in elems[1:]:
        patseq = {
            "type": "combine",
            "contiguity": "strict",
            "left": patseq,
            "right": leaf(var, lo, hi),
        }


    from reflinkcep_spark.cep.query import QueryError

    try:
        query = Query(
            patseq,
            {
                "schema": {"row": [c for c in columns]},
                "strategy": "NoSkip",
                "name": "<match_recognize>",
            },
        )
    except QueryError as exc:
        # every AST-shape rule should be caught above with a clearer
        # message; this keeps the module's error contract total.
        raise MatchRecognizeError(
            f"PATTERN translates to an invalid pattern AST: {exc}"
        ) from exc
    return {
        "query": query,
        "partition_by": partition_by,
        "order_by": order_by,
        "measures": measures,
        "skip": skip,
        "prefer": prefer,
        "rows_per_match": rows_per_match,
        "pattern_vars": pattern_vars,
    }


def match_recognize(df: DataFrame, spec: str, **kernel_kwargs) -> DataFrame:
    """Run a SQL ``MATCH_RECOGNIZE`` clause over a DataFrame of rows.

    Output — ONE ROW PER MATCH (default): partition column,
    ``match_seq``, then the MEASURES in declaration order.
    ALL ROWS PER MATCH: partition column, ``match_seq``,
    ``classifier`` (which variable consumed the row), every event
    column, then the MEASURES (FINAL semantics, repeated per row).
    With ``on_limit="truncate"`` a hot key that trips
    ``max_active_runs`` keeps its sentinel row in BOTH modes
    (``match_seq = -1``, NULL classifier/event/measure columns).
    ``kernel_kwargs`` pass through to
    :func:`reflinkcep_spark.operators.match_pattern`
    (``max_active_runs``, ``on_limit``, ``pre_partitioned`` …).
    """
    from pyspark.sql import functions as F

    from reflinkcep_spark.operators import match_pattern

    t = translate(spec, df.columns)
    out = match_pattern(
        df,
        t["query"],
        order_by=t["order_by"],
        partition_by=t["partition_by"],
        type_col=None,
        sql_skip=t["skip"],
        sql_prefer=t["prefer"],
        **kernel_kwargs,
    )
    from pyspark.sql.types import DecimalType

    integral = {"byte", "short", "integer", "long"}
    field_types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    field_dtypes = {f.name: f.dataType for f in df.schema.fields}
    measure_cols = []
    for kind, var, col, alias in t["measures"]:
        if kind == "count":
            # 0 over an empty optional capture (SQL COUNT), but NULL on
            # the on_limit="truncate" sentinel row (match_seq = -1) —
            # a truncated key's measures are unknown, not zero.
            c = F.when(
                F.col("match_seq") >= 0,
                F.coalesce(F.size(F.col(var)), F.lit(0)),
            ).cast("long")
        elif kind == "first":
            c = F.element_at(F.col(var), 1)[col]
        elif kind == "last":
            c = F.element_at(F.col(var), -1)[col]
        else:  # sum / min / max — NULL over an empty capture (SQL)
            vals = F.transform(F.col(var), lambda e: e[col])
            if kind == "min":
                c = F.array_min(vals)
            elif kind == "max":
                c = F.array_max(vals)
            else:
                # SQL SUM widens: integral → BIGINT, DECIMAL stays
                # EXACT at max precision / same scale (the repo's
                # exact-cents discipline), floating → DOUBLE.
                dt = field_dtypes.get(col)
                if field_types.get(col) in integral:
                    acc = "long"
                elif isinstance(dt, DecimalType):
                    acc = f"decimal(38,{dt.scale})"
                else:
                    acc = "double"
                c = F.when(
                    F.size(F.col(var)) > 0,
                    F.aggregate(
                        vals,
                        F.lit(0).cast(acc),
                        lambda a, x: a + x.cast(acc),
                    ),
                )
        measure_cols.append(c.alias(alias))

    if t["rows_per_match"] == "one":
        return out.select(
            F.col(t["partition_by"]), F.col("match_seq"), *measure_cols
        )

    # ALL ROWS PER MATCH: label each variable's capture array with its
    # CLASSIFIER, concatenate, sort by the order column, explode — one
    # output row per matched input row, measures in FINAL semantics.
    order_by = t["order_by"]

    def _labeler(vname):
        # single-arity on purpose: a two-parameter lambda would make
        # F.transform pass the ARRAY INDEX as the second argument,
        # silently shadowing a `v=v` default (observed: classifier
        # became 0,1,…).
        def lab(e):
            return F.struct(
                e[order_by].alias("__o"),
                F.lit(vname).alias("classifier"),
                e.alias("ev"),
            )

        return lab

    labeled = F.array_sort(
        F.concat(
            *[
                F.transform(F.coalesce(F.col(v), F.array()), _labeler(v))
                for v in t["pattern_vars"]
            ]
        )
    )
    event_cols = [c for c in df.columns if c != t["partition_by"]]
    return (
        out.select(
            F.col(t["partition_by"]),
            F.col("match_seq"),
            *measure_cols,
            # explode_outer, not explode: the on_limit="truncate"
            # sentinel row has every capture NULL → an EMPTY labeled
            # array — plain explode would silently drop the key's
            # truncation marker, making a partial result look complete.
            F.explode_outer(labeled).alias("__r"),
        )
        .select(
            F.col(t["partition_by"]),
            F.col("match_seq"),
            F.col("__r.classifier").alias("classifier"),
            *[F.col(f"__r.ev.{c}").alias(c) for c in event_cols],
            *[F.col(alias) for _k, _v, _c, alias in t["measures"]],
        )
    )
