"""reflinkcep-spark: a PySpark-native CEP + analytics engine.

A brand-new engine with the query capabilities of the reference
``reflinkcep`` project (a pure-Python Flink-CEP recreation): pattern
sequences (``spat``/``lpat``/``lpat-inf``/``combine``/``gpat``/
``gpat-times``/``gpat-inf``), three contiguity modes, iterative
conditions with data variables, ``until`` stop conditions and
after-match skip strategies — re-expressed Spark-first.  On top of the
CEP surface it ships the relational operators Catalyst gives us for
free, plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis).

Layout:
    cep/        pattern AST, condition compiler, automaton, NFA runtime
    operators/  Spark-facing operators (match_pattern kernel, fast paths)
    functions/  dedup / similarity / text-analysis / multimodal functions
    sources/    IO helpers for the testdata star schema
    streaming/  Structured Streaming CEP kernel
"""

from reflinkcep_spark.cep.query import Pattern, Query
from reflinkcep_spark.cep.compiler import compile_query
from reflinkcep_spark.cep.runtime import MatchEngine, run_pattern

__all__ = [
    "Pattern",
    "Query",
    "compile_query",
    "match_recognize",
    "match_recognize_stream",
    "MatchEngine",
    "run_pattern",
]


def __getattr__(name):
    # Lazy: match_recognize pulls in pyspark; the CEP core (Pattern /
    # Query / run_pattern) stays importable without a JVM on the path.
    if name in ("match_recognize", "match_recognize_stream"):
        from reflinkcep_spark.cep import match_recognize as _mr

        return getattr(_mr, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__version__ = "0.1.0"
