"""Spark-facing operators: the CEP match kernel and plan fast paths."""

from reflinkcep_spark.operators.absence import not_followed_by, not_next
from reflinkcep_spark.operators.asof import asof_join
from reflinkcep_spark.operators.cep import match_pattern
from reflinkcep_spark.operators.fastpath import try_fast_path
from reflinkcep_spark.operators.rangejoin import interval_join
from reflinkcep_spark.operators.sessions import sessionize

__all__ = [
    "match_pattern",
    "try_fast_path",
    "asof_join",
    "interval_join",
    "not_followed_by",
    "not_next",
    "sessionize",
]
