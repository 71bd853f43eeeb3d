"""Structured Streaming execution: CEP pattern queries + windowed
aggregations."""

from reflinkcep_spark.streaming.absence import not_followed_by_stream, not_next_stream
from reflinkcep_spark.streaming.aggregations import tumbling_agg
from reflinkcep_spark.streaming.cep import match_pattern_stream

__all__ = [
    "match_pattern_stream",
    "not_followed_by_stream",
    "not_next_stream",
    "tumbling_agg",
]
