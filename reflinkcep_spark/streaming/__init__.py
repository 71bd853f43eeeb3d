"""Structured Streaming execution: CEP pattern queries + windowed
aggregations."""

from reflinkcep_spark.streaming.aggregations import tumbling_agg
from reflinkcep_spark.streaming.cep import match_pattern_stream

__all__ = ["match_pattern_stream", "tumbling_agg"]
