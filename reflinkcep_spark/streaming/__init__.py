"""Structured Streaming execution of CEP pattern queries."""

from reflinkcep_spark.streaming.cep import match_pattern_stream

__all__ = ["match_pattern_stream"]
