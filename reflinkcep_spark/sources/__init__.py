"""Source helpers for the synthetic star schema + event stream tables."""

from reflinkcep_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    read_events,
    read_events_stream,
    register_views,
    spread,
)
from reflinkcep_spark.sources.testcase import load_testcase, run_testcase, testcase_events_df

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_events",
    "read_events_stream",
    "register_views",
    "spread",
    "load_testcase",
    "run_testcase",
    "testcase_events_df",
]
