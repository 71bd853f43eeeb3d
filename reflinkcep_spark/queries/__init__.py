"""Query registry: every operator exposed through the driver contract.

Each sub-module defines ``QUERIES`` (name → fn(spark, sf_dir) → DF) and
``ORACLES`` (name → equivalent ANSI SQL for DuckDB).  Names without an
oracle are non-SQL-expressible operators checked rows-only.
"""

from reflinkcep_spark.queries import cep_queries, pipeline, relational, temporal

_MODULES = (relational, temporal, cep_queries, pipeline)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
