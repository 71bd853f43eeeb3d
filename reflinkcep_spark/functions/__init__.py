"""Large-scale data-pipeline functions: dedup, similarity, text analysis,
multimodal column plumbing.

Everything here is built from JVM-side ``pyspark.sql.functions``
(whole-stage codegen) unless a genuinely imperative kernel is needed,
in which case it's an Arrow-batched pandas UDF — never row-at-a-time
Python.
"""

from reflinkcep_spark.functions import (
    dedup,
    graph,
    multimodal,
    sampling,
    similarity,
    sketch,
    snapshot,
    text,
    web,
)

__all__ = [
    "dedup",
    "graph",
    "multimodal",
    "sampling",
    "similarity",
    "sketch",
    "snapshot",
    "text",
    "web",
]
