"""CEP core: pattern queries, condition expressions, automaton, runtime.

Pure Python — no Spark dependency.  The Spark integration lives in
``reflinkcep_spark.operators`` (batch) and ``reflinkcep_spark.streaming``.
"""
