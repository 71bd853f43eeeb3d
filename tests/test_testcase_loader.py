"""Reference-artifact compatibility: testcase YAML runs unchanged, and
every example query file in the reference checkout parses."""

import glob
import io
import os

import pytest

TC_YAML = """
query:
  type: query
  patseq:
    type: combine
    contiguity: strict
    left:
      type: lpat
      name: al
      event: e
      cndt: {expr: name == 1}
      loop: {contiguity: strict, from: 2, to: 2}
    right:
      type: spat
      name: b
      event: e
      cndt: {expr: price >= 5}
  context:
    schema: {e: [id, name, price]}
input:
  - {type: e, attrs: {id: 1, name: 1, price: 0}}
  - {type: e, attrs: {id: 2, name: 1, price: 1}}
  - {type: e, attrs: {id: 3, name: 1, price: 2}}
  - {type: e, attrs: {id: 4, name: 2, price: 9}}
"""

# Only the run starting at id=2 survives: the [1,2] loop is killed by
# strict contiguity (event 3 fails price >= 5).
WANT = [
    {
        "al": [
            {"id": 2, "name": 1, "price": 1},
            {"id": 3, "name": 1, "price": 2},
        ],
        "b": [{"id": 4, "name": 2, "price": 9}],
    },
]


def test_run_testcase_pure_python():
    from reflinkcep_spark.sources.testcase import run_testcase

    assert run_testcase(io.StringIO(TC_YAML)) == WANT


def test_run_testcase_spark_kernel(spark):
    from reflinkcep_spark.sources.testcase import run_testcase

    assert run_testcase(io.StringIO(TC_YAML), spark=spark) == WANT


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/example-patseq-asts"),
    reason="reference checkout not available",
)
def test_every_reference_example_query_parses():
    from reflinkcep_spark import Query
    from reflinkcep_spark.cep.compiler import compile_query

    files = sorted(glob.glob("/root/reference/example-patseq-asts/*.yml"))
    assert len(files) >= 20
    for path in files:
        with open(path) as f:
            q = Query.from_yaml(f.read(), name=os.path.basename(path))
        compile_query(q)  # must compile to an automaton, not just parse
