"""Golden CEP cases: query YAML + input stream + expected matches.

Each expected output was produced by the reference engine's own test
suite (reference tests/test_basic.py, test_combine.py, test_group.py,
test_strategy.py, test_cornercase.py) and is rendered here in the
"fancy" one-line-per-match format::

    name: e(id,name,price), ...; name2: ...

Shared by the pure-Python runtime tests and the Spark kernel tests.
"""

SCHEMA_E = {"e": ["id", "name", "price"]}

Q_HELLO = """
type: query
patseq:
  type: spat
  name: a1
  event: e
  cndt: {expr: name == 1 and price < 4}
context:
  schema: {e: [id, name, price]}
"""

Q_LPAT_NN = """
type: query
patseq:
  type: lpat
  name: al
  event: e
  cndt: {expr: name == 1 and price < 4}
  loop: {contiguity: strict, from: 2, to: 2}
context:
  schema: {e: [id, name, price]}
"""

Q_LPAT_NM = """
type: query
patseq:
  type: lpat
  name: al
  event: e
  cndt: {expr: name == 1 and price < 4}
  loop: {contiguity: strict, from: 2, to: 3}
context:
  schema: {e: [id, name, price]}
"""

Q_LPAT_NM_RELAXED = """
type: query
patseq:
  type: lpat
  name: al
  event: e
  cndt: {expr: name == 1}
  loop: {contiguity: relaxed, from: 2, to: 3}
context:
  schema: {e: [id, name, price]}
"""

Q_LPAT_NM_NDRELAXED = """
type: query
patseq:
  type: lpat
  name: al
  event: e
  cndt: {expr: name == 1 and price < 4}
  loop: {contiguity: nd-relaxed, from: 2, to: 3}
context:
  schema: {e: [id, name, price]}
"""

Q_LPAT_NM_IC = """
type: query
patseq:
  type: lpat
  name: al
  event: e
  cndt: {expr: X + price <= 5}
  variables:
    X: {update: X + price, initial: 0}
  loop: {contiguity: strict, from: 2, to: 3}
context:
  schema: {e: [id, name, price]}
"""

def _lpat_inf(contiguity, n=2, until=False):
    until_block = """
  until: {expr: X + price >= 6}
  variables:
    X: {update: X + price, initial: 0}
""" if until else ""
    return f"""
type: query
patseq:
  type: lpat-inf
  name: al
  event: e
  cndt: {{expr: name == 1 and price < 4}}
  loop: {{contiguity: {contiguity}, from: {n}}}{until_block}
context:
  schema: {{e: [id, name, price]}}
"""

Q_LPAT_INF = _lpat_inf("strict")
Q_LPAT_INF_RELAXED = _lpat_inf("relaxed")
Q_LPAT_INF_NDRELAXED = _lpat_inf("nd-relaxed", n=3)
Q_LPAT_INF_UNTIL = _lpat_inf("strict", until=True)
Q_LPAT_INF_UNTIL_RELAXED = _lpat_inf("relaxed", until=True)
Q_LPAT_INF_UNTIL_NDRELAXED = _lpat_inf("nd-relaxed", until=True)

Q_CAT_STRICT = """
type: query
patseq:
  type: combine
  contiguity: strict
  left:
    type: spat
    name: a
    event: e
    cndt: {expr: name == 1}
  right:
    type: spat
    name: b
    event: e
    cndt: {expr: name == 2}
context:
  schema: {e: [id, name, price]}
"""

Q_CAT_STRICT_2 = """
type: query
patseq:
  type: combine
  contiguity: strict
  left:
    type: combine
    contiguity: strict
    left:
      type: spat
      name: a
      event: e
      cndt: {expr: name == 1}
    right:
      type: spat
      name: b
      event: e
      cndt: {expr: name == 2}
  right:
    type: spat
    name: c
    event: e
    cndt: {expr: name == 3}
context:
  schema: {e: [id, name, price]}
"""

def _cat_loops(contiguity):
    return f"""
type: query
patseq:
  type: combine
  contiguity: {contiguity}
  left:
    type: lpat-inf
    name: a
    event: e
    cndt: {{expr: name == 1}}
    loop: {{contiguity: nd-relaxed, from: 1}}
  right:
    type: lpat
    name: b
    event: e
    cndt: {{expr: name == 2}}
    loop: {{contiguity: relaxed, from: {2 if contiguity == "strict" else 1}, to: 3}}
context:
  schema: {{e: [id, name, price]}}
"""

Q_CAT_STRICT_3 = _cat_loops("strict")
Q_CAT_RELAXED = _cat_loops("relaxed")
Q_CAT_NDRELAXED = _cat_loops("nd-relaxed")

def _ams(strategy):
    return f"""
type: query
patseq:
  type: combine
  contiguity: relaxed
  left:
    type: lpat-inf
    name: b
    event: e
    cndt: {{expr: name == 2}}
    loop: {{contiguity: relaxed, from: 1}}
  right:
    type: spat
    name: c
    event: e
    cndt: {{expr: name == 3}}
context:
  strategy: {strategy}
  schema: {{e: [id, name, price]}}
"""

Q_AMS_NOSKIP = _ams("NoSkip")
Q_AMS_SKIPTONEXT = _ams("SkipToNext")
Q_AMS_SKIPPAST = _ams("SkipPastLastEvent")

_GPAT_CHILD = """
    type: combine
    contiguity: strict
    left:
      type: spat
      name: a
      event: e
      cndt: {expr: name == 1}
    right:
      type: spat
      name: b
      event: e
      cndt: {expr: name == 2}
"""

Q_GPAT_HELLO = f"""
type: query
patseq:
  type: gpat
  child:{_GPAT_CHILD}
context:
  schema: {{e: [id, name, price]}}
"""

Q_GPAT_TIMES = f"""
type: query
patseq:
  type: gpat-times
  child:{_GPAT_CHILD}
  loop: {{from: 2, to: 3}}
context:
  schema: {{e: [id, name, price]}}
"""

Q_GPAT_INF = f"""
type: query
patseq:
  type: gpat-inf
  child:{_GPAT_CHILD}
  loop: {{from: 2}}
context:
  schema: {{e: [id, name, price]}}
"""

Q_GPAT_INF_UNTIL = f"""
type: query
patseq:
  type: gpat-inf
  child:{_GPAT_CHILD}
  loop: {{from: 2}}
  until: {{expr: price > 5}}
context:
  schema: {{e: [id, name, price]}}
"""

Q_CORNER_01 = """
type: query
patseq:
  type: lpat
  name: p
  event: e
  cndt: {expr: name == 1}
  loop: {contiguity: nd-relaxed, from: 2, to: 5}
context:
  schema: {e: [id, name, price]}
"""

def _circ(right_block):
    return f"""
type: query
patseq:
  type: combine
  contiguity: relaxed
  left:
    type: spat
    name: c
    event: e
    cndt: {{expr: name == 3}}
  right:{right_block}
context:
  schema: {{e: [id, name, price]}}
"""

Q_CIRC_UNTIL = _circ("""
    type: lpat-inf
    name: a
    event: e
    cndt: {expr: name == 1}
    loop: {contiguity: relaxed, from: 1}
    until: {expr: name == 2}
""")

Q_CIRC_UNTIL_OPTIONAL = _circ("""
    type: lpat-inf
    name: a
    event: e
    cndt: {expr: name == 1}
    loop: {contiguity: relaxed, from: 0}
    until: {expr: name == 2}
""")

Q_CIRC_LPAT_NM_UNTIL_OPTIONAL = _circ("""
    type: lpat
    name: a
    event: e
    cndt: {expr: name == 1}
    loop: {contiguity: relaxed, from: 0, to: 1}
    until: {expr: name == 2}
""")

Q_NESTED_UNTIL = """
type: query
patseq:
  type: gpat-inf
  child:
    type: gpat
    child:
      type: lpat-inf
      name: a
      event: e
      cndt: {expr: name == 1}
      loop: {contiguity: relaxed, from: 1, to: inf}
  loop: {from: 1, to: inf}
  until: {expr: name == 3}
context:
  schema: {e: [id, name, price]}
"""


# (case name, query yaml, input [(name, price)...], expected fancy output)
GOLDEN_CASES = [
    ("hello", Q_HELLO, [(1, 0), (1, 5), (2, 0), (1, 2), (1, 8)],
     "a1: e(1,1,0)\n"
     "a1: e(4,1,2)"),
    ("lpat_nn", Q_LPAT_NN, [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3)],
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(4,1,2), e(5,1,3)"),
    ("lpat_nm", Q_LPAT_NM, [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3)],
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(3,1,1), e(4,1,2), e(5,1,3)\n"
     "al: e(4,1,2), e(5,1,3)"),
    ("lpat_nm_relaxed", Q_LPAT_NM_RELAXED, [(1, 0), (1, 5), (2, 1), (1, 2)],
     "al: e(1,1,0), e(2,1,5)\n"
     "al: e(1,1,0), e(2,1,5), e(4,1,2)\n"
     "al: e(2,1,5), e(4,1,2)"),
    ("lpat_nm_ndrelaxed", Q_LPAT_NM_NDRELAXED, [(1, 0), (1, 5), (1, 1), (1, 2)],
     "al: e(1,1,0), e(3,1,1)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2)\n"
     "al: e(1,1,0), e(4,1,2)\n"
     "al: e(3,1,1), e(4,1,2)"),
    ("lpat_nm_ic", Q_LPAT_NM_IC, [(1, 1), (1, 4), (1, 1), (1, 2), (1, 3)],
     "al: e(1,1,1), e(2,1,4)\n"
     "al: e(2,1,4), e(3,1,1)\n"
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(4,1,2), e(5,1,3)"),
    ("lpat_inf", Q_LPAT_INF, [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)],
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(3,1,1), e(4,1,2), e(5,1,3)\n"
     "al: e(4,1,2), e(5,1,3)\n"
     "al: e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(5,1,3), e(6,1,3)"),
    ("lpat_inf_relaxed", Q_LPAT_INF_RELAXED,
     [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)],
     "al: e(1,1,0), e(3,1,1)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2)\n"
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3)\n"
     "al: e(3,1,1), e(4,1,2), e(5,1,3)\n"
     "al: e(4,1,2), e(5,1,3)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(5,1,3), e(6,1,3)"),
    ("lpat_inf_ndrelaxed", Q_LPAT_INF_NDRELAXED,
     [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)],
     "al: e(1,1,0), e(3,1,1), e(4,1,2)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3)\n"
     "al: e(1,1,0), e(3,1,1), e(5,1,3)\n"
     "al: e(1,1,0), e(4,1,2), e(5,1,3)\n"
     "al: e(3,1,1), e(4,1,2), e(5,1,3)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2), e(6,1,3)\n"
     "al: e(1,1,0), e(3,1,1), e(5,1,3), e(6,1,3)\n"
     "al: e(1,1,0), e(3,1,1), e(6,1,3)\n"
     "al: e(1,1,0), e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(1,1,0), e(4,1,2), e(6,1,3)\n"
     "al: e(1,1,0), e(5,1,3), e(6,1,3)\n"
     "al: e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)\n"
     "al: e(3,1,1), e(4,1,2), e(6,1,3)\n"
     "al: e(3,1,1), e(5,1,3), e(6,1,3)\n"
     "al: e(4,1,2), e(5,1,3), e(6,1,3)"),
    ("lpat_inf_until", Q_LPAT_INF_UNTIL,
     [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)],
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(4,1,2), e(5,1,3)"),
    ("lpat_inf_until_relaxed", Q_LPAT_INF_UNTIL_RELAXED,
     [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)],
     "al: e(1,1,0), e(3,1,1)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2)\n"
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(4,1,2), e(5,1,3)"),
    ("lpat_inf_until_ndrelaxed", Q_LPAT_INF_UNTIL_NDRELAXED,
     [(1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)],
     "al: e(1,1,0), e(3,1,1)\n"
     "al: e(1,1,0), e(3,1,1), e(4,1,2)\n"
     "al: e(1,1,0), e(4,1,2)\n"
     "al: e(3,1,1), e(4,1,2)\n"
     "al: e(1,1,0), e(3,1,1), e(5,1,3)\n"
     "al: e(1,1,0), e(4,1,2), e(5,1,3)\n"
     "al: e(1,1,0), e(5,1,3)\n"
     "al: e(3,1,1), e(5,1,3)\n"
     "al: e(4,1,2), e(5,1,3)\n"
     "al: e(1,1,0), e(3,1,1), e(6,1,3)\n"
     "al: e(1,1,0), e(4,1,2), e(6,1,3)\n"
     "al: e(1,1,0), e(6,1,3)\n"
     "al: e(3,1,1), e(6,1,3)\n"
     "al: e(4,1,2), e(6,1,3)"),
    ("cat_strict", Q_CAT_STRICT, [(1, 0), (1, 5), (2, 0), (1, 2), (2, 8)],
     "a: e(2,1,5); b: e(3,2,0)\n"
     "a: e(4,1,2); b: e(5,2,8)"),
    ("cat_strict_2", Q_CAT_STRICT_2, [(1, 0), (1, 5), (2, 0), (3, 2), (2, 8)],
     "a: e(2,1,5); b: e(3,2,0); c: e(4,3,2)"),
    ("cat_strict_3", Q_CAT_STRICT_3,
     [(1, 0), (1, 5), (2, 0), (3, 2), (1, 8), (2, 8), (2, 8)],
     "a: e(1,1,0), e(2,1,5); b: e(3,2,0), e(6,2,8)\n"
     "a: e(2,1,5); b: e(3,2,0), e(6,2,8)\n"
     "a: e(1,1,0), e(2,1,5), e(5,1,8); b: e(6,2,8), e(7,2,8)\n"
     "a: e(1,1,0), e(2,1,5); b: e(3,2,0), e(6,2,8), e(7,2,8)\n"
     "a: e(1,1,0), e(5,1,8); b: e(6,2,8), e(7,2,8)\n"
     "a: e(2,1,5), e(5,1,8); b: e(6,2,8), e(7,2,8)\n"
     "a: e(2,1,5); b: e(3,2,0), e(6,2,8), e(7,2,8)\n"
     "a: e(5,1,8); b: e(6,2,8), e(7,2,8)"),
    ("cat_relaxed", Q_CAT_RELAXED, [(1, 0), (1, 1), (3, 0), (2, 0), (2, 1)],
     "a: e(1,1,0), e(2,1,1); b: e(4,2,0)\n"
     "a: e(1,1,0); b: e(4,2,0)\n"
     "a: e(2,1,1); b: e(4,2,0)\n"
     "a: e(1,1,0), e(2,1,1); b: e(4,2,0), e(5,2,1)\n"
     "a: e(1,1,0); b: e(4,2,0), e(5,2,1)\n"
     "a: e(2,1,1); b: e(4,2,0), e(5,2,1)"),
    ("cat_ndrelaxed", Q_CAT_NDRELAXED, [(1, 0), (1, 1), (3, 0), (2, 0), (2, 1)],
     "a: e(1,1,0), e(2,1,1); b: e(4,2,0)\n"
     "a: e(1,1,0); b: e(4,2,0)\n"
     "a: e(2,1,1); b: e(4,2,0)\n"
     "a: e(1,1,0), e(2,1,1); b: e(4,2,0), e(5,2,1)\n"
     "a: e(1,1,0), e(2,1,1); b: e(5,2,1)\n"
     "a: e(1,1,0); b: e(4,2,0), e(5,2,1)\n"
     "a: e(1,1,0); b: e(5,2,1)\n"
     "a: e(2,1,1); b: e(4,2,0), e(5,2,1)\n"
     "a: e(2,1,1); b: e(5,2,1)"),
    ("ams_noskip", Q_AMS_NOSKIP, [(2, 0), (2, 1), (2, 2), (3, 0)],
     "b: e(1,2,0), e(2,2,1), e(3,2,2); c: e(4,3,0)\n"
     "b: e(1,2,0), e(2,2,1); c: e(4,3,0)\n"
     "b: e(1,2,0); c: e(4,3,0)\n"
     "b: e(2,2,1), e(3,2,2); c: e(4,3,0)\n"
     "b: e(2,2,1); c: e(4,3,0)\n"
     "b: e(3,2,2); c: e(4,3,0)"),
    ("ams_skiptonext", Q_AMS_SKIPTONEXT, [(2, 0), (2, 1), (2, 2), (3, 0)],
     "b: e(1,2,0), e(2,2,1), e(3,2,2); c: e(4,3,0)\n"
     "b: e(2,2,1), e(3,2,2); c: e(4,3,0)\n"
     "b: e(3,2,2); c: e(4,3,0)"),
    ("ams_skippastlastevent", Q_AMS_SKIPPAST, [(2, 0), (2, 1), (2, 2), (3, 0)],
     "b: e(1,2,0), e(2,2,1), e(3,2,2); c: e(4,3,0)"),
    ("gpat_hello", Q_GPAT_HELLO, [(1, 0), (1, 5), (2, 0), (1, 2), (2, 8)],
     "a: e(2,1,5); b: e(3,2,0)\n"
     "a: e(4,1,2); b: e(5,2,8)"),
    ("gpat_times", Q_GPAT_TIMES,
     [(1, 0), (2, 5), (1, 0), (2, 2), (1, 0), (2, 2), (2, 8)],
     "a: e(1,1,0), e(3,1,0); b: e(2,2,5), e(4,2,2)\n"
     "a: e(1,1,0), e(3,1,0), e(5,1,0); b: e(2,2,5), e(4,2,2), e(6,2,2)\n"
     "a: e(3,1,0), e(5,1,0); b: e(4,2,2), e(6,2,2)"),
    ("gpat_inf", Q_GPAT_INF,
     [(1, 0), (2, 5), (1, 0), (2, 2), (1, 0), (2, 2), (1, 0), (2, 5), (1, 8)],
     "a: e(1,1,0), e(3,1,0); b: e(2,2,5), e(4,2,2)\n"
     "a: e(1,1,0), e(3,1,0), e(5,1,0); b: e(2,2,5), e(4,2,2), e(6,2,2)\n"
     "a: e(3,1,0), e(5,1,0); b: e(4,2,2), e(6,2,2)\n"
     "a: e(1,1,0), e(3,1,0), e(5,1,0), e(7,1,0); b: e(2,2,5), e(4,2,2), e(6,2,2), e(8,2,5)\n"
     "a: e(3,1,0), e(5,1,0), e(7,1,0); b: e(4,2,2), e(6,2,2), e(8,2,5)\n"
     "a: e(5,1,0), e(7,1,0); b: e(6,2,2), e(8,2,5)"),
    ("gpat_inf_until", Q_GPAT_INF_UNTIL,
     [(1, 0), (2, 5), (1, 0), (2, 2), (1, 7), (2, 2), (1, 0), (2, 5), (1, 8)],
     "a: e(1,1,0), e(3,1,0); b: e(2,2,5), e(4,2,2)"),
    ("corner_01", Q_CORNER_01, [(1, 0), (1, 1), (1, 2)],
     "p: e(1,1,0), e(2,1,1)\n"
     "p: e(1,1,0), e(2,1,1), e(3,1,2)\n"
     "p: e(1,1,0), e(3,1,2)\n"
     "p: e(2,1,1), e(3,1,2)"),
    ("circ_until", Q_CIRC_UNTIL, [(3, 0), (2, 0), (1, 0), (1, 0)],
     "c: e(1,3,0); a: e(3,1,0)\n"
     "c: e(1,3,0); a: e(3,1,0), e(4,1,0)"),
    ("circ_until_optional", Q_CIRC_UNTIL_OPTIONAL, [(3, 0), (2, 0), (1, 0), (1, 0)],
     "c: e(1,3,0)\n"
     "c: e(1,3,0); a: e(3,1,0)\n"
     "c: e(1,3,0); a: e(3,1,0), e(4,1,0)"),
    ("circ_lpat_nm_until_optional", Q_CIRC_LPAT_NM_UNTIL_OPTIONAL,
     [(3, 0), (2, 0), (1, 0), (1, 0)],
     "c: e(1,3,0)\n"
     "c: e(1,3,0); a: e(3,1,0)"),
    ("nested_until", Q_NESTED_UNTIL,
     [(1, 0), (1, 0), (3, 0), (1, 0), (2, 0), (3, 0)],
     "a: e(1,1,0)\n"
     "a: e(1,1,0), e(2,1,0)\n"
     "a: e(1,1,0), e(2,1,0)\n"
     "a: e(2,1,0)\n"
     "a: e(4,1,0)"),
]
