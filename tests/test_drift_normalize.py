"""Drift adjudication rules (scripts/drift_normalize.py, round 14).

The mover rule is "exceeds the floor under BOTH calibration divisors,
same direction" — a query either divisor explains is box state; the
VERDICT line must never print the all-clear over unexplained raw
inflation (both were review findings this round)."""

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "drift_normalize",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "drift_normalize.py",
    ),
)
dn = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dn)


def _run(tmp_path, capsys, a, b):
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    import sys

    old = sys.argv
    sys.argv = ["drift_normalize.py", str(pa), str(pb)]
    try:
        assert dn.main() == 0
    finally:
        sys.argv = old
    return capsys.readouterr().out


def _rec(calib_ms, shuf_ms, queries_ms):
    return {
        "unit": "ms",
        "calib_ms": calib_ms,
        "calib_shuffle_ms": shuf_ms,
        "queries": queries_ms,
    }


def test_mover_explained_by_one_divisor_does_not_flag(tmp_path, capsys):
    # cpu calibration doubled; a query up x1.8 raw is UNDER the cpu
    # divisor (x0.9) even though it exceeds the flat shuffle divisor —
    # straddling divisors must not produce a false regression signal
    out = _run(
        tmp_path, capsys,
        _rec(1000, 1500, {"q": 1000}),
        _rec(2000, 1500, {"q": 1800}),
    )
    assert "movers beyond" not in out


def test_mover_beyond_both_divisors_flags(tmp_path, capsys):
    out = _run(
        tmp_path, capsys,
        _rec(1000, 1500, {"q": 1000, "r": 1000}),
        _rec(1000, 1500, {"q": 2000, "r": 1000}),
    )
    assert "movers beyond BOTH calibration divisors" in out
    assert "q " in out and "\n  r " not in out


def test_verdict_unexplained_raw_inflation_is_regression_hunt(tmp_path, capsys):
    # raw x1.5 with shuffle divisor x0.8: neither all-clear nor
    # bandwidth mode — the residual is named a regression hunt even
    # though inflation is spread below the per-query floor
    a = {f"q{i}": 1000 for i in range(10)}
    b = {f"q{i}": 1240 for i in range(10)}  # x1.24 each, under floor
    b["q0"] = 3360  # lifts the raw total over the 1.25 floor
    out = _run(tmp_path, capsys, _rec(1000, 1500, a), _rec(1000, 1200, b))
    assert "REGRESSION HUNT" in out


def test_verdict_bandwidth_mode_when_shuffle_row_tracks(tmp_path, capsys):
    a = {f"q{i}": 1000 for i in range(4)}
    b = {f"q{i}": 1400 for i in range(4)}
    out = _run(tmp_path, capsys, _rec(1000, 1000, a), _rec(900, 1400, b))
    assert "box bandwidth mode" in out
