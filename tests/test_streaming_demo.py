"""The end-to-end streaming demo (rate source → match_pattern_stream →
memory sink, asserted against a batch-kernel replay) must stay runnable
— it is the shape a streaming driver contract would exercise.  Run as a
subprocess: the script owns its own SparkSession lifecycle and stop()
semantics, which must not fight the suite's session fixture."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_streaming_demo_passes_batch_replay():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "scripts", "streaming_demo.py"),
            "--rows-per-sec", "400",
            "--min-matches", "25",
            "--timeout-s", "150",
        ],
        capture_output=True,
        text=True,
        timeout=280,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "PASS:" in proc.stdout
