"""Examples must keep running — they are the narrative entry points a
new user executes first, and nothing else exercises them."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_self_healing_stream_example_runs_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "self_healing_stream.py")],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # each leg produced its expected evidence
    assert "widened" in out and "removed" in out and "added" in out
    assert "alice2" in out  # CDC latest-wins survivor
    assert "loaded" in out and "malformed" in out  # quarantine routing
