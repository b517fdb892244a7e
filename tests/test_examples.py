"""The quickstart example must stay runnable end-to-end."""

from __future__ import annotations

import os
import subprocess
import sys


def test_quickstart_runs_clean():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "quickstart.py")],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for marker in (
        "materialized products table",
        "pricing summary",
        "curation pipeline",
        "cosine top-k",
    ):
        assert marker in proc.stdout
