"""Differential gate: our kernel vs the actual (patched) reference code.

Runs the reference's extract_one — loaded from /root/reference/src through
the pure-python spaCy shim, dedent-patched per SURVEY.md §0.1.1 — on the
same token trees as our kernel, and requires exact (s, v, o) set equality
on the fixture corpus. The full three-corpus P/R report is
tools/differential.py (recorded in DIFFERENTIAL.md).
"""

import subprocess
import sys

import pytest


@pytest.mark.order(-1)
def test_differential_pr_gate():
    # run in a subprocess so the spaCy shim never pollutes this interpreter
    res = subprocess.run(
        [sys.executable, "/root/repo/tools/differential.py"],
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert '"pass": true' in res.stdout
