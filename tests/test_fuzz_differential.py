"""Property test: random trees through both kernels (fast fuzz slice).

Full run: `python tools/fuzz_differential.py 2000` (12,000 comparisons;
recorded result: 11,999 exact key matches + 1 matched modulo the
reference's PYTHONHASHSEED-dependent combine-adj group choice).
"""

import subprocess
import sys


def test_fuzz_differential_slice():
    res = subprocess.run(
        [sys.executable, "/root/repo/tools/fuzz_differential.py", "150"],
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert '"pass": true' in res.stdout
