"""Sanitizer tier (SURVEY.md §5): the C oracle driven under ASan + UBSan.

The reference wired no sanitizers (its shared-memory vecenv was "correct by
discipline"); here the only C on the correctness path is exercised across
every task x integrator with -fno-sanitize-recover, so any heap error,
overflow, or UB aborts the binary and fails this test. The JAX side needs no
equivalent — it is functionally pure, and the determinism tests double as
the race detector."""

import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_oracle_clean_under_asan_ubsan():
    subprocess.run(["make", "-C", str(REPO / "oracle"), "sanitize_check"],
                   check=True, capture_output=True)
    r = subprocess.run([str(REPO / "oracle" / "sanitize_check")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "SANITIZE_OK steps=72000" in r.stdout
