"""Full-suite oracle sweep as a slow-marked test.

The driver's per-round gate samples ~50 of the ~200 gated queries, so a
regression in a never-sampled query could hide indefinitely.  This test
runs the complete ``tools/oracle_check.py`` value sweep (every
``queries()`` entry vs its DuckDB oracle at sf0.01 — row count, column
names, order-insensitive value hash, dtype classes) so the whole suite
is re-verified locally every round:

    python -m pytest tests/ -m slow -q

It runs in a subprocess: the sweep wants the package's own full-size
SparkSession (local[*], 32 shuffle partitions), not the test fixture's
local[4], and the two must not share a JVM.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

SWEEP_SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_full_oracle_sweep():
    proc = subprocess.run(
        [sys.executable, "tools/oracle_check.py", SWEEP_SF_DIR],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = proc.stdout[-6000:] + "\n--- stderr ---\n" + proc.stderr[-2000:]
    assert proc.returncode == 0, tail
