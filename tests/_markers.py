"""Shared opt-in markers (r14, verdict item 2: the default suite must
finish well inside the driver's verify budget — it had grown to ~22 min
idle / 40-57 min under host load, and the driver's truncated run scored
`tests_ok: false` on runtime with zero failures).

HEAVY gates the randomized / hypothesis / python-model / brute-force
batteries — the tests whose value is adversarial breadth, not smoke
coverage. Every operator they exercise keeps a fast deterministic
witness in the default suite (and the oracle-parity gates still run).
Run them with:

    HEAVY=1 python -m pytest tests/ -q

(the same opt-in pattern as the existing SWEEP=1 sf0.1 sweep).
"""

import os

import pytest

HEAVY = pytest.mark.skipif(
    not os.environ.get("HEAVY"),
    reason="heavy randomized/property/model battery: opt-in with HEAVY=1",
)
