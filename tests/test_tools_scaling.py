"""Pure-Python tests for tools/scaling.py's reporting logic — the
round-4 advisor's two findings: the hand-maintained correctness
section must survive regeneration, and a super-linear EARLIER step
must still flag even when the last step is tame."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.scaling import (  # noqa: E402
    DATA_RATIO,
    NOISE_FLOOR_SEC,
    PRESERVE_MARKER,
    _preserved_tail,
    _verdict,
)


def test_preserved_tail_roundtrip(tmp_path):
    p = tmp_path / "SCALING.md"
    p.write_text(
        "# SCALING\n\n| table |\n\n"
        f"{PRESERVE_MARKER} (not just wall-clock)\n\nhand-written battery\n"
    )
    tail = _preserved_tail(str(p))
    assert tail.startswith(PRESERVE_MARKER)
    assert "hand-written battery" in tail


def test_preserved_tail_absent_cases(tmp_path):
    assert _preserved_tail(str(tmp_path / "missing.md")) == ""
    p = tmp_path / "no_marker.md"
    p.write_text("# SCALING\njust a table\n")
    assert _preserved_tail(str(p)) == ""


def test_verdict_bands():
    assert _verdict(DATA_RATIO + 0.1, 5.0) == "SUPER-LINEAR"
    # SUPER-LINEAR on the LAST step is never noise-floored
    assert _verdict(DATA_RATIO + 0.1, 0.1) == "SUPER-LINEAR"
    assert _verdict(5.0, NOISE_FLOOR_SEC + 1) == "REVIEW"
    assert _verdict(5.0, NOISE_FLOOR_SEC / 2) == "noise-floor"
    assert _verdict(2.0, 100.0) == "sub-linear/overhead"


def test_any_step_escalation_rule():
    """Mirror of the inline escalation in main(): an earlier step
    beyond DATA_RATIO escalates iff its larger wall clears the noise
    floor, regardless of the last step's ratio."""
    def escalate(verdict, r1, c):
        if verdict != "SUPER-LINEAR" and r1 > DATA_RATIO and c >= NOISE_FLOOR_SEC:
            return "SUPER-LINEAR"
        return verdict

    # tame last step, wild first step with a real wall -> flag
    assert escalate(_verdict(1.2, 12.0), 15.0, 12.0) == "SUPER-LINEAR"
    # wild first step but sub-second wall -> noise, no flag
    assert escalate(_verdict(1.2, 0.9), 15.0, 0.9) == "sub-linear/overhead"
