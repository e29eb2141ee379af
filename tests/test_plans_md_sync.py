"""Structural sync between tools/plan_report.py's REPORT list and the
committed PLANS.md (ADVICE r9 medium, the cheap half).

Full content drift needs a SparkSession to re-explain every plan —
that's `python tools/plan_report.py --check`, part of the round
close-out protocol (README). This test is the fast CI tripwire for the
structural failure modes: a REPORT query with no committed section
(someone added a query to REPORT and forgot to regenerate) or a
committed section for a query REPORT no longer names (someone removed
one). Either means PLANS.md was not regenerated after the edit.
"""

from __future__ import annotations

import importlib.util
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_spec = importlib.util.spec_from_file_location(
    "plan_report", REPO / "tools" / "plan_report.py"
)
plan_report = importlib.util.module_from_spec(_spec)
sys.modules["plan_report"] = plan_report
_spec.loader.exec_module(plan_report)


def test_plans_md_sections_match_report_list():
    committed = (REPO / "PLANS.md").read_text()
    sections = re.findall(r"^## (\S+)", committed, flags=re.M)
    report_names = [name for name, _ in plan_report.REPORT]
    # a query may legitimately appear twice in REPORT (re-pinned with an
    # updated claim in a later round) — compare as multisets of names
    assert sorted(sections) == sorted(report_names), (
        "PLANS.md sections diverge from tools/plan_report.py REPORT — "
        "run python tools/plan_report.py"
    )


def test_plans_md_claims_match_report_list():
    """Each section's **Must show:** line must carry the REPORT claim —
    a claim edited in REPORT without regeneration is stale evidence."""
    committed = (REPO / "PLANS.md").read_text()
    claims = dict(
        zip(
            re.findall(r"^## (\S+)", committed, flags=re.M),
            re.findall(r"^\*\*Must show:\*\* (.+)$", committed, flags=re.M),
        )
    )
    for name, claim in plan_report.REPORT:
        assert claims.get(name) == claim or claim in committed, (
            f"PLANS.md claim for {name} diverges from REPORT — "
            "run python tools/plan_report.py"
        )
