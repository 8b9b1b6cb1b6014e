"""Scan-count outlier pager over the committed PLANS.md (VERDICT r10
item 7): graph_matching's 220-scan lineage blow-up sat in PLANS.md
for rounds without any reader noticing. This test recomputes the
outlier rule from tools/plan_report.py over the committed report, so
a pathological plan fails CI the round it is introduced instead of
waiting for a judge.

The rule (scans > max(3x family median, absolute floor)) and the
annotated allowlist live in tools/plan_report.py — one source of
truth for the generator, the report section, and this pin.
"""

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

import plan_report  # noqa: E402


def _rows():
    path = os.path.join(_REPO, "PLANS.md")
    with open(path, encoding="utf-8") as fh:
        return plan_report.parse_plans_table(fh.read())


def test_plans_md_parses_to_full_table():
    rows = _rows()
    # HEADLINE + EXTRA coverage: the parse must see the whole report,
    # otherwise an empty outlier list would be vacuous.
    assert len(rows) >= len(plan_report.EXTRA)
    names = {n for n, _ in rows}
    assert "q1_pricing_summary" in names
    assert "graph_matching" in names


def test_no_scan_count_outliers():
    outliers = plan_report.scan_outliers(_rows())
    assert not outliers, (
        "scan-count outlier(s) in PLANS.md — a plan is re-deriving "
        "its lineage (the graph_matching 220-scan failure mode). "
        "Fix the plan (localCheckpoint the shared subtree) or add an "
        f"annotated allowlist entry in tools/plan_report.py: {outliers}"
    )


def test_allowlist_entries_are_annotated():
    for name, why in plan_report._OUTLIER_ALLOWLIST.items():
        assert isinstance(why, str) and len(why) >= 20, (
            f"allowlist entry {name} needs a real justification"
        )


def test_outlier_rule_catches_the_r10_failure_mode():
    # The rule that motivated the pager: graph_matching at 220 scans
    # against a family median of ~0 must flag; the same query at its
    # fixed post-checkpoint 0 scans must not.
    rows = [("graph_a", 0), ("graph_b", 1), ("graph_matching", 220)]
    flagged = plan_report.scan_outliers(rows)
    assert [(n, s) for n, s, _ in flagged] == [("graph_matching", 220)]
    rows[-1] = ("graph_matching", 0)
    assert plan_report.scan_outliers(rows) == []
