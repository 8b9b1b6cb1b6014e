"""Pins SCALE.md's round-8 global-window ledger (VERDICT r7 item 6).

An UNPARTITIONED ``Window.orderBy`` plans a single-partition sort of
its whole input — fine over a bounded dimension (days, shards, top-k
outputs), a scale-killer over a corpus-sized relation. Round 8
migrated the three corpus-sized sites onto
``ordered.global_row_numbers``; this test makes the remaining set an
explicit allowlist so a new unpartitioned window can't land without a
bounded-frame classification (add it to the allowlist AND the SCALE.md
table, or partition/migrate it).

Pure static analysis (ast) — no SparkSession.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "hi_csa_db_spark")

# enclosing-FUNCTION allowlist (file-agnostic, so the round-8 family
# split and future moves don't stale it): every entry appears in
# SCALE.md's "global-window ledger" table with a bounded-frame
# justification.
ALLOWED = {
    # the distributed-rank primitive's own per-partition offset window
    # (one row per range partition)
    "global_row_numbers",
    "global_prefix_sums",
    # top-k-bounded rank windows (<= 10/20 rows)
    "ret2_rrf_fusion",
    "ret5_hard_negatives",
    "ret6_prf_expansion",
    "graph_link_prediction",
    # dimension-bounded running frames (days / shards / buckets / dims
    # / distinct small-integer scores)
    "t22_hazard_table",
    "u21_compaction_plan",
    "dq15_cusum_drift",
    "ml_auc_ranking",
    "t48_time_to_convert",
    "x87_embedding_drift",
    "x91_budget_apportionment",
    "dq23_wap_gate",
    # round-9: two rank windows inside .limit(10) frames (10 rows)
    "u32_incremental_topk",
}


def _unpartitioned_window_sites():
    """(relpath, enclosing_fn, lineno) for every Window.orderBy whose
    receiver is the Window CLASS (a partitioned spec reads
    Window.partitionBy(...).orderBy(...) — receiver is a Call, not the
    Window name)."""
    sites = []
    for dirpath, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG)
            tree = ast.parse(open(path, encoding="utf-8").read())
            # map lineno -> innermost enclosing function name
            spans = []
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    spans.append(
                        (node.lineno, node.end_lineno, node.name)
                    )
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Attribute)
                    and node.attr == "orderBy"
                    and isinstance(node.value, ast.Name)
                    and node.value.id == "Window"
                ):
                    encl = None
                    best = None
                    for lo, hi, name in spans:
                        if lo <= node.lineno <= hi and (
                            best is None or hi - lo < best
                        ):
                            encl, best = name, hi - lo
                    sites.append((rel, encl, node.lineno))
    return sites


def test_every_unpartitioned_global_window_is_classified():
    sites = _unpartitioned_window_sites()
    assert sites, "detector broke: the known bounded sites exist"
    unlisted = [s for s in sites if s[1] not in ALLOWED]
    assert unlisted == [], (
        "unpartitioned Window.orderBy outside the SCALE.md ledger "
        f"(classify as bounded there + here, or migrate to "
        f"ordered.global_row_numbers/global_prefix_sums): {unlisted}"
    )


def test_ledger_entries_still_exist():
    """Allowlist hygiene: drop entries whose site disappeared."""
    live = {s[1] for s in _unpartitioned_window_sites()}
    gone = ALLOWED - live
    assert gone == set(), f"stale ledger entries (site removed): {gone}"
