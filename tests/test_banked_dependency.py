"""Dependency-aware banked-hash staleness (VERDICT r8 item 2).

Round 8 migrated operators/dedup.py:sorted_neighborhood_pairs onto
ordered.global_row_numbers, changing the physical plans of five banked
queries (d15, er1-er4) without rotating any of them forward for driver
re-proof: tools/banked_hashes.json hashed only each query's OWN text.
queries.query_dependency_hash closes the blind spot by digesting the
transitive hi_csa_db_spark call graph; these tests pin that an
operator-level edit now marks its dependents stale.
"""

from __future__ import annotations

import json

import pytest

from hi_csa_db_spark import queries as Q


def _clear_dep_cache():
    Q.query_dependency_hash.cache_clear()


def test_refs_capture_direct_operator_call():
    refs = Q.query_dependency_refs("d15_sorted_neighborhood")
    assert refs is not None
    assert "hi_csa_db_spark.operators.dedup:sorted_neighborhood_pairs" in refs


def test_refs_capture_transitive_operator_call():
    """d15's own text never names global_row_numbers -- it reaches it
    through sorted_neighborhood_pairs. The r8 migration would have
    rotated d15 under this rule."""
    for name in (
        "d15_sorted_neighborhood",
        "er1_entity_resolution",
        "er2_blocking_recall",
        "er3_golden_record",
        "er4_blocking_eval",
    ):
        refs = Q.query_dependency_refs(name)
        assert refs is not None, name
        assert (
            "hi_csa_db_spark.operators.ordered:global_row_numbers" in refs
        ), (name, sorted(refs))


def test_registry_plumbing_excluded():
    """_register / the registry dicts are shared by every query; if
    they counted as dependencies, ANY registry edit would rotate the
    whole bank."""
    for name in ("q1_pricing_summary", "d15_sorted_neighborhood"):
        refs = Q.query_dependency_refs(name)
        assert "hi_csa_db_spark.queries:_register" not in refs
        assert "const:_ORACLES" not in refs
        assert "const:_QUERIES" not in refs


def test_operator_edit_changes_dependent_hashes(monkeypatch):
    """Simulate an edit to sorted_neighborhood_pairs: every query whose
    transitive deps include it gets a NEW dependency hash; unrelated
    queries keep theirs."""
    target = "hi_csa_db_spark.operators.dedup:sorted_neighborhood_pairs"
    dependents = [
        n
        for n in Q._QUERIES
        if (Q.query_dependency_refs(n) or {}).get(target) is not None
    ]
    assert "d15_sorted_neighborhood" in dependents
    unrelated = "q1_pricing_summary"
    assert unrelated not in dependents

    _clear_dep_cache()
    before = {n: Q.query_dependency_hash(n) for n in dependents + [unrelated]}

    real = Q._object_source_hash

    def edited(obj):
        h = real(obj)
        qn = getattr(obj, "__qualname__", "")
        if qn == "sorted_neighborhood_pairs":
            return "EDITED" + h
        return h

    monkeypatch.setattr(Q, "_object_source_hash", edited)
    _clear_dep_cache()
    try:
        after = {n: Q.query_dependency_hash(n) for n in dependents + [unrelated]}
    finally:
        monkeypatch.undo()
        _clear_dep_cache()

    for n in dependents:
        assert after[n] != before[n], n
    assert after[unrelated] == before[unrelated]


def test_dep_stale_entry_rotates_to_front(monkeypatch):
    """A banked green whose recorded dep_hash mismatches the current
    dependency state leaves the banked tail and re-enters the driver
    prefix (stale slice), exactly like a text edit."""
    manifest = dict(Q._banked_hashes())
    victim = next(
        (
            n
            for n in ("d15_sorted_neighborhood", "er1_entity_resolution")
            if isinstance(manifest.get(n), dict)
            and manifest[n].get("dep_hash")
        ),
        None,
    )
    if victim is None:
        pytest.skip("no dep_hash-carrying banked entry yet (pre-migration)")
    order = Q.priority_order()
    baseline_pos = order.index(victim)

    rec = dict(manifest[victim])
    rec["dep_hash"] = "0" * 16  # a dependency edit happened since banking
    manifest[victim] = rec
    monkeypatch.setattr(Q, "_banked_hashes", lambda *a: manifest)
    rotated = Q.priority_order()
    monkeypatch.undo()

    pos = rotated.index(victim)
    assert pos < baseline_pos
    assert pos < 50, "dep-stale entry must re-enter the 50-slot driver prefix"


def test_manifest_entries_carry_dep_hash():
    """Post-migration invariant: every banked entry records the
    dependency hash alongside the text hash."""
    with open(Q._BANKED_HASHES_PATH, encoding="utf-8") as fh:
        manifest = json.load(fh)
    missing = [
        n
        for n, rec in manifest.items()
        if n in Q._QUERIES and "dep_hash" not in rec
    ]
    assert not missing, missing


def test_dependency_hash_deterministic():
    a = Q.query_dependency_hash("d15_sorted_neighborhood")
    _clear_dep_cache()
    b = Q.query_dependency_hash("d15_sorted_neighborhood")
    assert a == b and a is not None
    assert Q.query_dependency_hash("no_such_query") is None


def test_dependency_hash_is_import_state_independent():
    """The r9 continuation bug: dep hashes resolved function-local
    imports through the CURRENT process's import state (sys.modules
    lookups and package getattrs), so a query's hash flipped when an
    earlier test happened to import operators.packing or
    streaming.windows — rotating ~30 banked greens mid-suite.
    query_dependency_hash must return the same digest in a process
    that pre-imports nothing and one that pre-imports the operator
    modules the queries reach through function-local imports."""
    import subprocess
    import sys

    names = "stream_stream_join x44_ffd_packing t10_interval_overlap"
    prog = (
        "import sys; sys.path.insert(0, '/root/repo'); {pre}"
        "import hi_csa_db_spark.queries as Q; "
        "print(','.join(str(Q.query_dependency_hash(n)) "
        f"for n in '{names}'.split()))"
    )
    bare = subprocess.run(
        [sys.executable, "-c", prog.format(pre="")],
        capture_output=True, text=True, timeout=300,
    )
    warmed = subprocess.run(
        [
            sys.executable,
            "-c",
            prog.format(
                pre="import hi_csa_db_spark.operators.packing, "
                "hi_csa_db_spark.streaming.windows, "
                "hi_csa_db_spark.operators.temporal; "
            ),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert bare.returncode == 0, bare.stderr[-500:]
    assert warmed.returncode == 0, warmed.stderr[-500:]
    assert bare.stdout.strip() == warmed.stdout.strip()
    assert "None" not in bare.stdout
