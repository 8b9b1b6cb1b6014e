"""Pins the derived driver-sample rotation (VERDICT r5 items 1-2).

The driver's correctness gate samples a 50-query prefix of the
registry each round and banks greens, so the prefix must rotate to
never-sampled queries every round. Round 5 shipped a stale
hand-written order; the order is now DERIVED from the shipped
CORRECTNESS_r*.json artifacts (queries.priority_order), and this test
makes a non-rotated prefix a test failure, not a judge finding.

No SparkSession needed -- these are pure registry/ordering checks.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

from hi_csa_db_spark import queries as Q

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import round_checklist as rc  # noqa: E402

PREFIX = 50  # driver samples the first 50 registry names


def _skip_if_manifest_legitimately_lags():
    """The driver writes CORRECTNESS_r{N}.json AFTER the builder's
    final commit, so a working tree carrying an untracked (or
    newer-than-manifest) driver artifact is the EXPECTED between-rounds
    state, not staleness (VERDICT r7 item 1 — the r6-item-2 failure
    class reborn in the hash-banking layer). Manifest-currency tests
    skip in that state; the hard gate stays in tools/round_checklist.py
    + tools/update_banked_hashes.py --check, which run at round start
    after the refresh."""
    manifest = Q._banked_hashes()
    manifest_round = max(
        (r.get("round", 0) for r in manifest.values() if isinstance(r, dict)),
        default=0,
    )
    latest = rc.latest_round()
    if latest is not None and latest > manifest_round:
        committed = rc.latest_committed_round()
        if committed is None or latest > committed:
            pytest.skip(
                f"driver artifacts for round {latest} not yet committed; "
                "manifest refresh happens at round start "
                "(tools/update_banked_hashes.py)"
            )
        if rc.untracked_or_dirty_artifacts():
            pytest.skip(
                "uncommitted driver artifacts present; round-start "
                "refresh pending (tools/update_banked_hashes.py)"
            )


def _stale_greens():
    """Driver-green names whose current text hash OR transitive
    dependency hash no longer matches the banked manifest -- edited
    since their green (directly, or through an operator/query they
    reference, VERDICT r8 item 2), so they legitimately occupy prefix
    slots for re-proof. Mirrors priority_order()'s banked test."""
    manifest = Q._banked_hashes()
    return {
        n
        for n in Q.driver_green_names()
        if not (
            isinstance(manifest.get(n), dict)
            and manifest[n].get("hash") == Q.query_text_hash(n)
            and manifest[n].get("dep_hash")
            in (None, Q.query_dependency_hash(n))
        )
    }


def test_prefix_never_wastes_a_slot_on_banked_greens():
    """While never-driver-green names remain, every one of the 50
    driver slots is a re-proof (oracle changed / fixed-red), a
    hash-stale green (text edited since its green), or a
    never-sampled name -- never a green-AND-unchanged banked name."""
    order = Q.priority_order()
    greens = Q.driver_green_names()
    never_green_remaining = [n for n in order if n not in greens]
    if len(never_green_remaining) < PREFIX - len(Q._NEEDS_REPROOF):
        # Tail of the schedule: fewer candidates than slots; banked
        # greens legitimately back-fill.
        return
    stale = _stale_greens()
    wasted = [
        n
        for n in order[:PREFIX]
        if n in greens and n not in Q._NEEDS_REPROOF and n not in stale
    ]
    assert wasted == [], f"banked greens occupying driver slots: {wasted}"


def _pending_reproof():
    return [
        n
        for n, since in Q._NEEDS_REPROOF.items()
        if n in Q._QUERIES
        and n not in Q.driver_green_names(after_round=since)
    ]


def test_reproof_names_lead_and_exist():
    order = Q.priority_order()
    reproof = _pending_reproof()
    assert list(order[: len(reproof)]) == reproof
    missing = [n for n in Q._NEEDS_REPROOF if n not in Q._QUERIES]
    assert missing == [], f"_NEEDS_REPROOF names not in registry: {missing}"


def test_reproof_retires_once_a_later_round_confirms(tmp_path, monkeypatch):
    """A reproof name green in an artifact from a round AFTER its
    change leaves the front automatically — proven greens can't waste
    the next round's slots even if nobody prunes the map."""
    import json

    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    name = next(iter(Q._NEEDS_REPROOF))
    since = Q._NEEDS_REPROOF[name]
    (tmp_path / f"CORRECTNESS_r{since:02d}.json").write_text(
        json.dumps({name: green})
    )
    # green only in the change round itself -> still pending
    assert name not in Q.driver_green_names(
        root=str(tmp_path), after_round=since
    )
    (tmp_path / f"CORRECTNESS_r{since + 1:02d}.json").write_text(
        json.dumps({name: green})
    )
    # green in a later round -> retired
    assert name in Q.driver_green_names(
        root=str(tmp_path), after_round=since
    )


def test_flagships_lead_the_never_sampled_block():
    # never-green flagships sort right after the re-proof and
    # hash-stale slices (both legitimately occupy earlier slots).
    order = Q.priority_order()
    greens = Q.driver_green_names()
    reproof = set(_pending_reproof())
    start = len(reproof) + len(_stale_greens() - reproof)
    pending_flagships = [
        n
        for n in Q._FLAGSHIPS
        if n in Q._QUERIES and n not in greens and n not in Q._NEEDS_REPROOF
    ]
    got = list(order[start : start + len(pending_flagships)])
    assert got == pending_flagships


def test_rows_only_names_sort_after_full_oracle_never_names():
    # _FLAGSHIPS is the deliberate exception: a rows-only name
    # promoted to flagship (r11: the sketch_* trio +
    # pipe_reference_replay per VERDICT r10 item 5) sorts with the
    # flagship slice, ahead of full-oracle never names.
    order = Q.priority_order()
    greens = Q.driver_green_names()
    never = [
        n
        for n in order
        if n not in greens
        and n not in Q._NEEDS_REPROOF
        and n not in Q._FLAGSHIPS
    ]
    saw_rows_only = False
    for n in never:
        if n not in Q._ORACLES:
            saw_rows_only = True
        else:
            assert not saw_rows_only, (
                f"full-oracle never-sampled name {n} ordered after a "
                "rows-only name"
            )


def test_order_is_deterministic_and_complete():
    a, b = Q.priority_order(), Q.priority_order()
    assert a == b
    assert sorted(a) == sorted(Q._QUERIES)
    assert list(Q.queries()) == list(a)
    assert list(Q.oracle_sql()) == [n for n in a if n in Q._ORACLES]


def test_green_parser_matches_driver_semantics(tmp_path):
    """driver_green_names: green = no err, rows match, and neither
    schema nor hash recorded False (rows-only checks record null
    hash_match). Unreadable/missing artifacts contribute nothing."""
    rows = {
        "full_green": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
        "rows_only_green": {
            "rows_match": True,
            "schema_match": None,
            "hash_match": None,
            "err": None,
        },
        "hash_red": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": False,
            "err": None,
        },
        "errored": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": "boom",
        },
        "rows_red": {
            "rows_match": False,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    got = Q.driver_green_names(root=str(tmp_path))
    assert got == {"full_green", "rows_only_green"}
    # fresh clone: no artifacts at all -> empty greens, full rotation
    assert Q.driver_green_names(root=str(tmp_path / "nowhere")) == set()


def test_text_hash_staleness_rotates_banked_green_to_front(monkeypatch):
    """ADVICE r6 (medium): an edit to a banked-green query's fn source
    or oracle SQL must auto-rotate it into the driver prefix without a
    hand-added _NEEDS_REPROOF entry. Simulated by desyncing one
    manifest hash."""
    greens = Q.driver_green_names()
    banked_now = [
        n
        for n in Q.priority_order()
        if n in greens and n not in Q._NEEDS_REPROOF
    ]
    assert banked_now, "need at least one banked green to test with"
    victim = banked_now[-1]
    manifest = dict(Q._banked_hashes())
    assert manifest[victim]["hash"] == Q.query_text_hash(victim)
    # Desync: pretend the banked green tested different text.
    manifest[victim] = {"hash": "deadbeefdeadbeef", "round": 1}
    monkeypatch.setattr(Q, "_banked_hashes", lambda *a: manifest)
    order = Q.priority_order()
    reproof = _pending_reproof()
    greens = Q.driver_green_names()
    # victim joins the stale slice: after the hand-map entries, before
    # the first never-green name
    stale_region = []
    for n in order[len(reproof):]:
        if n not in greens:
            break
        stale_region.append(n)
    assert victim in stale_region


def test_green_without_manifest_entry_is_not_banked(monkeypatch):
    """A green name absent from banked_hashes.json (e.g. freshly green
    in the newest artifact, before the round-start refresh) rotates
    forward rather than silently banking."""
    greens = Q.driver_green_names()
    banked_now = [
        n
        for n in Q.priority_order()
        if n in greens and n not in Q._NEEDS_REPROOF
    ]
    victim = banked_now[0]
    manifest = {k: v for k, v in Q._banked_hashes().items() if k != victim}
    monkeypatch.setattr(Q, "_banked_hashes", lambda *a: manifest)
    order = Q.priority_order()
    assert order[len(_pending_reproof())] == victim


def test_manifest_covers_every_driver_green_with_current_text():
    """The committed manifest is current: every driver-green registry
    name has an entry at its latest green round. (If this fails, run
    tools/update_banked_hashes.py -- the round-start refresh.)"""
    _skip_if_manifest_legitimately_lags()
    manifest = Q._banked_hashes()
    latest = Q.driver_green_rounds()
    missing = [
        n
        for n, rnd in latest.items()
        if n in Q._QUERIES
        and (
            n not in manifest
            or manifest[n].get("round", 0) < rnd
        )
    ]
    assert missing == [], (
        f"banked_hashes.json stale for {missing[:10]}; run "
        "tools/update_banked_hashes.py"
    )


def test_query_text_hash_reflects_oracle_and_source():
    name = next(iter(Q._ORACLES))
    h = Q.query_text_hash(name)
    assert h is not None and len(h) == 16
    # deterministic
    assert h == Q.query_text_hash(name)
    assert Q.query_text_hash("no_such_query") is None


def test_update_tool_never_rebanks_without_newer_driver_round(tmp_path):
    """refresh() keeps an entry whose recorded round >= the latest
    green round -- so a mid-round edit cannot be re-banked against the
    old green by re-running the tool."""
    _skip_if_manifest_legitimately_lags()
    import update_banked_hashes as ub

    updated, kept, behind = ub.refresh(dry_run=True)
    assert updated == 0 and behind == []
    assert kept == len(
        [n for n in Q.driver_green_rounds() if n in Q._QUERIES]
    )
