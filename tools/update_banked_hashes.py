"""Refresh tools/banked_hashes.json from shipped driver artifacts.

Run at ROUND START, right after a new ``CORRECTNESS_r{N}.json`` lands
(the driver runs against the committed snapshot, so at that moment the
committed query/oracle text IS the text round N's greens tested).
For every driver-green name the tool records the CURRENT
(fn source, oracle SQL) hash together with the latest green round —
but only when that round is NEWER than the recorded one, so running
the tool mid-round after editing a banked query can never re-bank the
edited text against an old green (the edit stays stale until a later
driver round confirms it).

queries.priority_order() treats a green as banked only while the
current hash matches this manifest; mismatches rotate to the front of
the driver-sample prefix (ADVICE r6 medium).

Usage: python tools/update_banked_hashes.py
           [--check|--migrate-dep-hashes --evidence <sweep.json>]
  --check  exit 1 if any driver-green registry name lacks a manifest
           entry at its latest green round (round_checklist uses this
           to force the round-start refresh).
  --migrate-dep-hashes  re-fill dep_hash for entries whose TEXT hash
           still matches the banked green (query source unedited).
           Covered cases (r13 contract, per ADVICE r12):
           (a) dependency-hash RESOLUTION changes (e.g. the r9 fix
               making resolution import-state-independent), which flip
               stored dep hashes without any operator edit;
           (b) BEHAVIOR-NEUTRAL dependency edits (an operator/helper
               touched in every query's transitive call graph, e.g.
               the r12 schema memo or the r13 cache ledger), PROVEN
               neutral by a full-registry oracle sweep at the refill
               commit. For case (b) the tool REQUIRES
               --evidence <path>: a check_oracle JSON artifact
               (SPARK_GRAFT_ORACLE_JSON output) covering the whole
               registry with zero failures, which must be COMMITTED
               alongside the refilled manifest — the refill is only
               as trustworthy as that committed proof.
           Entries whose text no longer matches are never touched: an
           edited query stays stale until a later driver round proves
           it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hi_csa_db_spark import queries as Q


def refresh(
    dry_run: bool = False, migrate_dep: bool = False
) -> tuple[int, int, list[str]]:
    """Returns (updated, kept, missing-at-latest-round names)."""
    manifest = dict(Q._banked_hashes())
    latest = Q.driver_green_rounds()
    updated, kept, behind, migrated = 0, 0, [], 0
    for name, rnd in sorted(latest.items()):
        if name not in Q._QUERIES:
            continue  # retired/renamed query: no registry text to hash
        rec = manifest.get(name)
        if isinstance(rec, dict) and rec.get("round", 0) >= rnd:
            # One-time migration (VERDICT r8 item 2): pre-r9 entries
            # carry no dep_hash. Fill it from CURRENT state -- only
            # sound while the operator modules are unedited since the
            # banked green, which is why this tool runs at ROUND
            # START, before any round-N editing begins.
            needs_fill = "dep_hash" not in rec
            needs_migrate = (
                migrate_dep
                and rec.get("hash") == Q.query_text_hash(name)
                and rec.get("dep_hash") != Q.query_dependency_hash(name)
            )
            if not dry_run and (needs_fill or needs_migrate):
                dh = Q.query_dependency_hash(name)
                if dh is not None:
                    rec = dict(rec)
                    rec["dep_hash"] = dh
                    manifest[name] = rec
                    migrated += 1
            kept += 1
            continue
        behind.append(name)
        h = Q.query_text_hash(name)
        if h is None:
            continue
        manifest[name] = {"hash": h, "round": rnd}
        dh = Q.query_dependency_hash(name)
        if dh is not None:
            manifest[name]["dep_hash"] = dh
        updated += 1
    if migrated:
        print(f"dep_hash migration: filled {migrated} legacy entries")
    # Drop manifest entries for names no longer in the registry.
    manifest = {n: r for n, r in manifest.items() if n in Q._QUERIES}
    if not dry_run:
        with open(Q._BANKED_HASHES_PATH, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
            fh.write("\n")
        # The registry memoizes the manifest (lru_cache); drop the
        # pre-write snapshot so a --check or priority_order() call in
        # this same process sees what was just written (ADVICE r7).
        Q._banked_hashes.cache_clear()
    return updated, kept, behind


def report_dep_stale() -> list[str]:
    """Banked entries whose recorded dep_hash no longer matches the
    current transitive dependency state (an operator/helper edit since
    banking). These rotate to the stale front of priority_order() for
    driver re-proof -- reported here so the round record can name
    them (VERDICT r8 item 2: 'flags dependency-stale entries')."""
    manifest = Q._banked_hashes()
    stale = [
        name
        for name, rec in sorted(manifest.items())
        if name in Q._QUERIES
        and isinstance(rec, dict)
        and rec.get("dep_hash") is not None
        and rec["dep_hash"] != Q.query_dependency_hash(name)
    ]
    if stale:
        print(
            f"dependency-stale banked entries ({len(stale)}, will rotate "
            f"for driver re-proof): {stale}"
        )
    return stale


def _validate_evidence(path: str) -> None:
    """Gate for --migrate-dep-hashes (r13 contract): the evidence file
    must be a full-registry oracle sweep with zero failures."""
    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    registry = set(Q._QUERIES)
    covered = registry & set(data)
    missing = registry - set(data)
    if missing:
        raise SystemExit(
            f"--evidence {path} covers {len(covered)}/{len(registry)} "
            f"registry queries; missing e.g. {sorted(missing)[:5]} — a "
            "dep-hash migration needs a FULL-registry sweep."
        )
    def _green(rec: dict) -> bool:
        if rec.get("err") == "no_oracle":
            # rows-only-by-design (pipe_reference_replay) — green when
            # the engine produced rows, same as the driver's gate
            return (rec.get("spark_rows") or 0) > 0
        return bool(rec.get("rows_match") and rec.get("hash_match"))

    bad = [n for n, rec in data.items() if n in registry and not _green(rec)]
    if bad:
        raise SystemExit(
            f"--evidence {path} has {len(bad)} non-green rows "
            f"(e.g. {bad[:5]}) — refusing to migrate dep hashes."
        )
    print(
        f"evidence {path}: {len(covered)} registry queries, all green — "
        "commit this artifact alongside the refilled manifest."
    )


def main() -> int:
    check = "--check" in sys.argv
    migrate = "--migrate-dep-hashes" in sys.argv
    if migrate:
        if "--evidence" not in sys.argv:
            raise SystemExit(
                "--migrate-dep-hashes requires --evidence <sweep.json> "
                "(full-registry check_oracle artifact at this commit; "
                "see the module docstring for the r13 contract)."
            )
        _validate_evidence(sys.argv[sys.argv.index("--evidence") + 1])
    updated, kept, behind = refresh(dry_run=check, migrate_dep=migrate)
    if check:
        report_dep_stale()
        if behind:
            print(
                f"banked_hashes.json is stale for {len(behind)} driver-green "
                f"names (run tools/update_banked_hashes.py): {behind[:10]}"
            )
            return 1
        print(f"banked_hashes.json current ({kept} entries)")
        return 0
    print(f"banked_hashes.json: {updated} updated, {kept} already current")
    report_dep_stale()
    return 0


if __name__ == "__main__":
    sys.exit(main())
