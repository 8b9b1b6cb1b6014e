"""CI-style round-hygiene gate (VERDICT r5 item 7).

Round 5 left both r5 JSON artifacts uncommitted and BASELINE.md /
NOTES.md without a round-5 section — the cross-round memory this
project depends on. This script fails (exit 1) when:

1. any ``BENCH_r*.json`` / ``CORRECTNESS_r*.json`` at the repo root is
   untracked or modified-but-uncommitted in git;
2. the latest round N visible in those artifacts has no ``round-N`` /
   ``round N`` / ``r{N}`` mention in BASELINE.md or NOTES.md.

Usage: python tools/round_checklist.py  (run before the end-of-round
commit; tests/test_round_checklist.py keeps the helpers honest).
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def untracked_or_dirty_artifacts(repo: str = REPO) -> list[str]:
    """Artifact files git does not have safely committed."""
    out = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    bad = []
    for line in out.splitlines():
        path = line[3:].strip()
        if re.fullmatch(r"(BENCH|CORRECTNESS)_r\d+\.json", path):
            bad.append(f"{line[:2].strip() or '??'} {path}")
    return bad


def latest_round(repo: str = REPO) -> int | None:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "*_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", os.path.basename(p)))
        and re.match(r"(BENCH|CORRECTNESS)_", os.path.basename(p))
    ]
    return max(rounds) if rounds else None


def latest_committed_round(repo: str = REPO) -> int | None:
    """Latest round N whose BENCH/CORRECTNESS artifact is TRACKED in
    git. The driver writes round-N artifacts AFTER the builder's final
    commit, so the working tree legitimately holds artifacts for a
    round that no committed doc can mention yet (VERDICT r6 item 2) --
    documentation requirements therefore key off the committed set,
    not the on-disk set."""
    out = subprocess.run(
        ["git", "ls-files"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    rounds = [
        int(m.group(1))
        for line in out.splitlines()
        if (m := re.fullmatch(r"(?:BENCH|CORRECTNESS)_r(\d+)\.json", line))
    ]
    return max(rounds) if rounds else None


def doc_mentions_round(path: str, n: int) -> bool:
    if not os.path.exists(path):
        return False
    text = open(path, encoding="utf-8").read().lower()
    pats = [rf"round[- ]{n}\b", rf"\br0?{n}\b", rf"round {n}\b"]
    return any(re.search(p, text) for p in pats)


def main() -> int:
    problems = []
    dirty = untracked_or_dirty_artifacts()
    if dirty:
        problems.append(
            "uncommitted BENCH/CORRECTNESS artifacts:\n  "
            + "\n  ".join(dirty)
        )
    n = latest_committed_round()
    if n is not None:
        for doc in ("BASELINE.md", "NOTES.md"):
            if not doc_mentions_round(os.path.join(REPO, doc), n):
                problems.append(f"{doc} has no round-{n} section")
    # banked_hashes.json must cover every driver-green name at its
    # latest green round (rotation staleness gate, ADVICE r6 medium).
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "update_banked_hashes.py"), "--check"],
        capture_output=True,
        text=True,
    )
    if rc.returncode != 0:
        problems.append(rc.stdout.strip() or "banked_hashes.json stale")
    if problems:
        print("ROUND CHECKLIST FAIL")
        for p in problems:
            print(f"- {p}")
        return 1
    print(f"round checklist ok (latest round artifact: r{n})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
