"""Brute-force cross-checks for the late round-3 operators: each Spark
operator is compared against an independent plain-Python reference
implementation on randomized small inputs (fixed seeds — reproducible).
This is the property-test tier of SURVEY.md §5 applied to the new ops:
the oracle gate proves engine-vs-engine parity; these prove
operator-vs-definition parity.
"""

from __future__ import annotations

import random
import re

from hi_csa_db_spark.functions.bpe import bpe_train
from hi_csa_db_spark.operators.dedup import duplicated_spans
from hi_csa_db_spark.operators.temporal import nearest_join


def _tokenize(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _brute_dup_spans(docs: dict[int, str], k: int):
    toks = {i: _tokenize(t) for i, t in docs.items()}
    from collections import Counter

    grams = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            grams[" ".join(t[i : i + k])] += 1
    out = {}
    for d, t in toks.items():
        if len(t) < k:
            continue
        marks = [
            i + 1  # 1-based, matching the operator
            for i in range(len(t) - k + 1)
            if grams[" ".join(t[i : i + k])] >= 2
        ]
        if not marks:
            continue
        spans = []
        start = prev = marks[0]
        for p in marks[1:]:
            if p - prev > k:
                spans.append((start, prev + k - 1))
                start = p
            prev = p
        spans.append((start, prev + k - 1))
        out[d] = (
            len(spans),
            max(e - s + 1 for s, e in spans),
            sum(e - s + 1 for s, e in spans),
            len(t),
        )
    return out


def test_dup_spans_vs_bruteforce(spark):
    rng = random.Random(99)
    vocab = [f"w{j}" for j in range(12)]  # small vocab -> many collisions
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
        for i in range(25)
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["max_span_tokens"],
            r["covered_tokens"],
            r["n_tokens"],
        )
        for r in duplicated_spans(df, k=3).collect()
    }
    assert got == _brute_dup_spans(docs, 3)


def _brute_nearest(probes, builds):
    out = {}
    for pid, k, t in probes:
        cands = [(bt, bid) for bid, bk, bt in builds if bk == k]
        if not cands:
            out[pid] = (None, None)
            continue
        prev = [(bt, bid) for bt, bid in cands if bt <= t]
        nxt = [(bt, bid) for bt, bid in cands if bt >= t]
        # operator semantics: prev = last in (ts, id) order at-or-before;
        # next = first in (ts, id) order at-or-after (excluding equal-ts,
        # which prev captures at gap 0 anyway); ties -> prev
        best_prev = max(prev) if prev else None
        best_next = min(nxt) if nxt else None
        if best_prev is None and best_next is None:
            out[pid] = (None, None)
        elif best_next is None or (
            best_prev is not None and t - best_prev[0] <= best_next[0] - t
        ):
            out[pid] = (best_prev[1], t - best_prev[0])
        else:
            out[pid] = (best_next[1], best_next[0] - t)
    return out


def test_nearest_join_vs_bruteforce(spark):
    rng = random.Random(4)
    probes = [(i, rng.randint(0, 4), rng.randint(0, 50)) for i in range(60)]
    builds = [
        (1000 + i, rng.randint(0, 4), rng.randint(0, 50)) for i in range(40)
    ]
    p = spark.createDataFrame(probes, "pid long, k long, t long")
    b = spark.createDataFrame(builds, "bid long, k long, t long")
    got = {
        r["pid"]: (r["nearest_bid"], r["gap"])
        for r in nearest_join(
            p, b, key="k", ts="t", probe_id="pid", build_id="bid"
        ).collect()
    }
    assert got == _brute_nearest(probes, builds)


def _brute_bpe(words: list[str], rounds: int):
    segs = [list(w) for w in words]
    merges = []
    for _ in range(rounds):
        from collections import Counter

        counts = Counter()
        for s in segs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        best_n = max(counts.values())
        best = min(
            (p for p, n in counts.items() if n == best_n),
            key=lambda p: p[0] + p[1],
        )
        merges.append(("".join(best), best_n))
        new_segs = []
        for s in segs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_segs.append(out)
        segs = new_segs
    return merges


def test_bpe_train_vs_bruteforce(spark):
    rng = random.Random(17)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        for _ in range(80)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = [
        (r["merge"], r["n"])
        for r in bpe_train(df, rounds=3).orderBy("round").collect()
    ]
    assert got == _brute_bpe(words, 3)
