"""Bounded ledger for operator-internal ``cache()`` frames (r13).

``DataFrame.cache()`` registers the plan in the session's CacheManager,
which holds a STRONG reference until ``unpersist()`` — unlike
checkpointed RDD blocks (released by the ContextCleaner when the
driver-side object is GC'd), cached entries from operator internals
(`graph._iter_layout`, the minhash `per_doc` frame) accumulate for the
whole session. Over a 465-query sweep that is hundreds of retained
plans plus their storage blocks (VERDICT r12 item 5: retained driver
heap 399 MiB r11 -> 437-813 MiB r12; at 100 TB it would bleed executor
storage memory).

The ledger bounds that: every operator-internal cache registers here,
keyed by the analyzed plan's ``semanticHash`` so re-caching the SAME
plan refreshes recency instead of duplicating (CacheManager dedups
identical plans into one entry — the bench's min-of-2 regime depends
on pass 2 reusing pass 1's cache, so eviction must never fire on a
plan that was just re-requested). Once more than ``cap`` distinct
plans are live, the least-recently-registered is ``unpersist``ed —
correctness-neutral (a later consumer recomputes), and the cap is far
above any single query's cache count, so eviction only collects
frames from queries that already ran to completion.

Set ``SPARK_GRAFT_ITER_CACHE_CAP`` to tune (default 32; ``0`` disables
eviction and restores the unbounded r12 behavior).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_LEDGER: "OrderedDict[int, DataFrame]" = OrderedDict()


def _cap() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_ITER_CACHE_CAP", "32"))
    except ValueError:
        return 32


def register_cached(df: DataFrame) -> DataFrame:
    """Track a just-``cache()``d DataFrame; evict the oldest distinct
    plan beyond the cap. Returns ``df`` for fluent use."""
    cap = _cap()
    if cap <= 0:
        return df
    try:
        key = int(df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        return df
    evict: list[DataFrame] = []
    with _LOCK:
        if key in _LEDGER:
            _LEDGER.move_to_end(key)
            _LEDGER[key] = df
        else:
            _LEDGER[key] = df
            while len(_LEDGER) > cap:
                _, old = _LEDGER.popitem(last=False)
                evict.append(old)
    for old in evict:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    return df


def release_all() -> int:
    """Unpersist every tracked frame (sweep/test hygiene between
    queries). Returns the number released."""
    with _LOCK:
        items = list(_LEDGER.values())
        _LEDGER.clear()
    n = 0
    for df in items:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n
