"""Temporal join operators Spark has no built-in for: as-of and range.

The reference is batch-and-loop R with no temporal joins; these are
part of the engine's extension surface (event-stream analytics over
the ``events`` fixture). Both are expressed as compositions of
built-in DataFrame ops — never a broadcast nested-loop join:

- as-of join: union the probe and build streams, tag, and forward-fill
  build-side attributes with a ``last(ignorenulls)`` window over
  (key, event-time). ONE shuffle on the key, O(n log n) local sort,
  no join at all — the classic log-structured as-of plan. At 100 TB
  this scales as a single repartition+sort per key range.
- range join: band (bucket) the time axis at the range width,
  replicate the build side into each bucket it can match, equi-join on
  (key, bucket), then apply the exact range predicate. Turns the
  quadratic interval cross-product into a hash join with bounded
  per-bucket fanout (the banded range-join rewrite Spark's optimizer
  lacks; e.g. Databricks' range-join hint does the same).

All event-time comparisons use the raw int64 nanos column (``ts_ns``)
for cross-engine determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    build_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each probe row, attach the most recent build row with
    build.ts <= probe.ts for the same key (inclusive as-of semantics,
    matching DuckDB ``ASOF JOIN ... ON probe.ts >= build.ts``).

    Probe rows with no prior build row keep NULLs (left as-of join).
    Returns all probe columns plus ``<col><suffix>`` per build_col.
    """
    tagged = probe.select(
        F.lit(1).alias("__is_probe"),
        key,
        ts,
        *[c for c in probe.columns if c not in (key, ts)],
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}") for c in build_cols],
    ).unionByName(
        build.select(
            F.lit(0).alias("__is_probe"),
            key,
            ts,
            *[
                F.lit(None).cast(probe.schema[c].dataType).alias(c)
                for c in probe.columns
                if c not in (key, ts)
            ],
            *[F.col(c).alias(f"__b_{c}") for c in build_cols],
        )
    )
    # build rows sort before probe rows at equal ts => inclusive match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "*",
        *[
            F.last(f"__b_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in build_cols
        ],
    )
    return filled.filter(F.col("__is_probe") == 1).drop(
        "__is_probe", *[f"__b_{c}" for c in build_cols]
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    range_ns: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Count right rows with left.ts < right.ts <= left.ts + range_ns
    per left row (banded range join).

    Returns every left row's (left_id, key, ts, n_in_range) — zero
    counts included. The right side is replicated into the two bands a
    match can live in; each (left,right) pair then meets in EXACTLY one
    band (the left row's own), so no post-join dedup is needed.
    """
    lb = left.select(
        F.col(left_id), F.col(key), F.col(ts),
        F.floor(F.col(ts) / F.lit(range_ns)).alias("__band"),
    )
    rb = right.select(
        F.col(right_id).alias("__rid"),
        F.col(key).alias("__rk"),
        F.col(ts).alias("__rts"),
        F.explode(
            F.array(
                F.floor(F.col(ts) / F.lit(range_ns)),
                F.floor(F.col(ts) / F.lit(range_ns)) - 1,
            )
        ).alias("__band"),
    )
    hits = (
        lb.join(rb, (lb[key] == rb["__rk"]) & (lb["__band"] == rb["__band"]))
        .filter(
            (F.col("__rts") > F.col(ts))
            & (F.col("__rts") <= F.col(ts) + F.lit(range_ns))
        )
        .groupBy(left_id)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        lb.join(hits, left_id, "left")
        .select(
            left_id,
            key,
            ts,
            F.coalesce("__n", F.lit(0)).alias("n_in_range"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    cell_ns: int,
    lo: str = "lo",
    hi: str = "hi",
    left_id: str = "lid",
    right_id: str = "rid",
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join (strict: l.lo < r.hi and
    r.lo < l.hi), grid-bucketed so it is an EQUI-join at any scale.

    Each interval explodes into the time-grid cells it covers
    (closed-open [lo, hi)); candidates meet on (key, cell) and the
    exact overlap predicate filters them. A pair overlapping across
    multiple shared cells appears multiple times, hence the distinct
    on (left_id, right_id). Fan-out per interval = its length /
    cell_ns — pick the cell near the typical interval length so the
    blow-up stays O(1) per row. This replaces the theta join a naive
    plan would pick (quadratic per key at cluster scale; the oracle
    DOES use the theta form — DuckDB is fine with it at fixture
    scale, which is exactly the check that the bucketing loses no
    pairs)."""
    lc = left.select(
        F.col(left_id), F.col(key), F.col(lo).alias("__llo"), F.col(hi).alias("__lhi"),
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(cell_ns)),
                F.floor((F.col(hi) - 1) / F.lit(cell_ns)),
            )
        ).alias("__cell"),
    )
    rc = right.select(
        F.col(right_id), F.col(key).alias("__rk"),
        F.col(lo).alias("__rlo"), F.col(hi).alias("__rhi"),
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(cell_ns)),
                F.floor((F.col(hi) - 1) / F.lit(cell_ns)),
            )
        ).alias("__cell"),
    )
    return (
        lc.join(rc, (lc[key] == rc["__rk"]) & (lc["__cell"] == rc["__cell"]))
        .filter((F.col("__llo") < F.col("__rhi")) & (F.col("__rlo") < F.col("__lhi")))
        .select(left_id, right_id, F.col(key))
        .distinct()
    )


def nearest_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    probe_id: str,
    build_id: str,
) -> DataFrame:
    """NEAREST-neighbour temporal join: for each probe row, the build
    row (same key) minimizing |build.ts - probe.ts| in EITHER
    direction; ties between the preceding and following candidate
    resolve to the preceding one. Probe rows with no build row for the
    key keep NULLs.

    Like asof_join, this needs ZERO joins: union + tag, then a
    forward last(ignorenulls) window (nearest at-or-before) and a
    backward first(ignorenulls) window (nearest after) over the SAME
    (key, ts) sort — Catalyst evaluates both frames in one Window node
    over one shuffle, and the argmin is a scalar CASE. At 100 TB this
    is a single repartition+sort per key, no candidate explosion.

    Returns (probe_id, key, ts, nearest_<build_id>, gap) where gap =
    |build.ts - probe.ts| in the ts column's units.
    """
    tagged = probe.select(
        F.col(probe_id).alias("__pid"),
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__is_probe"),
        F.lit(None).cast(build.schema[build_id].dataType).alias("__bid"),
        F.lit(None).cast(build.schema[ts].dataType).alias("__bts"),
    ).unionByName(
        build.select(
            F.lit(None).cast(probe.schema[probe_id].dataType).alias("__pid"),
            F.col(key),
            F.col(ts),
            F.lit(0).alias("__is_probe"),
            F.col(build_id).alias("__bid"),
            F.col(ts).alias("__bts"),
        )
    )
    order = [
        F.col(ts).asc(),
        F.col("__is_probe").asc(),
        F.col("__bid").asc_nulls_last(),
    ]
    fwd = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    enriched = tagged.select(
        "*",
        F.last("__bts", ignorenulls=True).over(fwd).alias("__prev_ts"),
        F.last("__bid", ignorenulls=True).over(fwd).alias("__prev_id"),
        F.first("__bts", ignorenulls=True).over(bwd).alias("__next_ts"),
        F.first("__bid", ignorenulls=True).over(bwd).alias("__next_id"),
    ).filter(F.col("__is_probe") == 1)
    prev_gap = F.col(ts) - F.col("__prev_ts")
    next_gap = F.col("__next_ts") - F.col(ts)
    take_prev = F.col("__next_ts").isNull() | (
        F.col("__prev_ts").isNotNull() & (prev_gap <= next_gap)
    )
    return enriched.select(
        F.col("__pid").alias(probe_id),
        key,
        ts,
        F.when(take_prev, F.col("__prev_id"))
        .otherwise(F.col("__next_id"))
        .alias(f"nearest_{build_id}"),
        F.when(take_prev, prev_gap).otherwise(next_gap).alias("gap"),
    )
