"""Incremental aggregation: mergeable partial states.

The 100 TB pipeline pattern the reference's crawl-or-cache guard
gestures at (hi-csa-db.Rmd:105-131): never recompute an aggregate over
the whole history when a delta arrives — keep a partial-state table
(count / sum / min / max / decimal-exact sums per group) and MERGE the
delta's partials in. Works because these aggregates form a commutative
monoid; avg and friends derive from (sum, count) at read time.

merge(state(A), state(B)) == state(A ∪ B) exactly — the decimal sums
make the equality bit-exact, not approximate (tests assert ==).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "sum_v", "min_v", "max_v")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate rows into a mergeable per-key state."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(28,2)")).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two state tables (full outer on keys, monoid combine)."""
    b = base.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in STATE_COLS])
    d = delta.select(*keys, *[F.col(c).alias(f"__d_{c}") for c in STATE_COLS])
    j = b.join(d, list(keys), "full")
    zero = F.lit(0)
    zdec = F.lit(0).cast("decimal(28,2)")
    return j.select(
        *keys,
        (F.coalesce("__b_n_rows", zero) + F.coalesce("__d_n_rows", zero)).alias(
            "n_rows"
        ),
        (F.coalesce("__b_sum_v", zdec) + F.coalesce("__d_sum_v", zdec)).alias(
            "sum_v"
        ),
        F.least(
            F.coalesce("__b_min_v", F.col("__d_min_v")),
            F.coalesce("__d_min_v", F.col("__b_min_v")),
        ).alias("min_v"),
        F.greatest(
            F.coalesce("__b_max_v", F.col("__d_max_v")),
            F.coalesce("__d_max_v", F.col("__b_max_v")),
        ).alias("max_v"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Derive read-time metrics from the state (avg from sum/count)."""
    return state.select(
        "*",
        F.round(F.col("sum_v").cast("double") / F.col("n_rows"), 6).alias("avg_v"),
    )
