"""Declarative data-quality expectations — the constraint/validation
engine (Delta constraints / Great Expectations shape) evaluated the
Spark-first way: every row-level rule folds into ONE map-combined
aggregate pass over the table (no per-rule scans), set-level rules
(uniqueness, referential integrity) each add exactly one keyed
aggregate or anti-join.

A rule is (name, Column condition) where the condition is TRUE for
GOOD rows; the report is one row per rule with the violation count
and the checked-row total. At 100 TB: the row-rule pass is a single
scan with partial aggregation (a few counters per partition), so
validation costs one read of the data — the same posture as
catalog.publish's Observation metrics, which validate DURING a write
for zero extra scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(name: str, cond: Column) -> tuple[str, Column]:
    return (name, cond)


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null:{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"range:{col}",
        F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return (f"regex:{col}", F.col(col).isNotNull() & F.col(col).rlike(pattern))


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (f"accepted:{col}", F.col(col).isin(values))


def check_rows(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """All row-level rules in ONE aggregate pass: (rule, n_checked,
    n_violations). Stack-style output so adding rules never changes
    the schema."""
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            # NULL conditions count as violations (a row is only good
            # when the condition is provably TRUE) — when/otherwise,
            # not (~cond).cast, whose NULL would vanish from the sum
            F.sum(F.when(cond, 0).otherwise(1)).alias(f"__v_{i}")
            for i, (_, cond) in enumerate(rules)
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_checked"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return agg.select(F.explode(pairs).alias("r")).select(
        "r.rule", "r.n_checked", "r.n_violations"
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """(rule, n_checked, n_violations): rows beyond the first per key
    are violations — one keyed aggregate, same shuffle key a
    dedup/merge of the table would use."""
    name = "unique:" + ",".join(cols)
    g = df.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return g.agg(
        F.lit(name).alias("rule"),
        F.sum("__c").alias("n_checked"),
        F.sum(F.col("__c") - 1).alias("n_violations"),
    )


def check_fk(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential integrity: child keys with no parent — a left-anti
    join (broadcast when the parent is dimension-sized)."""
    name = f"fk:{child_col}->{parent_col}"
    n = child.agg(F.count(F.lit(1)).alias("__n"))
    orphans = child.join(
        parent.select(F.col(parent_col)).distinct(),
        child[child_col] == F.col(parent_col),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("__v"))
    return n.crossJoin(orphans).select(
        F.lit(name).alias("rule"),
        F.col("__n").alias("n_checked"),
        F.col("__v").alias("n_violations"),
    )


def column_profile(df: DataFrame, cols) -> DataFrame:
    """Per-column completeness/cardinality/bounds profile — the
    ``describe`` report every pipeline runs before trusting a new
    table drop: (column, n_rows, n_null, n_distinct, min_val, max_val).

    ``cols``: (name, typed expression, render) triples. Stats are
    computed on the TYPED expression (numeric min is numeric, not
    lexicographic); ``render`` maps the min/max results to an
    engine-portable string (decimals for floats, ISO dates) so the
    unpivoted report has one uniform column type.

    Shape: ONE aggregate pass over the table computing every column's
    stats side by side, then an unpivot of the single result row into
    one output row per column (driver-size data). The multi-column
    COUNT(DISTINCT) does use Catalyst's Expand (one input replica per
    distinct aggregate) — the standard profiling trade; at 100 TB
    profile in column groups or swap exact distinct for HLL (a12) if
    the expand dominates.
    """
    aggs = []
    for name, expr, _render in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{name}"),
            (F.count(F.lit(1)) - F.count(expr)).alias(f"__null_{name}"),
            F.countDistinct(expr).alias(f"__dist_{name}"),
            F.min(expr).alias(f"__min_{name}"),
            F.max(expr).alias(f"__max_{name}"),
        ]
    one = df.agg(*aggs)
    packed = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("column"),
                        F.col(f"__n_{name}").cast("bigint").alias("n_rows"),
                        F.col(f"__null_{name}").cast("bigint").alias("n_null"),
                        F.col(f"__dist_{name}").cast("bigint").alias("n_distinct"),
                        render(F.col(f"__min_{name}")).alias("min_val"),
                        render(F.col(f"__max_{name}")).alias("max_val"),
                    )
                    for name, _, render in cols
                ]
            )
        ).alias("p")
    )
    return packed.select("p.*")
