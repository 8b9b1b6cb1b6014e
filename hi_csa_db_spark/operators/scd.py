"""Slowly-changing-dimension Type 2: full change history with
validity intervals — the warehouse pattern for dimensions whose
attributes drift (reference analogue: the sheets re-pulled per render,
hi-csa-db.Rmd:470-471, where each pull may change rows silently; SCD2
is what preserving those generations properly looks like).

Rows carry (valid_from, valid_to, is_current): applying snapshot
version v closes changed/deleted rows at v and opens new/changed rows
from v. Change detection compares an md5 attribute hash, so applying
a snapshot is two hash-joins on the business key — no column-by-column
comparison explosion, and the history table only ever grows by the
changed slice (at 100 TB: the snapshot diff is the small side and
broadcasts; history stays partitioned by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN = None  # valid_to of a current row


def attr_hash(cols: list[str]) -> F.Column:
    """Deterministic row-content hash over the tracked attributes.
    Cast floats/decimals to DECIMAL-backed strings upstream — raw
    double formatting differs across engines."""
    return F.md5(F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))


def scd2_init(snapshot: DataFrame, key: str, attrs: list[str], version: int) -> DataFrame:
    """First snapshot -> all rows open from ``version``."""
    return snapshot.select(
        key,
        *attrs,
        attr_hash(attrs).alias("attr_hash"),
        F.lit(version).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )


def scd2_apply(
    history: DataFrame, snapshot: DataFrame, key: str, attrs: list[str], version: int
) -> DataFrame:
    """Apply snapshot ``version``: close changed/deleted current rows
    at ``version``, open rows for new/changed keys.

    Plan shape: history splits into closed (untouched) and current;
    current full-outer-joins the hashed snapshot on the key; every
    branch is a projection of that ONE join — one shuffle of each side
    (or a broadcast when the snapshot diff is small)."""
    snap = snapshot.select(
        F.col(key).alias("__k"),
        *[F.col(a).alias(f"__s_{a}") for a in attrs],
        attr_hash(attrs).alias("__s_hash"),
    )
    closed = history.filter(F.col("valid_to").isNotNull())
    cur = history.filter(F.col("valid_to").isNull())
    j = cur.join(snap, cur[key] == snap["__k"], "full_outer")

    unchanged = j.filter(
        F.col("__k").isNotNull()
        & F.col(key).isNotNull()
        & (F.col("attr_hash") == F.col("__s_hash"))
    ).select(key, *attrs, "attr_hash", "valid_from", "valid_to")
    closed_now = j.filter(
        F.col(key).isNotNull()
        & (F.col("__k").isNull() | (F.col("attr_hash") != F.col("__s_hash")))
    ).select(
        key,
        *attrs,
        "attr_hash",
        "valid_from",
        F.lit(version).cast("int").alias("valid_to"),
    )
    opened = j.filter(
        F.col("__k").isNotNull()
        & (F.col(key).isNull() | (F.col("attr_hash") != F.col("__s_hash")))
    ).select(
        F.col("__k").alias(key),
        *[F.col(f"__s_{a}").alias(a) for a in attrs],
        F.col("__s_hash").alias("attr_hash"),
        F.lit(version).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    return closed.unionByName(unchanged).unionByName(closed_now).unionByName(opened)
