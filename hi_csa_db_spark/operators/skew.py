"""Skew-mitigation joins: salting (semantics-preserving).

AQE's skew-join splitting handles most runtime skew; salting is the
explicit tool for keys so hot that even split partitions overwhelm a
task (the crawl tier's mega-hosts, a dominant user_id). The transform
is semantics-preserving — verified by the j5_salted_join oracle query,
which must hash-match a plain SQL join.

Shape: the skewed (large) side gets a deterministic salt in
[0, salt_factor); the build side is replicated once per salt value;
the join key becomes (key, salt). One hot key now lands on
salt_factor tasks instead of one, at the cost of build-side
replication — so salt the MINIMUM set of keys (split-and-union with a
plain join for the cold keys when the build side is big).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` ⋈ ``build`` on ``key`` with the skewed
    side's rows scattered across ``salt_factor`` sub-keys.

    The salt is a deterministic hash of the whole skewed row (not a
    rand() — keeps retries/speculative tasks consistent)."""
    salt_src = [c for c in skewed.columns]
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt_factor)).cast("int")
    )
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return s.join(b, [key, "__salt"], how).drop("__salt")
