"""Portable deterministic hashing.

All content hashes in the engine derive from md5 hex strings, NOT from
Spark's murmur3 ``hash()``: md5 produces identical output in Spark,
DuckDB, and Python, which makes every hash-dependent operator (minhash,
simhash, fingerprints, exact dedup) oracle-checkable and
engine-portable. md5 here is a deterministic mixer, not a security
primitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    return F.md5(col.cast("string"))


def hex_to_long(hexcol: Column, nchars: int = 15) -> Column:
    """First ``nchars`` hex chars -> non-negative bigint.

    15 hex chars = 60 bits, always positive in an int64 (DuckDB parity:
    ``CAST('0x' || substring(md5(x),1,15) AS BIGINT)``).
    """
    return F.conv(F.substring(hexcol, 1, nchars), 16, 10).cast("long")


def stable_long_hash(col: Column, seed: str = "") -> Column:
    """60-bit stable content hash of a string column (optionally seeded)."""
    seeded = F.concat(F.lit(seed), F.lit(":"), col.cast("string")) if seed else col.cast("string")
    return hex_to_long(F.md5(seeded))
