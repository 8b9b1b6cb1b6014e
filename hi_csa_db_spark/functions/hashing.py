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


def knuth_hash32(col: Column) -> Column:
    """``(key * 2654435761) mod 2**32`` — Knuth's multiplicative hash —
    computed total-range-safely for ANY bigint key (ADVICE r7: the
    naive product overflows int64, i.e. throws under ANSI semantics,
    once keys exceed ~3.47e9 — exactly the regime a 100 TB corpus'
    doc_ids / cluster labels live in).

    Only the low 32 bits of the key affect the result (the product's
    high bits fall out of the mod), so the key reduces to
    ``k = key & 0xFFFFFFFF`` first, then splits into 16-bit halves:
    ``(hi*A mod 2^32)*2^16 + lo*A`` keeps every intermediate below
    2^49. Bit-ops only — stays in whole-stage codegen.

    DuckDB-parity SQL: ``KNUTH_HASH32_SQL.format(key=expr)``.
    """
    return mult_hash32(col, 2654435761)


def mult_hash32(col: Column, a) -> Column:
    """``(key * a) mod 2**32`` for any 32-bit multiplier ``a`` (an int
    literal or a Column of them — e.g. a hash-family dimension row)
    and ANY bigint key, in pure overflow-safe bigint arithmetic (the
    knuth_hash32 16-bit-halves construction, multiplier-parameterized
    for hash families like the CMS rows)."""
    if isinstance(a, int):
        assert 0 < a < 4294967296, a
        a = F.lit(a)
    k = col.cast("long").bitwiseAND(F.lit(4294967295))
    hi_part = (F.shiftright(k, 16) * a).bitwiseAND(
        F.lit(4294967295)
    ) * F.lit(65536)
    lo_part = k.bitwiseAND(F.lit(65535)) * a
    return (hi_part + lo_part).bitwiseAND(F.lit(4294967295))


# The same arithmetic as an ANSI-SQL template (DuckDB oracles): every
# intermediate < 2^49, so plain BIGINT throughout.
MULT_HASH32_SQL = (
    "((((({key} & 4294967295) >> 16) * {a}) & 4294967295) * 65536"
    " + (({key} & 65535) * {a})) & 4294967295"
)
KNUTH_HASH32_SQL = MULT_HASH32_SQL.replace("{a}", "2654435761")
