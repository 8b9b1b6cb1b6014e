"""tools/datagen_sf.py — the local scaling-fixture extruder.

The sf0.3 BASELINE.md scaling row rests on this generator being (a)
deterministic (seed 42: two runs produce value-identical tables) and
(b) distribution-matched to the shipped fixtures (row-count ratios,
key ranges, vocabulary). Generated at a tiny sf here; the shipped
/root/testdata dirs are never written.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from datagen_sf import _heaps_vocab, generate  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def gen_dirs(tmp_path_factory):
    a = str(tmp_path_factory.mktemp("gen_a"))
    b = str(tmp_path_factory.mktemp("gen_b"))
    generate(0.002, a)
    generate(0.002, b)
    return a, b


def _checksum(con, path: str, table: str) -> tuple:
    # order-insensitive whole-table value digest
    return con.execute(
        f"SELECT COUNT(*), SUM(hash(to_json(t))) "
        f"FROM read_parquet('{path}/{table}.parquet') t"
    ).fetchone()


def test_deterministic_across_runs(gen_dirs):
    a, b = gen_dirs
    con = duckdb.connect()
    for t in TABLES:
        assert _checksum(con, a, t) == _checksum(con, b, t), t


def test_heaps_vocab_growth_formula():
    # anchored at the shipped sf0.1's 31 words; floors at 31 below it
    assert len(_heaps_vocab(0.001)) == 31
    assert len(_heaps_vocab(0.1)) == 31
    assert len(_heaps_vocab(1)) == 98  # 31 * sqrt(10)
    assert len(_heaps_vocab(10)) == 310


def test_heaps_mode_isolated_to_documents(gen_dirs, tmp_path):
    # --heaps draws documents from an isolated RNG stream, so every
    # table generated BEFORE documents is byte-identical to default
    # mode; documents differ (Zipf draws), deterministically.
    a, _ = gen_dirs
    h1 = str(tmp_path / "h1")
    h2 = str(tmp_path / "h2")
    generate(0.002, h1, heaps=True)
    generate(0.002, h2, heaps=True)
    con = duckdb.connect()
    for t in TABLES:
        assert _checksum(con, h1, t) == _checksum(con, h2, t), t
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        assert _checksum(con, a, t) == _checksum(con, h1, t), t
    assert _checksum(con, a, "documents") != _checksum(con, h1, "documents")


def test_row_count_ratios_match_shipped(gen_dirs):
    """sf0.002 must be exactly 2x the shipped sf0.001 on the linear
    tables and equal on the fixed/floored ones."""
    a, _ = gen_dirs
    con = duckdb.connect()
    shipped = "/root/testdata/sf0.001"

    def n(path, t):
        return con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{path}/{t}.parquet')"
        ).fetchone()[0]

    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        assert n(a, t) == 2 * n(shipped, t), t
    for t in ("region", "nation"):
        assert n(a, t) == n(shipped, t), t
    # documents/embeddings sit on their 500-row floors at these sfs
    assert n(a, "documents") == n(shipped, "documents") == 500
    assert n(a, "embeddings") == n(shipped, "embeddings") == 500


def test_distribution_shape_matches_shipped(gen_dirs):
    a, _ = gen_dirs
    con = duckdb.connect()
    shipped = "/root/testdata/sf0.001"
    # same schema on every table
    for t in TABLES:
        sa = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{a}/{t}.parquet')"
        ).fetchall()
        ss = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{shipped}/{t}.parquet')"
        ).fetchall()
        assert [c[:2] for c in sa] == [c[:2] for c in ss], t
    # key domains scale with sf; categorical domains are fixed
    for q, want in [
        ("SELECT MAX(o_custkey) < 300 FROM read_parquet('%s/orders.parquet')", True),
        (
            "SELECT COUNT(DISTINCT l_returnflag) = 3 FROM read_parquet('%s/lineitem.parquet')",
            True,
        ),
        (
            "SELECT COUNT(DISTINCT event_type) = 5 FROM read_parquet('%s/events.parquet')",
            True,
        ),
        (
            "SELECT COUNT(DISTINCT source) = 20 FROM read_parquet('%s/documents.parquet')",
            True,
        ),
        (
            "SELECT MIN(len(string_split(text, ' '))) >= 10 AND "
            "MAX(len(string_split(text, ' '))) <= 100 "
            "FROM read_parquet('%s/documents.parquet')",
            True,
        ),
        (
            "SELECT MIN(len(embedding)) = 64 AND MAX(len(embedding)) = 64 "
            "FROM read_parquet('%s/embeddings.parquet')",
            True,
        ),
    ]:
        assert con.execute(q % a).fetchone()[0] is want, q


def test_refuses_readonly_fixture_dirs(monkeypatch, capsys):
    import datagen_sf

    monkeypatch.setattr(
        sys, "argv", ["datagen_sf.py", "0.001", "/root/testdata/sfX"]
    )
    assert datagen_sf.main() == 1
    assert "refusing" in capsys.readouterr().out
