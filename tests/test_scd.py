"""SCD2 operator (operators/scd.py): interval algebra over multiple
snapshot applications."""

import pyspark.sql.functions as F

from hi_csa_db_spark.operators import scd

ATTRS = ["name", "seg"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["k", "name", "seg"])


def test_init_all_open(spark):
    h = scd.scd2_init(_snap(spark, [(1, "a", "X"), (2, "b", "Y")]), "k", ATTRS, 1)
    got = {(r.k, r.valid_from, r.valid_to) for r in h.collect()}
    assert got == {(1, 1, None), (2, 1, None)}


def test_apply_change_delete_add(spark):
    v1 = _snap(spark, [(1, "a", "X"), (2, "b", "Y"), (3, "c", "Z")])
    v2 = _snap(spark, [(1, "a", "X"), (2, "b", "CHANGED"), (4, "d", "W")])  # 3 deleted
    h = scd.scd2_apply(scd.scd2_init(v1, "k", ATTRS, 1), v2, "k", ATTRS, 2)
    got = {(r.k, r.valid_from, r.valid_to) for r in h.collect()}
    assert got == {
        (1, 1, None),   # unchanged stays open from v1
        (2, 1, 2),      # changed: closed at 2...
        (2, 2, None),   # ...and reopened from 2
        (3, 1, 2),      # deleted: closed, not reopened
        (4, 2, None),   # added: open from 2
    }


def test_three_versions_interval_algebra(spark):
    v1 = _snap(spark, [(1, "a", "X"), (2, "b", "Y")])
    v2 = _snap(spark, [(1, "a", "X2"), (2, "b", "Y")])
    v3 = _snap(spark, [(1, "a", "X3"), (2, "b", "Y3")])
    h = scd.scd2_init(v1, "k", ATTRS, 1)
    h = scd.scd2_apply(h, v2, "k", ATTRS, 2)
    h = scd.scd2_apply(h, v3, "k", ATTRS, 3)
    rows = h.collect()
    # exactly one open row per live key
    open_keys = [r.k for r in rows if r.valid_to is None]
    assert sorted(open_keys) == [1, 2]
    # intervals per key are contiguous and non-overlapping
    for k in (1, 2):
        ivs = sorted(
            (r.valid_from, r.valid_to if r.valid_to is not None else 99)
            for r in rows
            if r.k == k
        )
        for (f1, t1), (f2, _) in zip(ivs, ivs[1:]):
            assert t1 == f2
    # key 1 changed twice -> 3 rows; key 2 changed once -> 2 rows
    assert len([r for r in rows if r.k == 1]) == 3
    assert len([r for r in rows if r.k == 2]) == 2


def test_reapplying_same_snapshot_is_noop(spark):
    v1 = _snap(spark, [(1, "a", "X"), (2, "b", "Y")])
    h1 = scd.scd2_init(v1, "k", ATTRS, 1)
    h2 = scd.scd2_apply(h1, v1, "k", ATTRS, 2)
    assert {tuple(r) for r in h1.collect()} == {tuple(r) for r in h2.collect()}


def test_null_attributes_hash_and_transitions(spark):
    # NULL attr != empty string (attr_hash pads nulls with \x00), and
    # NULL -> value is a CHANGE that closes + reopens
    v1 = spark.createDataFrame([(1, None, "X"), (2, "", "X")], ["k", "name", "seg"])
    v2 = spark.createDataFrame([(1, "a", "X"), (2, "", "X")], ["k", "name", "seg"])
    h1 = scd.scd2_init(v1, "k", ATTRS, 1)
    rows1 = {r.k: r.attr_hash for r in h1.collect()}
    assert rows1[1] != rows1[2]  # null vs empty hash differently
    h2 = scd.scd2_apply(h1, v2, "k", ATTRS, 2)
    got = {(r.k, r.valid_from, r.valid_to) for r in h2.collect()}
    assert got == {(1, 1, 2), (1, 2, None), (2, 1, None)}
