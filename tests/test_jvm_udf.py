"""The compiled-Java UDF tier: runtime jar load + registration must
work in a conf-free vanilla session (the driver's environment), and
the kernel must match the pure-Python reference bit for bit."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from hi_csa_db_spark.functions.jvm_udf import (
    JAR_PATH,
    build_jar,
    fnv1a64,
    register_fnv,
)


def test_jar_is_committed():
    assert os.path.exists(JAR_PATH), "pre-built fnv-udf.jar must ship in-repo"


def test_register_and_match_reference(spark):
    register_fnv(spark)
    cases = ["", "a", "hello world", "the quick brown fox", "x" * 500, "café über"]
    rows = spark.sql(
        "SELECT "
        + ", ".join(f"fnv_shingle('{c}', 0) AS h{i}" for i, c in enumerate(cases))
        + ", fnv_shingle('seeded', 41) AS hs"
    ).first()
    for i, c in enumerate(cases):
        assert rows[f"h{i}"] == fnv1a64(c, 0), c
    assert rows["hs"] == fnv1a64("seeded", 41)


def test_register_is_idempotent(spark):
    register_fnv(spark)
    register_fnv(spark)
    assert spark.sql("SELECT fnv_shingle('x', 0) AS h").first()["h"] == fnv1a64("x")


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK")
def test_jar_rebuilds_from_source(tmp_path):
    jar = str(tmp_path / "rebuilt.jar")
    build_jar(jar)
    assert os.path.getsize(jar) > 500
    listing = subprocess.run(
        ["jar", "tf", jar], capture_output=True, text=True, check=True
    ).stdout
    assert "FnvShingle.class" in listing


def test_python_reference_utf16_surrogates():
    # an astral-plane char folds as its two UTF-16 surrogate units,
    # matching Java's charAt iteration
    h = fnv1a64("\U0001f600")
    acc = 0xCBF29CE484222325
    for cu in (0xD83D, 0xDE00):
        acc = ((acc ^ cu) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    expected = acc - 2**64 if acc >= 2**63 else acc
    assert h == expected
