"""The compiled-Java Catalyst extension (functions/catalyst_ext.py)
must actually rewrite plans. Extensions bind at SparkSession
construction and one JVM serves one process, so the proof runs in a
SUBPROCESS with a fresh session; the committed jar (no JDK needed) is
exercised exactly as a user would ship it."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = """
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from hi_csa_db_spark.functions.catalyst_ext import extension_session_confs

b = SparkSession.builder.master("local[2]").appName("catalyst-ext-probe")
for k, v in extension_session_confs().items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(3).selectExpr(
    "upper(upper(concat('a', id))) AS u", "lower(lower('B')) AS l"
)
plan = df._jdf.queryExecution().optimizedPlan().toString()
rows = sorted((r.u, r.l) for r in df.collect())
assert "upper(upper" not in plan, plan   # the rule folded the plan
assert "lower(lower" not in plan, plan
assert rows == [("A0", "b"), ("A1", "b"), ("A2", "b")], rows  # values intact
print("CATALYST_EXT_OK")
spark.stop()
"""


def test_upperfold_rule_rewrites_plan():
    r = subprocess.run(
        [sys.executable, "-c", PROBE % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CATALYST_EXT_OK" in r.stdout


def test_jar_rebuild_reproducible(tmp_path):
    """The committed binary jar must be exactly what the embedded Java
    source produces — same .class entry list, same class bytes — so
    the artifact cannot drift from (or smuggle anything beyond) the
    source in the repo (ADVICE r3). Zip metadata (timestamps,
    MANIFEST Created-By) is legitimately unstable, so the comparison
    is per-.class-entry content, not whole-file bytes."""
    import shutil
    import zipfile

    import pytest

    if shutil.which("javac") is None:
        pytest.skip("no JDK")
    from hi_csa_db_spark.functions import catalyst_ext
    from hi_csa_db_spark.functions.catalyst_ext import build_jar

    out = build_jar(str(tmp_path / "ext.jar"))
    assert os.path.getsize(out) > 1000

    committed = os.path.join(
        os.path.dirname(catalyst_ext.__file__), "..", "jars", "upperfold-ext.jar"
    )

    def class_entries(path):
        with zipfile.ZipFile(path) as z:
            return {
                n: z.read(n) for n in z.namelist() if n.endswith(".class")
            }

    rebuilt = class_entries(out)
    shipped = class_entries(committed)
    assert sorted(rebuilt) == sorted(shipped), (
        f"class list drift: rebuilt={sorted(rebuilt)} shipped={sorted(shipped)}"
    )
    for name in rebuilt:
        assert rebuilt[name] == shipped[name], (
            f"{name}: committed jar bytes differ from the embedded source's "
            "output — re-run build_jar over jars/upperfold-ext.jar"
        )
