"""JVM-native scalar UDFs loaded at runtime — the FASTEST custom-
function tier, completing the UDF surface (SURVEY.md §2.9): Python
UDTF and Arrow-batched pandas UDFs exist for Python-only logic; this
module adds the compiled-Java path for hot-loop scalar kernels, with
NO Python round trip and no Arrow serialization boundary.

Mechanism (works in a conf-free vanilla session — pinned by
tests/test_jvm_udf.py): ``ADD JAR <path>`` ships the jar to driver and
executors at runtime, then ``spark.udf.registerJavaFunction`` binds
the class. The jar is PRE-BUILT and committed (hi_csa_db_spark/jars/)
so no JDK is needed at query time; if it is missing and a JDK is
present, the module rebuilds it from the embedded source.

The shipped kernel is FNV-1a 64-bit over UTF-16 code units with a
seed fold — the shingle/fingerprint hot-path hasher. Simple enough to
re-derive in ANSI SQL (the DuckDB oracle replays the fold in HUGEINT
mod 2^64), real enough to demonstrate the tier.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql.types import LongType

JAR_PATH = os.path.join(os.path.dirname(__file__), "..", "jars", "fnv-udf.jar")

JAVA_SOURCE = """
import org.apache.spark.sql.api.java.UDF2;

// FNV-1a 64-bit over UTF-16 code units, seed XORed into the offset
// basis. Stable, allocation-free, branch-free per char - the JVM JIT
// compiles this loop tight; equivalent Python-per-row is ~100x slower.
public class FnvShingle implements UDF2<String, Integer, Long> {
    @Override
    public Long call(String s, Integer seed) {
        long h = 0xcbf29ce484222325L ^ (seed == null ? 0 : seed);
        if (s != null) {
            for (int i = 0; i < s.length(); i++) {
                h ^= s.charAt(i);
                h *= 0x100000001b3L;
            }
        }
        return h;
    }
}
"""


def build_jar(jar_path: str = JAR_PATH) -> str:
    """Compile the embedded source into ``jar_path`` (requires a JDK +
    the pyspark jars for the UDF2 interface). Normally unnecessary —
    the jar is committed — but keeps the artifact reproducible."""
    import pyspark

    spark_jars = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "FnvShingle.java")
        with open(src, "w") as f:
            f.write(JAVA_SOURCE)
        classes = os.path.join(tmp, "classes")
        os.makedirs(classes)
        subprocess.run(
            ["javac", "-encoding", "UTF-8", "-cp", spark_jars, "-d", classes, src],
            check=True,
        )
        os.makedirs(os.path.dirname(jar_path), exist_ok=True)
        subprocess.run(
            ["jar", "cf", os.path.abspath(jar_path), "-C", classes, "."],
            check=True,
        )
    return jar_path


def register_fnv(spark: SparkSession, name: str = "fnv_shingle") -> str:
    """Load the jar into the running session (driver + executors) and
    register the Java UDF under ``name``. Idempotent per session."""
    jar = os.path.abspath(JAR_PATH)
    if not os.path.exists(jar):
        if shutil.which("javac") is None:
            raise FileNotFoundError(
                f"{jar} missing and no JDK available to rebuild it"
            )
        build_jar(jar)
    spark.sql(f"ADD JAR '{jar}'")
    spark.udf.registerJavaFunction(name, "FnvShingle", LongType())
    return name


def fnv1a64(s: str, seed: int = 0) -> int:
    """Pure-Python reference of the Java kernel (signed 64-bit result),
    for tests: identical fold over UTF-16 code units (= code points
    for BMP text)."""
    h = (0xCBF29CE484222325 ^ seed) & 0xFFFFFFFFFFFFFFFF
    for ch in s:
        for cu in _utf16_units(ch):
            h ^= cu
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - 0x10000000000000000 if h >= 0x8000000000000000 else h


def _utf16_units(ch: str) -> list[int]:
    cp = ord(ch)
    if cp < 0x10000:
        return [cp]
    cp -= 0x10000
    return [0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)]
