"""Environment fingerprint for correctness/bench artifacts.

Round 3's driver hash-mismatches all passed locally — the gap turned
out to be host-level (duckdb version / libm / timezone skew), and it
was undiagnosable because neither side recorded what it ran on
(VERDICT r3 item 2). Every sweep and bench emission now carries this
block so a driver-vs-local divergence points at a concrete delta
instead of a mystery.
"""

from __future__ import annotations

import os
import platform
import sys
import time


def env_fingerprint() -> dict:
    """Versions and host facts that have actually caused (or could
    cause) cross-engine value skew. Cheap, import-only, no side
    effects; safe to call from bench.py's JSON emission path."""
    try:
        import duckdb

        duckdb_v = duckdb.__version__
    except Exception:  # pragma: no cover - duckdb is baked in
        duckdb_v = "absent"
    try:
        import pyspark

        pyspark_v = pyspark.__version__
    except Exception:  # pragma: no cover - pyspark is baked in
        pyspark_v = "absent"
    try:
        import numpy

        numpy_v = numpy.__version__
    except Exception:  # pragma: no cover
        numpy_v = "absent"
    libc = platform.libc_ver()
    return {
        "duckdb": duckdb_v,
        "pyspark": pyspark_v,
        "numpy": numpy_v,
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "libc": "-".join(x for x in libc if x) or "unknown",
        "timezone": time.tzname[0] or "unknown",
        "tz_env": os.environ.get("TZ", ""),
        "cpus": str(os.cpu_count()),
        "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
    }
