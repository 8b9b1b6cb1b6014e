"""S6: headerless CSV scan with content-driven header detection.

The reference reads a tabula-extracted PDF table with
``read.csv(header=FALSE)`` and finds the header row by regex INSIDE
the data (hi-csa-db.Rmd:435-439) — schema detection is content-driven,
not positional.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "tabula.csv"
    p.write_text(
        "junk preamble,,\n"
        "Mitigation Categories,Practice,Code\n"
        "Soil Health,Cover Crop,E340A\n"
        "Soil Health,Reduced Till,E329A\n"
        "Energy,Lighting,E374A\n"
    )
    return str(p)


def test_headerless_csv_with_content_header_detect(spark, csv_path):
    raw = (
        spark.read.option("header", "false")
        .csv(csv_path)
        .toDF("c0", "c1", "c2")
        .withColumn("__file_order", F.monotonically_increasing_id())
    )
    # find the header row by regex inside the data (P5/P6 pattern)
    hdr = raw.filter(F.col("c0").rlike("Mitigation Categories")).agg(
        F.min("__file_order").alias("__h")
    )
    body = (
        raw.crossJoin(F.broadcast(hdr))
        .filter(F.col("__file_order") > F.col("__h"))
        .select(
            F.col("c0").alias("mitigation"),
            F.col("c1").alias("practice"),
            F.col("c2").alias("code"),
        )
    )
    rows = {(r.mitigation, r.practice, r.code) for r in body.collect()}
    assert rows == {
        ("Soil Health", "Cover Crop", "E340A"),
        ("Soil Health", "Reduced Till", "E329A"),
        ("Energy", "Lighting", "E374A"),
    }
