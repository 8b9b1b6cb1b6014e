"""Source-format breadth: ORC round-trip and binaryFile media ingest.

Parquet is the fixture format; these pin that the engine's tables can
enter and leave through the other Spark-native formats a deployment
actually meets — ORC for warehouse interop, binaryFile as the REAL
ingestion path for multimodal payloads (one row per object: path,
modificationTime, length, content) feeding operators/multimodal.py.
"""

import hashlib

import pyspark.sql.functions as F

from hi_csa_db_spark.catalog import load_table


def test_orc_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = f"{tmp_path}/docs_orc"
    docs.write.format("orc").mode("overwrite").save(out)
    back = spark.read.format("orc").load(out)
    assert back.schema == docs.schema
    a = docs.agg(
        F.count(F.lit(1)), F.sum(F.length("text")), F.countDistinct("lang")
    ).collect()[0]
    b = back.agg(
        F.count(F.lit(1)), F.sum(F.length("text")), F.countDistinct("lang")
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_binaryfile_media_ingest(spark, tmp_path):
    # write raw media objects, read via binaryFile, and run them
    # through the real feature extractor — the production ingest shape
    import numpy as np

    from hi_csa_db_spark.functions.codecs import encode_bmp
    from hi_csa_db_spark.operators.multimodal import extract_features

    payloads = {}
    for i in range(4):
        img = np.full((3, 5, 3), i * 10, np.uint8)
        p = encode_bmp(img)
        (tmp_path / f"img_{i}.bmp").write_bytes(p)
        payloads[f"img_{i}.bmp"] = p

    raw = spark.read.format("binaryFile").option("pathGlobFilter", "*.bmp").load(
        str(tmp_path)
    )
    rows = raw.select("path", "length", "content").collect()
    assert len(rows) == 4
    for r in rows:
        name = r.path.rsplit("/", 1)[-1]
        assert bytes(r.content) == payloads[name]
        assert r.length == len(payloads[name])

    media = raw.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
        F.lit("image/bmp").alias("mime"),
        F.lit(5).alias("width"),
        F.lit(3).alias("height"),
        F.lit(0).alias("duration_ms"),
    )
    feats = extract_features(media, dim=8)
    got = {r.content_hash for r in feats.collect()}
    want = {hashlib.md5(p).hexdigest() for p in payloads.values()}
    assert got == want


def test_jsonl_ingest_with_corrupt_record_quarantine(spark, tmp_path):
    """JSON-lines ingest contract: schema-on-read with PERMISSIVE bad-
    line capture (the _corrupt_record quarantine every JSONL feed
    needs) vs DROPMALFORMED's silent filter."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = str(tmp_path / "ev.jsonl")
    lines = [
        '{"id": 1, "v": 2.5}',
        '{"id": 2, "v": -1.0}',
        "THIS IS NOT JSON",
        '{"id": 3, "v": 0.25}',
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines))
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", DoubleType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    perm = spark.read.schema(schema).option("mode", "PERMISSIVE").json(p)
    good = perm.filter(F.col("_corrupt_record").isNull())
    bad = perm.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 2, 3]
    assert [r["_corrupt_record"] for r in bad.collect()] == ["THIS IS NOT JSON"]

    dropped = (
        spark.read.schema(
            StructType([StructField("id", LongType()), StructField("v", DoubleType())])
        )
        .option("mode", "DROPMALFORMED")
        .json(p)
    )
    assert dropped.count() == 3
