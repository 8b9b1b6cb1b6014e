"""Sheet-export ingest (S5): header normalization, NULL semantics,
schema-drift alignment, and equivalence with the direct fixtures."""

import json

from pyspark.sql import functions as F

from hi_csa_db_spark.plans import fixtures
from hi_csa_db_spark.sources import sheets


def test_slug_header():
    assert sheets.slug_header("Resources (Links)") == "resources_links"
    assert sheets.slug_header("  CSA Goals ") == "csa_goals"
    assert sheets.slug_header("URL") == "url"
    assert sheets.slug_header("%%%") == "col"


def test_csv_export_equals_direct_fixture(spark):
    # the raw CSV export path must reconstruct the same logical table
    # the in-memory fixture builds (nulls included)
    direct = fixtures.support_sheet(spark).withColumnRenamed(
        "Resources (Links)", "resources_links"
    )
    via_csv = sheets.read_sheet_export(
        spark,
        fixtures.support_sheet_export_lines(),
        target_schema="mitigation string, practice string, "
        "description string, resources_links string",
    )
    assert sorted(map(tuple, direct.collect()), key=repr) == sorted(
        map(tuple, via_csv.collect()), key=repr
    )


def test_drift_alignment_drops_extras_and_nulls_missing(spark):
    lines = ["A,B,Extra", "1,x,zzz", "2,,zzz"]
    df = sheets.read_sheet_export(
        spark, lines, target_schema="a int, b string, never_sent double"
    )
    assert df.columns == ["a", "b", "never_sent"]
    rows = {r["a"]: r for r in df.collect()}
    assert rows[2]["b"] is None  # empty cell -> NULL
    assert rows[1]["never_sent"] is None  # missing column -> typed nulls
    assert dict(df.dtypes)["never_sent"] == "double"


def test_quoted_commas_and_blank_strings(spark):
    lines = ['Name,Desc', 'a,"one, two"', 'b,"   "']
    df = sheets.read_sheet_export(spark, lines)
    rows = {r["name"]: r["desc"] for r in df.collect()}
    assert rows["a"] == "one, two"
    assert rows["b"] is None  # whitespace-only cell -> NULL


def test_json_export(spark):
    lines = [json.dumps({"Practice Name": "Cover Crop", "n": i}) for i in range(3)]
    df = sheets.read_sheet_export(
        spark, lines, fmt="json", target_schema="practice_name string, n long"
    )
    assert df.count() == 3
    assert df.columns == ["practice_name", "n"]


def test_replay_consumes_exports(spark, sf_dir):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["pipe_reference_replay"](spark, sf_dir)
    assert out.columns == ["Type", "Mitigation", "Practice", "Description", "Resource"]
    by_type = {
        r["Type"]: r["n"]
        for r in out.groupBy("Type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(by_type) == {"Technical", "Policy", "Support"}
    assert all(n > 0 for n in by_type.values())
