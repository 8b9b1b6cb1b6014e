"""Reference-pipeline replay on reference-shaped fixtures (FIXTURES.md
Group B): the golden-invariant tier of SURVEY.md section 5."""

import pytest
from pyspark.sql import functions as F

from hi_csa_db_spark.plans import fixtures, pipeline


@pytest.fixture(scope="module")
def db(spark):
    elements = fixtures.page_elements(spark)
    policy = fixtures.policy_sheet(spark)
    support = fixtures.support_sheet(spark)
    keywords = fixtures.practice_keywords(spark)
    return pipeline.run_pipeline(elements, policy, support, keywords).cache()


def test_output_schema(db):
    assert db.columns == ["Type", "Mitigation", "Practice", "Description", "Resource"]


def test_all_three_streams_present(db):
    types = {r.Type for r in db.select("Type").distinct().collect()}
    assert types == {"Technical", "Policy", "Support"}


def test_no_null_mitigation(db):
    assert db.filter(F.col("Mitigation").isNull()).count() == 0


def test_support_stream_has_no_null_descriptions(db):
    assert (
        db.filter((F.col("Type") == "Support") & F.col("Description").isNull()).count()
        == 0
    )


def test_technical_resources_absolutized(db):
    bad = db.filter(
        (F.col("Type") == "Technical")
        & F.col("Resource").isNotNull()
        & ~F.col("Resource").rlike("^https?://")
    )
    assert bad.count() == 0


def test_unmatched_policy_rows_dropped_by_na_mitigation_filter(spark, db):
    # the reference drops NA-Mitigation rows at the end
    # (hi-csa-db.Rmd:590): policy rows with no matched practice (hence
    # no mitigation lookup) must NOT appear in the published db.
    n_policy_out = db.filter(F.col("Type") == "Policy").count()
    assert n_policy_out > 0
    assert db.filter(
        (F.col("Type") == "Policy") & F.col("Mitigation").isNull()
    ).count() == 0


def _sort_key(t):
    return tuple((v is None, v) for v in t)


def test_pipeline_is_deterministic(spark, db):
    elements = fixtures.page_elements(spark)
    policy = fixtures.policy_sheet(spark)
    support = fixtures.support_sheet(spark)
    keywords = fixtures.practice_keywords(spark)
    again = pipeline.run_pipeline(elements, policy, support, keywords)
    assert sorted(map(tuple, db.collect()), key=_sort_key) == sorted(
        map(tuple, again.collect()), key=_sort_key
    )
