"""db_merge union semantics + keyword classifier strategies."""

from pyspark.sql import functions as F

import pytest

from hi_csa_db_spark.operators.classify import (
    keyword_classify,
    keyword_classify_literal,
    keyword_classify_nlj,
)
from hi_csa_db_spark.operators.merge import db_merge, union_streams


def test_db_merge_schema_aligning_union(spark):
    x = spark.createDataFrame([(1, "a")], "id int, only_x string")
    y = spark.createDataFrame([(2, 3.5)], "id int, only_y double")
    out = db_merge(x, y)
    assert out.columns == ["id", "only_x", "only_y"]
    rows = {r.id: (r.only_x, r.only_y) for r in out.collect()}
    assert rows == {1: ("a", None), 2: (None, 3.5)}


def test_db_merge_matches_reference_rbind_for_same_schema(spark):
    x = spark.createDataFrame([(1, "a")], "id int, v string")
    y = spark.createDataFrame([(2, "b")], "id int, v string")
    assert db_merge(x, y).count() == 2


def test_union_streams_tags(spark):
    a = spark.createDataFrame([(1,)], "id int")
    b = spark.createDataFrame([(2,)], "id int")
    out = union_streams({"A": a, "B": b})
    assert {(r.id, r.type) for r in out.collect()} == {(1, "A"), (2, "B")}


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "Cover crops and crop ROTATION improve soil."),
            (1, "Nothing relevant here."),
            (2, "irrigation, irrigation; and more Irrigation!"),
        ],
        "doc_id long, text string",
    )


def _dict(spark):
    return spark.createDataFrame(
        [("cover", "Conservation Cover"), ("rotation", "Crop Rotation"),
         ("irrigation", "Irrigation Mgmt")],
        "keyword string, label string",
    )


def test_keyword_classify_multilabel_and_na(spark):
    out = keyword_classify(_docs(spark), _dict(spark))
    got = {(r.doc_id, r.label) for r in out.collect()}
    assert got == {
        (0, "Conservation Cover"),
        (0, "Crop Rotation"),
        (1, None),
        (2, "Irrigation Mgmt"),
    }


def test_nlj_strategy_agrees_with_equijoin_strategy(spark):
    a = keyword_classify(_docs(spark), _dict(spark))
    b = keyword_classify_nlj(_docs(spark), _dict(spark))
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_literal_strategy_agrees_with_equijoin_strategy(spark):
    # r12: the plan-time-dictionary strategy (narrow expressions, no
    # join) must emit exactly the join strategy's rows — including the
    # NULL-label row for unmatched docs
    pairs = [("cover", "Conservation Cover"), ("rotation", "Crop Rotation"),
             ("irrigation", "Irrigation Mgmt")]
    a = keyword_classify(_docs(spark), _dict(spark))
    b = keyword_classify_literal(_docs(spark), pairs)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_literal_strategy_phrases_and_edge_docs(spark):
    # multi-word phrases (max_n > 1), empty text, NULL text
    docs = spark.createDataFrame(
        [
            (0, "use cover crops for SOIL health and cover"),
            (1, ""),
            (2, None),
            (3, "nothing to see"),
        ],
        "doc_id long, text string",
    )
    pairs = [("cover crops", "CC"), ("soil health", "SH"), ("cover", "C")]
    kw = spark.createDataFrame(pairs, "keyword string, label string")
    a = keyword_classify(docs, kw)
    b = keyword_classify_literal(docs, pairs)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    got = {tuple(r) for r in b.collect()}
    assert got == {(0, "CC"), (0, "SH"), (0, "C"), (1, None), (2, None), (3, None)}


def test_literal_strategy_rejects_duplicate_keywords(spark):
    with pytest.raises(ValueError):
        keyword_classify_literal(
            _docs(spark), [("cover", "A"), ("Cover", "B")]
        )


def test_literal_strategy_plan_is_narrow(spark):
    import re

    plan = keyword_classify_literal(
        _docs(spark), [("cover", "A")]
    )._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Join|Exchange", plan)


def test_lang_id_narrow_plan_and_und(spark):
    import re

    from hi_csa_db_spark.operators.textstats import lang_id

    docs = spark.createDataFrame(
        [
            (0, "the value of the thing and the other"),
            (1, "le chat et la porte des une"),
            (2, "zzz qqq"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = lang_id(docs)
    got = {(r.doc_id, r.predicted_lang) for r in out.collect()}
    assert got == {(0, "en"), (1, "fr"), (2, "und"), (3, "und"), (4, "und")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Join|Exchange", plan)


def test_upsert_semantics(spark):
    from hi_csa_db_spark.operators.merge import upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    updates = spark.createDataFrame([(2, "B"), (4, "D")], ["k", "v"])
    out = {r.k: r.v for r in upsert(base, updates, keys=["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}
