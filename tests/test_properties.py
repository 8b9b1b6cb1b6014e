"""Property-based tests (SURVEY §5 tier 4): the window re-expressions
must match the reference's imperative semantics on RANDOM inputs, not
just the fixtures.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hi_csa_db_spark.operators.merge import db_merge
from hi_csa_db_spark.operators.sectionize import sectionize
from hi_csa_db_spark.sources.html import ELEMENT_SCHEMA

_tag = st.sampled_from(["h3", "h4", "p"])
_text = st.text(alphabet="abcxyz ", min_size=1, max_size=8)
_elements = st.lists(st.tuples(_tag, _text), min_size=0, max_size=12)


def _reference_loop(seq):
    """The R sectionizer loop, verbatim semantics
    (hi-csa-db.Rmd:178-212): carry current h3; h4 resets at each h3;
    emit one row per p."""
    out, cur3, cur4 = [], None, None
    for tag, text in seq:
        if tag == "h3":
            cur3, cur4 = text, None
        elif tag == "h4":
            cur4 = text
        else:
            out.append((cur3, cur4, text))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_elements)
def test_sectionize_matches_reference_loop(spark, seq):
    rows = [
        ("u", i, tag, text, []) for i, (tag, text) in enumerate(seq)
    ]
    elements = spark.createDataFrame(rows, ELEMENT_SCHEMA)
    got = [
        (r.mitigation, r.practice, r.description)
        for r in sectionize(elements).orderBy("doc_order").collect()
    ]
    assert got == _reference_loop(seq)


_cols = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=4, unique=True
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_cols, _cols, st.integers(1, 3), st.integers(1, 3))
def test_db_merge_matches_reference_semantics(spark, cols_x, cols_y, nx, ny):
    """db_merge == R reference (hi-csa-db.Rmd:58-73): each side's
    missing columns become NA, columns sorted, rows stacked."""
    x = spark.createDataFrame(
        [tuple(f"x{i}{c}" for c in cols_x) for i in range(nx)], cols_x
    )
    y = spark.createDataFrame(
        [tuple(f"y{i}{c}" for c in cols_y) for i in range(ny)], cols_y
    )
    out = db_merge(x, y)
    want_cols = sorted(set(cols_x) | set(cols_y))
    assert out.columns == want_cols
    rows = [tuple(r) for r in out.collect()]
    assert len(rows) == nx + ny
    expected = set()
    for i in range(nx):
        expected.add(
            tuple(f"x{i}{c}" if c in cols_x else None for c in want_cols)
        )
    for i in range(ny):
        expected.add(
            tuple(f"y{i}{c}" if c in cols_y else None for c in want_cols)
        )
    assert set(rows) == expected
