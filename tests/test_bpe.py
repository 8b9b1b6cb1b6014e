"""BPE application kernel (functions/bpe.py): hand-computed
segmentations, merge-order correctness, and the Spark operator."""

from hi_csa_db_spark.functions.bpe import DEFAULT_MERGES, apply_bpe

RANKS = {p: i for i, p in enumerate(DEFAULT_MERGES)}


def test_hand_computed_segmentations():
    # t+h (rank 0) before th+e (rank 1): "the" fully merges
    assert apply_bpe("the", RANKS) == ["the"]
    # a+n -> an, an+d -> and
    assert apply_bpe("and", RANKS) == ["and"]
    # classic compositional split
    assert apply_bpe("standing", RANKS) == ["st", "and", "ing"]
    # unmergeable stays at characters
    assert apply_bpe("xyz", RANKS) == ["x", "y", "z"]


def test_rank_order_decides_merge_priority():
    # with (e,r) ranked above (r,e): "erre" merges er first
    ranks = {("e", "r"): 0, ("r", "e"): 1}
    assert apply_bpe("erre", ranks) == ["er", "re"]
    # flip the priority: re merges first, leaving e r stranded? e+r
    # still merges after (both pairs exist in the table)
    ranks2 = {("r", "e"): 0, ("e", "r"): 1}
    assert apply_bpe("erre", ranks2) == ["er", "re"]


def test_edge_cases():
    assert apply_bpe("", RANKS) == []
    assert apply_bpe("a", RANKS) == ["a"]


def test_spark_counts_match_local_kernel(spark, sf_dir):
    from hi_csa_db_spark.catalog import load_table
    from hi_csa_db_spark.functions.bpe import bpe_token_counts

    docs = load_table(spark, sf_dir, "documents").limit(50)
    got = {r.doc_id: (r.ws_tokens, r.bpe_tokens) for r in bpe_token_counts(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in (row.text or "").lower().split() if w]
        want = (len(words), sum(len(apply_bpe(w, RANKS)) for w in words))
        assert got[row.doc_id] == want
    # BPE never produces more pieces than characters, never fewer than words
    for ws, bpe in got.values():
        assert bpe >= ws
