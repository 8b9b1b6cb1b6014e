"""Text analysis operators: language-ID, quality scoring, token stats,
document fingerprinting.

Extension surface mandated by BASELINE.json. All pure Catalyst
expressions (regex + higher-order array functions) — the hot path
never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hi_csa_db_spark.functions.text import strip_punct, tokenize

# tiny marker-word dictionaries for the n-gram/stopword language
# heuristic; deterministic and engine-portable (the point is the
# distributed scoring shape, not linguistic accuracy).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "value"),
    "fr": ("le", "la", "et", "des", "une"),
    "es": ("el", "los", "una", "por", "que"),
    "de": ("der", "die", "und", "ein", "nicht"),
    "zh": ("zh0", "zh1", "zh2", "zh3", "zh4"),
}

STOPWORDS = ("a", "the", "of", "and", "in", "to", "is")


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Marker-token language scoring: (id, predicted_lang).

    Token-explode + broadcast marker join + per-(doc,lang) counts +
    deterministic argmax (max count, then lexicographic lang; docs with
    zero marker hits predict 'und'). Same shape as the keyword
    classifier J2 — one broadcast join, one aggregation.
    """
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(w, lang) for lang, ws in LANG_MARKERS.items() for w in ws],
        ["tok", "lang"],
    )
    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(F.lower(strip_punct(F.col(text_col))))).alias("tok"),
    )
    scores = (
        toks.join(F.broadcast(markers), "tok")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # deterministic argmax: highest hits, ties -> lexicographically
    # smallest lang. Implemented with min_by over (-hits, lang).
    best = scores.groupBy(id_col).agg(
        F.min_by("lang", F.struct((-F.col("hits")).alias("nh"), F.col("lang"))).alias(
            "predicted_lang"
        )
    )
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col, F.coalesce("predicted_lang", F.lit("und")).alias("predicted_lang")
        )
    )


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality features + composite score per document.

    Features follow the standard pretraining-data recipe (length,
    punctuation density, stopword ratio, mean word length); the
    composite is a fixed linear blend. Narrow map, no shuffle.
    """
    t = F.col(text_col)
    toks = tokenize(F.lower(strip_punct(t)))
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9\s]", ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    mean_wlen = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
        / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens.cast("double")).otherwise(0.0)
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - punct_ratio) * 0.3
        + stop_ratio * 0.2
        + F.least(mean_wlen / F.lit(10.0), F.lit(1.0)) * 0.1
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        # scale 9: the blend of small-denominator ratios can land
        # exactly on a 6-dp rounding tie (engines disagree on ties);
        # at 9 dp those terminating decimals sit on lattice points.
        F.round(score, 9).alias("quality_score"),
    )


def token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex pieces, distinct.

    The regex piece count splits words / digits / other symbols — a
    cheap proxy for subword token counts used in data budgeting.
    """
    t = F.col(text_col)
    ws_tokens = tokenize(t)
    pieces = F.expr(
        f"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\\\s]', 0)"
    )
    return docs.select(
        F.col(id_col),
        F.size(ws_tokens).alias("ws_tokens"),
        F.size(pieces).alias("regex_tokens"),
        F.size(F.array_distinct(ws_tokens)).alias("distinct_tokens"),
    )


def fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    keep: int = 5,
) -> DataFrame:
    """k-min content fingerprints: the ``keep`` smallest md5 hashes of
    all character k-grams, exploded to (id, fp) rows.

    A deterministic, portable stand-in for winnowing/rolling-hash
    fingerprints: min-k over a sliding window of content hashes. Two
    docs sharing fingerprints share content blocks.
    """
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> md5(substring({text_col}, i, {k})))"
    )
    return docs.select(
        F.col(id_col),
        F.explode(F.slice(F.array_sort(grams), 1, keep)).alias("fp"),
    )
