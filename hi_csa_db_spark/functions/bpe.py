"""Byte-pair-encoding application: the tokenizer-side half of BPE
(Sennrich et al. 2016, arXiv:1508.07909 — public method).

Training learns an ordered merge list; APPLYING it segments a word by
repeatedly merging the lowest-rank adjacent pair — exactly what a
GPT-style tokenizer does per word at inference. The merge list is a
small broadcastable artifact; application is pure per-word compute, so
the Spark operator is an Arrow-batched mapInPandas with a per-executor
word cache (corpus words repeat heavily — the cache turns per-token
cost into per-distinct-word cost).

The char-pair COUNTING that picks training merges is a plain
aggregation — see queries.x28_bpe_first_merges (oracle-checked); this
module is the iterative per-word kernel that SQL can't express.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

# A fixed demonstration merge list (rank = position). A real deployment
# loads the learned list as a side input; the kernel is identical.
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("s", "t"),
    ("e", "n"), ("o", "r"), ("a", "r"), ("in", "g"), ("e", "s"),
]


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word: start from characters, repeatedly merge the
    adjacent pair with the LOWEST rank until no mergeable pair remains
    (the standard greedy BPE apply loop)."""
    pieces = list(word)
    while len(pieces) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(pieces) - 1):
            r = ranks.get((pieces[i], pieces[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pieces[best_i : best_i + 2] = [pieces[best_i] + pieces[best_i + 1]]
    return pieces


BPE_COUNT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ws_tokens", IntegerType()),
        StructField("bpe_tokens", IntegerType()),
    ]
)


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace token count vs count
    after BPE segmentation — the real token-budget number a training
    pipeline plans against. mapInPandas; the merge list rides the
    closure (broadcast-small); per-executor lru_cache makes cost
    proportional to DISTINCT words per partition."""
    ranks = {p: i for i, p in enumerate(merges or DEFAULT_MERGES)}

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        @lru_cache(maxsize=1 << 16)
        def n_pieces(word: str) -> int:
            return len(apply_bpe(word, ranks))

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").lower().split() if w]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "ws_tokens": len(words),
                        "bpe_tokens": sum(n_pieces(w) for w in words),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "ws_tokens", "bpe_tokens"])

    return docs.select(id_col, text_col).mapInPandas(gen, BPE_COUNT_SCHEMA)
