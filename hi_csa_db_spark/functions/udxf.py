"""User-defined table function + vectorized UDAF surface (SURVEY §2.9).

The engine's three extension-function kinds, each Arrow-vectorized
where the API allows:

- scalar: everywhere else in functions/ as pure Catalyst expressions
  (the preferred form — no Python at all);
- aggregate: ``pandas_udf`` grouped agg (Arrow batch per group);
- table: Python UDTF (Spark 4 ``@udtf``), lateral-joinable.

Both demos are exactly reproducible in SQL, so the oracle harness
value-checks these surfaces too (x9_udtf_sentences,
agg_pandas_median).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="pos: int, sentence: string")
class SplitSentences:
    """Lateral table function: text -> (pos, sentence) rows, splitting
    on '. ' and skipping empty fragments (positions keep the original
    fragment index, so gaps mark dropped empties)."""

    def eval(self, text: str):
        for i, s in enumerate((text or "").split(". ")):
            if s:
                yield i, s


@pandas_udf("double")
def pandas_median(v: pd.Series) -> float:
    """Vectorized grouped-agg UDAF: per-group median (linear
    interpolation — identical to SQL quantile_cont(0.5))."""
    return float(v.median())
