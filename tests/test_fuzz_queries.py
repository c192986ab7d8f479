"""Fuzz the query surface: arbitrary strings must never crash the engine
and must stay rank-identical to the oracle."""

from __future__ import annotations

import random
import string

import pytest

from spaghettisearch_spark.config import DEFAULT
from spaghettisearch_spark.functions.tokenize import parse_query
from spaghettisearch_spark.operators.bm25 import search
from spaghettisearch_spark.oracle.pandas_oracle import oracle_search

FUZZ = [
    "",
    "   ",
    '"',
    '""',
    '"""',
    "'s 'twas",
    "a-b-c--d",
    "CAPS MiXeD lower",
    "123 456 0x1f",
    "@link{org0/repo1/x.py}",
    "\t\n\r",
    "é ü ñ 中文 😀",
    '"unclosed phrase',
    'phrase" backwards',
    '"a" "b" "c" "d"',
    "a " * 50,
    "zzz" * 200,
    "parse AND buffer OR flush",  # no boolean operators: plain terms
    "parse; DROP TABLE documents; --",
    '"the a of"',  # stopword-only phrase
    '"dispatch"',  # single-term phrase
    "\\ \\\\ // **",
]


def _random_strings(n=10, seed=314):
    rng = random.Random(seed)
    alphabet = string.printable + "éüñ中文"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("query", FUZZ + _random_strings())
def test_fuzz_never_crashes_and_matches_oracle(
    spark, index_small, oracle_small, query
):
    # parse must never throw
    terms, phrases = parse_query(query)
    got = search(spark, index_small, query, DEFAULT, k=10).collect()
    want = oracle_search(oracle_small, query, DEFAULT, k=10)
    assert [r["doc_id"] for r in got] == list(want["doc_id"]), repr(query)
    for r, (_, w) in zip(got, want.iterrows()):
        assert r["score"] == pytest.approx(w["score"], rel=1e-9, abs=1e-12)
