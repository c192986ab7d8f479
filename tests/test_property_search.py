"""Randomized rank-identity: random small corpora and random queries
(terms drawn from the corpus vocabulary, random phrases lifted from real
token windows) must match the pandas oracle exactly — catches anything
the fixed fixture queries miss."""

from __future__ import annotations

import random

import pytest

from spaghettisearch_spark.config import DEFAULT
from spaghettisearch_spark.fixtures import make_documents
from spaghettisearch_spark.functions.tokenize import tokenize_py
from spaghettisearch_spark.operators.bm25 import search
from spaghettisearch_spark.operators.index_build import build_index
from spaghettisearch_spark.operators.links import extract_links
from spaghettisearch_spark.oracle.pandas_oracle import build_oracle_index, oracle_search
from spaghettisearch_spark.sources.corpus import ingest


@pytest.mark.parametrize("seed", [7, 99, 1234])
def test_random_queries_match_oracle(spark, seed):
    rng = random.Random(seed)
    docs = make_documents(80, seed=seed)
    corpus = ingest(spark.createDataFrame(docs)).cache()
    links = extract_links(corpus).cache()
    idx = build_index(corpus, links=links)
    idx.postings.count()
    oracle = build_oracle_index(docs)

    # vocabulary actually present (stemmed space doesn't matter: queries
    # are raw words from content, both sides stem identically)
    all_words = []
    for content in docs["content"]:
        all_words.extend(content.split()[:40])
    all_words = [w for w in all_words if w.isalnum()]

    queries = []
    for _ in range(6):
        n = rng.randint(1, 4)
        queries.append(" ".join(rng.choice(all_words) for _ in range(n)))
    # random real phrases: consecutive token windows from real docs
    for _ in range(3):
        content = docs["content"][rng.randrange(len(docs))]
        toks = [w for w in content.split() if w.isalnum()]
        if len(toks) < 5:
            continue
        i = rng.randrange(len(toks) - 3)
        queries.append('"' + " ".join(toks[i:i + rng.randint(2, 3)]) + '"')
    # mixed
    queries.append(f'"{all_words[0]} {all_words[1]}" {all_words[2]}')

    for q in queries:
        got = search(spark, idx, q, DEFAULT, k=25).collect()
        want = oracle_search(oracle, q, DEFAULT, k=25)
        assert [r["doc_id"] for r in got] == list(want["doc_id"]), q
        for r, (_, w) in zip(got, want.iterrows()):
            assert r["score"] == pytest.approx(w["score"], rel=1e-9, abs=1e-12), q
    corpus.unpersist()
    links.unpersist()
