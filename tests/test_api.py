"""SearchEngine facade: the reference's /query + /wordlist surface."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def engine(spark, docs_tiny):
    from spaghettisearch_spark.api import SearchEngine

    return SearchEngine.build(spark, spark.createDataFrame(docs_tiny))


def test_query_cards(engine):
    cards = engine.query("parse", k=5)
    assert 0 < len(cards) <= 5
    c = cards[0]
    for key in ("rank", "url", "final_rank", "title_rank", "body_rank",
                "pagerank", "snippet", "top_words", "content_sha256"):
        assert key in c
    assert c["rank"] == 1
    assert cards == sorted(cards, key=lambda x: (-x["final_rank"], x["doc_id"]))
    assert len(c["content_sha256"]) == 64


def test_query_wand_path_matches(engine):
    a = engine.query("parse buffer", k=10)
    b = engine.query("parse buffer", k=10, use_wand=True)
    assert [c["doc_id"] for c in a] == [c["doc_id"] for c in b]
    for x, y in zip(a, b):
        assert x["final_rank"] == pytest.approx(y["final_rank"], rel=1e-9)


def test_phrase_query_cards(engine):
    cards = engine.query('"hash table probe"', k=5)
    assert cards
    assert all("hash table probe" in c["snippet"] for c in cards)


def test_wordlist(engine):
    words = engine.wordlist("pa")
    assert words == sorted(words)
    assert all(w.startswith("pa") for w in words)
    # stemmed vocabulary: 'parse' family stems present
    assert any(w.startswith("pars") for w in words)
    assert engine.wordlist("zzzzz") == []
