"""WAND exactness: block-max WAND must return the same top-k as the
exhaustive BM25 path on every fixture query (SURVEY.md §7 'WAND
exactness')."""

from __future__ import annotations

import pytest

from spaghettisearch_spark.config import DEFAULT
from spaghettisearch_spark.functions.tokenize import parse_query
from spaghettisearch_spark.operators.bm25 import search
from spaghettisearch_spark.operators.wand import wand_topk

TERM_QUERIES = [
    "parse",
    "parse buffer flush",
    "dispatch",  # hot term: df ~ 80% — pruning actually engages
    "zyzzyva",
    "navigator",
    "dispatch buffer kernel parse",  # all-hot multi-term
    "qqqqqq",
]


def _exhaustive(spark, index_small, query, k, pagerank=None):
    return search(spark, index_small, query, DEFAULT, pagerank=pagerank, k=k).collect()


@pytest.mark.parametrize("kernel", ["taat", "daat"])
@pytest.mark.parametrize("query", TERM_QUERIES)
def test_wand_matches_exhaustive(spark, index_small, query, kernel):
    k = 20
    terms, _ = parse_query(query)
    want = _exhaustive(spark, index_small, query, k)
    got = wand_topk(
        spark, index_small, terms, DEFAULT, k=k, n_buckets=4, kernel=kernel
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9, abs=1e-12)
        assert g["title_rank"] == pytest.approx(w["title_rank"], rel=1e-9, abs=1e-12)
        assert g["body_rank"] == pytest.approx(w["body_rank"], rel=1e-9, abs=1e-12)


def test_wand_with_pagerank(spark, corpus_small, index_small):
    from spaghettisearch_spark.operators.links import extract_links
    from spaghettisearch_spark.operators.pagerank import compute_pagerank

    pr = compute_pagerank(spark, corpus_small, extract_links(corpus_small)).cache()
    terms, _ = parse_query("parse buffer")
    want = _exhaustive(spark, index_small, "parse buffer", 15, pagerank=pr)
    got = wand_topk(spark, index_small, terms, DEFAULT, k=15, pagerank=pr).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)


def test_wand_single_bucket_equals_many(spark, index_small):
    terms, _ = parse_query("parse buffer flush")
    a = wand_topk(spark, index_small, terms, DEFAULT, k=10, n_buckets=1).collect()
    b = wand_topk(spark, index_small, terms, DEFAULT, k=10, n_buckets=16).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_wand_from_shards_matches_exhaustive(spark, corpus_small, index_small):
    """North-rule query path: pruned shard scan -> varbyte decode ->
    WAND == exhaustive DataFrame scoring."""
    from spaghettisearch_spark.operators.compression import build_posting_shards
    from spaghettisearch_spark.operators.wand import build_doc_map, wand_topk_from_shards
    from pyspark.sql import functions as F

    n_docs = corpus_small.count()
    shards = build_posting_shards(
        index_small.postings.withColumn("weight", F.col("bm25_weight")),
        n_docs,
        DEFAULT,
    ).cache()
    doc_map = build_doc_map(corpus_small).cache()
    for query in ["parse", "parse buffer flush", "dispatch"]:
        terms, _ = parse_query(query)
        want = _exhaustive(spark, index_small, query, 15)
        got = wand_topk_from_shards(
            spark, shards, doc_map, terms, DEFAULT, k=15, n_buckets=4
        ).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], rel=1e-9)
    shards.unpersist(); doc_map.unpersist()


def test_wand_from_warehouse_shards_dense_ids(spark, docs_small, tmp_path):
    """Pipeline shards use dense doc_idx keys; shard-backed WAND from the
    warehouse == exhaustive scoring on the same index."""
    from spaghettisearch_spark.operators.bm25 import search
    from spaghettisearch_spark.operators.wand import wand_topk_from_shards
    from spaghettisearch_spark.plans.build_pipeline import build_all

    wh = str(tmp_path / "wh")
    built = build_all(
        spark, spark.createDataFrame(docs_small.head(120)), wh, with_pagerank=False
    )
    idx = built.load(spark)
    shards = built.shards(spark)
    doc_map = built.doc_map(spark)
    for query in ["parse", "parse buffer flush"]:
        terms, _ = parse_query(query)
        want = search(spark, idx, query, DEFAULT, k=15).collect()
        got = wand_topk_from_shards(
            spark, shards, doc_map, terms, DEFAULT, k=15
        ).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], rel=1e-9)
