"""PageRank: Spark iterative joins vs plain-Python power iteration,
plus structural properties (cycle convergence, dangling targets in the
node set — reference pagerank.go:24-44, 85-145)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spaghettisearch_spark.operators.links import extract_links
from spaghettisearch_spark.operators.pagerank import compute_pagerank
from spaghettisearch_spark.oracle.pandas_oracle import oracle_pagerank


@pytest.fixture(scope="module")
def pr_inputs(spark, corpus_tiny):
    links = extract_links(corpus_tiny).cache()
    ranks = compute_pagerank(spark, corpus_tiny, links).cache()
    return links, ranks


def test_matches_oracle(spark, corpus_tiny, pr_inputs):
    links, ranks = pr_inputs
    nodes = [r["doc_id"] for r in corpus_tiny.select("doc_id").collect()]
    edges = [
        (r["src_doc"], r["dst_doc"])
        for r in links.select("src_doc", "dst_doc").collect()
    ]
    want = oracle_pagerank(nodes, edges)
    got = {r["doc_id"]: r["rank"] for r in ranks.collect()}
    assert set(got) == set(want)
    for d, v in want.items():
        assert got[d] == pytest.approx(v, rel=1e-9, abs=1e-12)


def test_sums_to_one_and_dangling_included(spark, corpus_tiny, pr_inputs):
    links, ranks = pr_inputs
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)
    n_dangling = links.filter(~F.col("dst_exists")).count()
    assert n_dangling > 0  # fixture guarantees ghosts
    n_corpus = corpus_tiny.count()
    assert ranks.count() > n_corpus  # ghosts are ranked nodes too


def test_linked_docs_outrank_isolated(spark, corpus_tiny, pr_inputs):
    links, ranks = pr_inputs
    linked = ranks.join(
        links.select(F.col("dst_doc").alias("doc_id")).distinct(), "doc_id"
    )
    isolated = ranks.join(
        links.select(F.col("dst_doc").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    assert (
        linked.agg(F.avg("rank")).first()[0]
        > isolated.agg(F.avg("rank")).first()[0]
    )
