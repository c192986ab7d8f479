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


def test_topic_pagerank_single_category_equals_global(
    spark, corpus_tiny, pr_inputs
):
    """With one category covering the whole corpus, per-category PR must
    equal global PR (init 1/numPages = 1/n... except numPages counts
    corpus docs while n counts graph nodes incl. dangling targets — the
    reference has the same asymmetry, pagerank.go:60 numPages vs :100
    setWebNodes; after normalization both converge to the same fixed
    point, so compare at convergence)."""
    from spaghettisearch_spark.operators.topics import compute_topic_pagerank

    links, ranks = pr_inputs
    topics = corpus_tiny.select("doc_id", F.lit("all").alias("category"))
    got = {
        r["doc_id"]: r["rank"]
        for r in compute_topic_pagerank(
            spark, corpus_tiny, links, topics, epsilon=1e-12
        ).collect()
    }
    want = {
        r["doc_id"]: r["rank"]
        for r in compute_pagerank(
            spark, corpus_tiny, links, epsilon=1e-12
        ).collect()
    }
    assert set(got) == set(want)
    for d, v in want.items():
        assert got[d] == pytest.approx(v, rel=1e-6, abs=1e-10)


def test_topic_pagerank_per_category_sums_to_one(spark, corpus_tiny, pr_inputs):
    from spaghettisearch_spark.operators.topics import compute_topic_pagerank

    links, _ = pr_inputs
    topics = corpus_tiny.select(
        "doc_id",
        F.concat(F.lit("c"), (F.crc32("doc_id") % 3).cast("string")).alias(
            "category"
        ),
    )
    pr = compute_topic_pagerank(
        spark, corpus_tiny, links, topics, max_iters=4, epsilon=0.0
    ).cache()
    sums = pr.groupBy("category").agg(F.sum("rank").alias("s")).collect()
    assert len(sums) == 3
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=1e-9)
    # every category ranks the FULL node set (reference pagerank.go:100)
    n_nodes = pr.select("doc_id").distinct().count()
    assert pr.count() == 3 * n_nodes


def test_topic_tables(spark, corpus_tiny, index_small):
    from spaghettisearch_spark.operators import index_build as ib
    from spaghettisearch_spark.operators.topics import build_topic_tables

    tokens = ib.tokenize_fields(corpus_tiny)
    topics = corpus_tiny.select(
        "doc_id", F.substring("doc_id", 1, 1).alias("category")
    )
    terms, meta = build_topic_tables(tokens, topics)
    # num_pages partitions the corpus; word_count totals the token volume
    assert meta.agg(F.sum("num_pages")).first()[0] == corpus_tiny.count()
    assert meta.agg(F.sum("word_count")).first()[0] == tokens.count()
    one = terms.first()
    import hashlib

    assert one["term_id"] == hashlib.md5(one["term"].encode()).hexdigest()


def test_pipeline_topic_stages(spark, docs_tiny, tmp_path):
    """build_all(topics=...) materializes the reference's post-pass
    tables (topic_terms / topic_meta / pagerank_topic) as resumable
    stages."""
    from spaghettisearch_spark.plans.build_pipeline import build_all

    wh = str(tmp_path / "wh")
    docs = spark.createDataFrame(docs_tiny)
    from spaghettisearch_spark.sources.corpus import ingest

    topics = ingest(docs).select(
        "doc_id", F.substring("doc_id", 1, 1).alias("category")
    )
    built = build_all(
        spark, docs, wh, with_pagerank=False, with_shards=False, topics=topics
    )
    names = {s.name for s in built.stages}
    assert {"topic_terms", "topic_meta", "pagerank_topic"} <= names
    pr = built.topic_pagerank(spark)
    sums = pr.groupBy("category").agg(F.sum("rank").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    # resumable: identical rerun skips every stage
    again = build_all(
        spark, docs, wh, with_pagerank=False, with_shards=False, topics=topics
    )
    assert all(s.skipped for s in again.stages)


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
