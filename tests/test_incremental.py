"""Incremental re-index: changed-doc detection by sha, posting
replacement identity vs full rebuild (reference checkAndUpdate
semantics, indexer.go:41-75,420-641)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spaghettisearch_spark.operators import index_build as ib
from spaghettisearch_spark.operators.incremental import (
    apply_updates,
    diff_corpus,
    family_top5,
    incremental_reindex,
)
from spaghettisearch_spark.sources.corpus import ingest


def _mutate(docs, n_changed=5, n_new=3):
    changed = docs.copy()
    for i in range(n_changed):
        changed.loc[i, "content"] = changed.loc[i, "content"] + " freshzz tokenzz"
    new_rows = docs.tail(n_new).copy()
    new_rows["path"] = new_rows["path"] + ".new"
    import pandas as pd

    return pd.concat([changed, new_rows], ignore_index=True)


def test_diff_detects_changed_and_new(spark, docs_tiny, corpus_tiny):
    updated = _mutate(docs_tiny)
    changed = diff_corpus(corpus_tiny, spark.createDataFrame(updated))
    assert changed.count() == 8  # 5 changed + 3 new


def test_incremental_equals_full_rebuild(spark, docs_tiny, corpus_tiny):
    updated = _mutate(docs_tiny)
    updated_df = spark.createDataFrame(updated)
    changed = diff_corpus(corpus_tiny, updated_df)
    old_postings = ib.build_postings(ib.tokenize_fields(corpus_tiny))
    new_postings, new_corpus = apply_updates(old_postings, corpus_tiny, changed)

    full = ib.build_postings(ib.tokenize_fields(ingest(updated_df)))
    cols = ["term", "field", "doc_id", "tf"]
    a, b = new_postings.select(cols), full.select(cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert new_corpus.count() == len(updated)


def test_incremental_warehouse(spark, docs_tiny, tmp_path):
    """Incremental result (incl. anchor-credit closure) == full rebuild
    with links, for both changed docs and anchor-credit targets."""
    from spaghettisearch_spark.operators.links import extract_links
    from spaghettisearch_spark.plans.build_pipeline import build_all

    wh = str(tmp_path / "wh")
    docs_df = spark.createDataFrame(docs_tiny)
    build_all(spark, docs_df, wh, with_pagerank=False, with_shards=False)
    updated = _mutate(docs_tiny)
    n = incremental_reindex(spark, wh, spark.createDataFrame(updated))
    assert n == 8
    got = spark.read.parquet(f"{wh}/postings_raw").select(
        "term", "field", "doc_id", "tf"
    )
    full_corpus = ingest(spark.createDataFrame(updated))
    full = ib.build_postings(
        ib.tokenize_fields(full_corpus, links=extract_links(full_corpus))
    ).select("term", "field", "doc_id", "tf")
    assert got.count() == full.count()
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    # no-op second run
    assert incremental_reindex(spark, wh, spark.createDataFrame(updated)) == 0


def test_family_top5(spark, corpus_tiny):
    from spaghettisearch_spark.operators.links import extract_links

    links = extract_links(corpus_tiny)
    fam = family_top5(links)
    row = fam.filter(F.col("children_top5").isNotNull()).first()
    assert row is not None
    assert len(row["children_top5"]) <= 5
    assert row["children_top5"] == sorted(row["children_top5"])
