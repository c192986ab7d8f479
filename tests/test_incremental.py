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


def test_incremental_link_to_unchanged_doc(spark, tmp_path):
    """ADVICE r01 (high): a changed doc linking to an existing UNCHANGED
    doc must keep dst_exists=true so the target keeps its inbound
    anchor-credit title postings; and the rewrite must preserve lineage
    sidecars so a subsequent build_all resumes instead of reverting."""
    import json

    import pandas as pd

    from spaghettisearch_spark.operators.links import extract_links
    from spaghettisearch_spark.plans.build_pipeline import (
        build_all,
        corpus_fingerprint,
    )

    cols = ["repo", "path", "commit", "lang", "content"]
    docs = pd.DataFrame(
        [
            ("r", "a.py", "c1", "py", "alpha beta @link{r/b.py} gamma"),
            ("r", "b.py", "c1", "py", "delta epsilon zeta"),
            ("r", "c.py", "c1", "py", "eta theta iota"),
        ],
        columns=cols,
    )
    wh = str(tmp_path / "wh")
    build_all(
        spark, spark.createDataFrame(docs), wh,
        with_pagerank=False, with_shards=False,
    )
    updated = docs.copy()
    updated.loc[0, "content"] = "alpha freshzz @link{r/b.py} gamma"
    updated_df = spark.createDataFrame(updated)
    assert incremental_reindex(spark, wh, updated_df) == 1

    # persisted link rows to the unchanged target keep dst_exists=true
    links = spark.read.parquet(f"{wh}/links")
    assert [r["dst_exists"] for r in links.collect()] == [True]

    # postings (incl. b.py's inbound anchor credit) == full rebuild
    got = spark.read.parquet(f"{wh}/postings_raw").select(
        "term", "field", "doc_id", "tf"
    )
    full_corpus = ingest(updated_df)
    full = ib.build_postings(
        ib.tokenize_fields(full_corpus, links=extract_links(full_corpus))
    ).select("term", "field", "doc_id", "tf")
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0

    # lineage sidecars survive with the UPDATED fingerprint...
    new_fp = corpus_fingerprint(updated_df)
    for name in ("corpus", "links", "postings_raw"):
        meta = json.loads((tmp_path / "wh" / name / "_lineage.json").read_text())
        assert meta["input_fingerprint"] == new_fp, name
    # ...so a resumed build over the updated docs skips the rewritten
    # stages and rebuilds only the stale downstream stats
    built = build_all(
        spark, updated_df, wh, with_pagerank=False, with_shards=False,
    )
    skipped = {s.name: s.skipped for s in built.stages}
    assert skipped["corpus"] and skipped["links"] and skipped["postings_raw"]
    assert not skipped["doc_stats"] and not skipped["postings"]


def test_family_top5(spark, corpus_tiny):
    from spaghettisearch_spark.operators.links import extract_links

    links = extract_links(corpus_tiny)
    fam = family_top5(links)
    row = fam.filter(F.col("children_top5").isNotNull()).first()
    assert row is not None
    assert len(row["children_top5"]) <= 5
    assert row["children_top5"] == sorted(row["children_top5"])
