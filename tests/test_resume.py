"""Build pipeline: lineage sidecars, kill/resume identity, warehouse-
loaded query parity (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from spaghettisearch_spark.config import DEFAULT
from spaghettisearch_spark.plans.build_pipeline import build_all
from spaghettisearch_spark.sources.checkpoints import LINEAGE_FILE


@pytest.fixture(scope="module")
def warehouse(spark, docs_tiny, tmp_path_factory):
    w = str(tmp_path_factory.mktemp("warehouse"))
    docs = spark.createDataFrame(docs_tiny)
    built = build_all(spark, docs, w)
    return w, built, docs


def test_lineage_written(warehouse):
    w, built, _ = warehouse
    for st in built.stages:
        meta = json.loads((Path(st.path) / LINEAGE_FILE).read_text())
        assert meta["stage"] == st.name
        assert meta["rows_out"] >= 0
        assert meta["wall_seconds"] >= 0
        assert meta["input_fingerprint"]
    names = [s.name for s in built.stages]
    assert "posting_shards" in names and "pagerank" in names


def test_resume_skips_completed(spark, warehouse):
    w, _, docs = warehouse
    again = build_all(spark, docs, w)
    assert all(s.skipped for s in again.stages)


def test_resume_after_partial_kill(spark, warehouse):
    """Destroy a mid-pipeline stage -> only it (and nothing before it)
    reruns; final outputs identical."""
    import shutil

    w, built, docs = warehouse
    before = {
        r["doc_id"]: r["rank"]
        for r in spark.read.parquet(f"{w}/pagerank").collect()
    }
    shutil.rmtree(f"{w}/doc_norms")
    (Path(f"{w}/pagerank") / "_SUCCESS").unlink()  # simulate killed write
    again = build_all(spark, docs, w)
    rerun = {s.name for s in again.stages if not s.skipped}
    assert rerun == {"doc_norms", "pagerank"}
    after = {
        r["doc_id"]: r["rank"]
        for r in spark.read.parquet(f"{w}/pagerank").collect()
    }
    assert before.keys() == after.keys()
    for k in before:
        assert after[k] == pytest.approx(before[k], rel=1e-12)


def test_changed_input_invalidates(spark, warehouse, docs_tiny):
    w, _, _ = warehouse
    changed = docs_tiny.copy()
    changed.loc[0, "content"] = changed.loc[0, "content"] + " extrazz"
    again = build_all(spark, spark.createDataFrame(changed), w)
    assert not any(s.skipped for s in again.stages)


def test_warehouse_query_parity(spark, warehouse, docs_tiny):
    """Query results from the parquet-backed index (precomputed BM25
    weights, no stats joins) match the in-memory index path."""
    # rebuild warehouse (previous test overwrote it with changed input)
    w, built, docs = warehouse
    build_all(spark, docs, w)
    from spaghettisearch_spark.operators.bm25 import search
    from spaghettisearch_spark.operators.index_build import build_index
    from spaghettisearch_spark.operators.links import extract_links
    from spaghettisearch_spark.sources.corpus import ingest

    loaded = built.load(spark)
    corpus = ingest(docs)
    mem = build_index(corpus, links=extract_links(corpus))
    for q in ("parse", "parse buffer flush", '"hash table probe"', "dispatch"):
        a = search(spark, loaded, q, DEFAULT, k=15).collect()
        b = search(spark, mem, q, DEFAULT, k=15).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b], q
        for x, y in zip(a, b):
            assert x["score"] == pytest.approx(y["score"], rel=1e-9)
