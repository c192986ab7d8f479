"""Varbyte/delta codec round-trip + property tests, and shard-path
equivalence to the uncompressed postings (SURVEY.md §5.2 item 1/3)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spaghettisearch_spark.operators.compression import (
    delta_decode,
    delta_encode,
    vb_decode,
    vb_encode,
)


def test_empty():
    assert vb_encode(np.array([], dtype=np.int64)) == b""
    assert len(vb_decode(b"")) == 0


def test_simple_roundtrip():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**62], dtype=np.int64)
    assert (vb_decode(vb_encode(vals)) == vals).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_vb_property(xs):
    vals = np.array(xs, dtype=np.int64)
    assert (vb_decode(vb_encode(vals)) == vals).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
def test_delta_vb_roundtrip_sorted(xs):
    vals = np.array(sorted(xs), dtype=np.int64)
    enc = vb_encode(delta_encode(vals))
    assert (delta_decode(vb_decode(enc)) == vals).all()


def test_shard_roundtrip_spark(spark, corpus_tiny):
    """build shards -> decode -> identical (term, field, doc, tf, weight,
    positions) multiset as the uncompressed postings."""
    from pyspark.sql import functions as F

    from spaghettisearch_spark.functions.hashing import term_hash60_col
    from spaghettisearch_spark.operators.compression import (
        build_posting_shards,
        decode_shards,
    )
    from spaghettisearch_spark.operators.index_build import build_index

    idx = build_index(corpus_tiny)
    n_docs = corpus_tiny.count()
    shards = build_posting_shards(idx.postings, n_docs)
    decoded = decode_shards(shards)

    orig = idx.postings.select(
        "term",
        "field",
        term_hash60_col("doc_id").alias("doc_key"),
        F.col("tf").cast("int").alias("tf"),
        F.round("weight", 9).alias("weight"),
        F.col("positions").cast("array<int>").alias("positions"),
    )
    got = decoded.select(
        "term", "field", "doc_key", "tf", F.round("weight", 9).alias("weight"), "positions"
    )
    assert got.count() == orig.count()
    assert got.exceptAll(orig).count() == 0
    assert orig.exceptAll(got).count() == 0
    # hot terms must be salted into multiple blocks
    from spaghettisearch_spark.fixtures import HOT_TERMS

    hot_blocks = shards.filter(
        (F.col("term") == HOT_TERMS[0]) & (F.col("field") == "body")
    ).count()
    assert hot_blocks > 1


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),          # term id
            st.integers(min_value=0, max_value=60),         # doc number
            st.integers(min_value=1, max_value=7),          # tf
            st.lists(                                       # positions
                st.integers(min_value=0, max_value=5000),
                max_size=6,
            ),
            st.floats(
                min_value=0.001, max_value=50.0,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_shard_roundtrip_property(spark, postings_spec):
    """Property: build_posting_shards ∘ decode_shards is the identity on
    arbitrary posting sets — random term/doc/tf/positions/weight combos,
    including empty position lists, duplicate (term, doc) rows collapsed
    to one (the builder's input contract), and weight ties that push
    groups onto the hash-salt fallback."""
    from spaghettisearch_spark.config import DEFAULT
    from spaghettisearch_spark.functions.hashing import term_hash60_py
    from spaghettisearch_spark.operators.compression import (
        build_posting_shards,
        decode_shards,
    )

    seen = {}
    for t, d, tf, pos, w in postings_spec:
        seen[(f"t{t}", f"doc{d:03d}")] = (tf, sorted(set(pos)), round(w, 6))
    rows = [
        (term, "body", doc, tf, pos, w)
        for (term, doc), (tf, pos, w) in seen.items()
    ]
    pdf = spark.createDataFrame(
        rows,
        "term string, field string, doc_id string, tf int, "
        "positions array<int>, weight double",
    )
    shards = build_posting_shards(pdf, 61, DEFAULT)
    got = {
        (r["term"], r["doc_key"], r["tf"], round(r["weight"], 6),
         tuple(r["positions"]))
        for r in decode_shards(shards).collect()
    }
    want = {
        (term, term_hash60_py(doc), tf, w, tuple(pos))
        for (term, doc), (tf, pos, w) in seen.items()
    }
    assert got == want

def test_absolute_block_bound(spark):
    """``block_target_postings`` bounds every encode group ABSOLUTELY
    (the quantile split alone caps blocks at ~df/n_salts, which grows
    with the corpus): a hot term's quantile buckets and a cold-but-large
    group both doc-hash sub-split once their expected size passes the
    target; the decoded multiset is unchanged, shard-backed WAND stays
    exact, and under the default target the (term, field, salt, df)
    layout is identical to the unbounded one."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from spaghettisearch_spark.config import DEFAULT
    from spaghettisearch_spark.operators.compression import (
        build_doc_dim,
        build_posting_shards,
        decode_shards,
    )
    from spaghettisearch_spark.operators.wand import wand_topk_from_shards

    n = 2000
    docs = [f"d{i:05d}" for i in range(n)]
    rows = [
        ("hh", "body", d, 1, [0], 1.0 + i * 0.001)  # hot: df == n
        for i, d in enumerate(docs)
    ]
    rows += [
        ("cc", "body", d, 1, [1], 5.0 + i * 0.01)  # cold but > target
        for i, d in enumerate(docs[:150])
    ]
    rows += [("ss", "body", d, 1, [2], 9.0) for d in docs[:10]]  # small
    postings = spark.createDataFrame(
        rows,
        "term string, field string, doc_id string, tf int, "
        "positions array<int>, weight double",
    )
    dim = build_doc_dim(
        spark.createDataFrame([(d,) for d in docs], "doc_id string")
    ).cache()
    dim.count()
    cfg = replace(DEFAULT, block_target_postings=32)
    shards = build_posting_shards(
        postings, n, cfg, doc_dim=dim, weight_col="weight"
    ).cache()
    meta = shards.select("term", "field", "salt", "df").collect()
    by_term: dict = {}
    for r in meta:
        by_term.setdefault(r["term"], []).append(int(r["df"]))
    # hot: 16 quantile buckets x ceil(2000/(16*32))=4 sub-salts
    assert len(by_term["hh"]) == 64, sorted(by_term["hh"])
    # cold oversized: ceil(150/32)=5 doc-hash blocks
    assert len(by_term["cc"]) == 5, by_term["cc"]
    assert len(by_term["ss"]) == 1
    # the bound holds with doc-hash slack
    assert max(by_term["hh"]) <= 2 * 32, max(by_term["hh"])
    assert max(by_term["cc"]) <= 2 * 32, max(by_term["cc"])
    # round-trip: decoded multiset == input
    got = {
        (r["term"], r["doc_key"], r["tf"], round(r["weight"], 6),
         tuple(r["positions"]))
        for r in decode_shards(shards).collect()
    }
    idx_of = {
        r["doc_id"]: r["doc_idx"] for r in dim.collect()
    }
    want = {
        (t, idx_of[d], tf, round(w, 6), tuple(p))
        for t, _f, d, tf, p, w in rows
    }
    assert got == want
    # WAND over sub-split blocks == python oracle
    doc_map = dim.select(F.col("doc_idx").alias("doc_key"), "doc_id")
    res = wand_topk_from_shards(
        spark, shards, doc_map, ["hh", "cc"], cfg, k=5, dense_keys=True
    ).collect()
    score: dict = {}
    for t, _f, d, _tf, _p, w in rows:
        if t in ("hh", "cc"):
            score[d] = score.get(d, 0.0) + cfg.w_body * cfg.blend_scale * w
    top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["doc_id"] for r in res] == [d for d, _ in top]
    # default target: sub == 1 everywhere here -> layout identical to a
    # build with the bound effectively off
    base = build_posting_shards(
        postings, n, DEFAULT, doc_dim=dim, weight_col="weight"
    )
    huge = build_posting_shards(
        postings, n, replace(DEFAULT, block_target_postings=1 << 40),
        doc_dim=dim, weight_col="weight",
    )
    key = lambda df_: sorted(
        (r["term"], r["field"], int(r["salt"]), int(r["df"]))
        for r in df_.select("term", "field", "salt", "df").collect()
    )
    assert key(base) == key(huge)
    dim.unpersist()
    shards.unpersist()
