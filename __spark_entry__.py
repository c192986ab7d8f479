"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 search over the sf0.001 documents table.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-data ops), each (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB ANSI-SQL mirrors. Tokenization for oracle-
checked entries is the engine's exact pipeline minus Porter2 stemming
(DuckDB has no stemmer); stemming correctness is covered by pytest
golden pairs + the pandas oracle (tests/).

Float outputs are scaled+rounded to integers (``*_e5``/``*_e9``) in BOTH
engines so the driver's value-hash compares integers, not float reprs.
"""

from __future__ import annotations

import os
import shutil
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spaghettisearch_spark.config import EngineConfig
from spaghettisearch_spark.functions.hashing import term_hash60_col, term_hash60_sql
from spaghettisearch_spark.functions.tokenize import STOPWORDS, tokenize_col

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

CFG = EngineConfig(stem=False)  # oracle-checked entries: no stemming
K1, B = CFG.k1, CFG.b
BODY_W = CFG.w_body * CFG.blend_scale  # 29.0

_SW_SQL = ",".join(f"'{w}'" for w in sorted(STOPWORDS))

# token-list CTE: identical tokenization in DuckDB
_TL = f"""
tl AS (
  SELECT doc_id,
         md5(source || '/' || CAST(doc_id AS VARCHAR)) AS did,
         list_filter(
           string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
           t -> t <> '' AND t NOT IN ({_SW_SQL})
         ) AS toks
  FROM documents
)"""

_TOKS = _TL + """,
toks AS (
  SELECT doc_id, did, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
  FROM tl
)"""

# BM25 (body field) score CTEs over a fixed term list
def _bm25_sql(terms: list[str], k: int) -> str:
    terms_sql = ",".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS},
tf AS (
  SELECT did, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY did, term
),
dl AS (
  SELECT did, len(toks)::BIGINT AS dl FROM tl
),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents)::DOUBLE AS n_docs,
         (SELECT AVG(len(toks)) FROM tl) AS avgdl
),
df AS (
  SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term
),
hits AS (
  SELECT tf.did,
         ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) AS contrib
  FROM tf JOIN df USING (term) JOIN dl USING (did) CROSS JOIN stats s
  WHERE tf.term IN ({terms_sql})
),
scored AS (
  SELECT did, SUM(contrib) * {BODY_W} AS score FROM hits GROUP BY did
)
SELECT did, CAST(ROUND(score * 100000) AS BIGINT) AS score_e5
FROM scored
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _did(c="doc_id"):
    return F.md5(F.concat(F.col("source"), F.lit("/"), F.col(c).cast("string")))


def _body_tokens(spark, sf_dir) -> DataFrame:
    """(doc_id, did, pos, term) — pos is 1-based to match DuckDB
    generate_subscripts."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            _did().alias("did"),
            F.posexplode(tokenize_col("text", remove_stopwords=True)).alias(
                "pos0", "term"
            ),
        )
        .select("doc_id", "did", (F.col("pos0") + 1).alias("pos"), "term")
    )


_INDEX_CACHE: dict[str, object] = {}


def _engine_index(spark: SparkSession, sf_dir: str):
    """Engine index over the driver corpus (cached per sf_dir)."""
    if sf_dir not in _INDEX_CACHE:
        from spaghettisearch_spark.operators.index_build import build_index
        from spaghettisearch_spark.sources.corpus import from_driver_documents

        corpus = from_driver_documents(_docs(spark, sf_dir)).cache()
        idx = build_index(corpus, CFG)
        idx.postings.cache().count()
        idx.doc_stats.cache()
        idx.term_stats.cache()
        idx._driver_corpus = corpus
        _INDEX_CACHE[sf_dir] = idx
    return _INDEX_CACHE[sf_dir]


_SHARDS_CACHE: dict[str, tuple] = {}


def _engine_shards(spark: SparkSession, sf_dir: str):
    """Compressed posting shards + doc_map over the driver corpus
    (the north-rule storage path), cached per sf_dir."""
    if sf_dir not in _SHARDS_CACHE:
        from spaghettisearch_spark.operators.compression import (
            build_doc_dim,
            build_posting_shards,
            merge_posting_shards,
        )
        from spaghettisearch_spark.operators.incremental import diff_corpus
        from spaghettisearch_spark.operators.index_build import (
            build_postings,
            tokenize_fields,
        )
        from spaghettisearch_spark.sources.corpus import ingest

        idx = _engine_index(spark, sf_dir)
        corpus = idx._driver_corpus
        n_docs = corpus.count()
        # dense-keyed shards (doc_idx) + deferred doc_id hydration: the
        # at-scale shape — the corpus-sized map never rides a per-query
        # shuffle (wand.py wand_topk_from_shards dense_keys docstring).
        #
        # The shards are produced by a SIMULATED RE-CRAWL, so every
        # hash-green shard entry also gates the composed incremental
        # path (the reference's checkAndUpdate analog, indexer.go:
        # 420-641): ~10% of docs start STALE (perturbed content with a
        # vanished synthetic term) in the base segment; diff_corpus
        # detects them by content_sha256; the delta re-indexes them and
        # merge_posting_shards applies the delta WITH tombstones for the
        # stale postings. The merged shards must equal a one-shot build
        # of the true corpus — which is exactly what the DuckDB oracles
        # of wand_topk_shards / phrase_topk_shards assert.
        doc_dim = build_doc_dim(corpus).cache()
        raw = corpus.select("repo", "path", "commit", "lang", "content")
        stale_pred = F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0
        changed_ids = corpus.filter(stale_pred).select("doc_id").cache()
        stale_raw = ingest(raw).withColumn(
            "content",
            F.when(
                stale_pred,
                F.concat(F.col("content"), F.lit(" zzstaleterm zzstaleterm")),
            ).otherwise(F.col("content")),
        ).select("repo", "path", "commit", "lang", "content")
        stale_corpus = ingest(stale_raw).cache()
        # stale postings for the changed docs (weights irrelevant — every
        # one of these rows is tombstoned and/or upserted by the delta)
        stale_postings = build_postings(
            tokenize_fields(
                stale_corpus.join(changed_ids, "doc_id", "left_semi"), CFG
            )
        ).withColumn("weight", F.lit(1.0)).cache()
        true_keep = (
            idx.postings.join(changed_ids, "doc_id", "left_anti")
            .withColumn("weight", F.col("bm25_weight"))
            .select("term", "field", "doc_id", "tf", "positions", "weight")
        )
        base = build_posting_shards(
            true_keep.unionByName(
                stale_postings.select(
                    "term", "field", "doc_id", "tf", "positions", "weight"
                )
            ),
            n_docs, CFG, doc_dim=doc_dim, weight_col="weight",
        ).cache()
        # --- the re-crawl batch arrives: the true docs ---
        changed = diff_corpus(stale_corpus, raw).cache()
        delta = build_posting_shards(
            idx.postings.join(changed.select("doc_id"), "doc_id", "left_semi"),
            n_docs, CFG, doc_dim=doc_dim, weight_col="bm25_weight",
        ).cache()
        tombstones = stale_postings.join(doc_dim, "doc_id").select(
            "term", "field", F.col("doc_idx").alias("doc_key")
        )
        shards = merge_posting_shards(
            base, delta, n_docs, CFG, delete_postings=tombstones
        ).cache()
        shards.count()
        doc_map = doc_dim.select(
            F.col("doc_idx").alias("doc_key"), "doc_id"
        ).cache()
        doc_map.count()
        # only shards + doc_map serve queries; the build-time frames
        # (segments, dim, diff) must not pin executor storage
        for f in (base, delta, doc_dim, stale_corpus, stale_postings,
                  changed, changed_ids):
            f.unpersist()
        _SHARDS_CACHE[sf_dir] = (shards, doc_map, {})
    return _SHARDS_CACHE[sf_dir]


def _e(col, scale: int):
    return F.round(F.col(col) * scale).cast("long")


QUERY_TERMS = ["spark", "query", "scan"]
PHRASE = ("value", "table")


# ---------------------------------------------------------------------------
# synthetic deterministic link graph over driver docs (for PageRank oracle)
# ---------------------------------------------------------------------------

def _edges(spark, sf_dir) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.count()
    e1 = d.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 3) % n).alias("dst")
    )
    e2 = d.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 13 + 1) % n).alias("dst")
    )
    return e1.unionByName(e2).filter(F.col("src") != F.col("dst")).distinct()


_EDGES_SQL = """
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 3) % (SELECT COUNT(*) FROM documents) AS dst FROM documents
    UNION ALL
    SELECT doc_id AS src, (doc_id * 13 + 1) % (SELECT COUNT(*) FROM documents) AS dst FROM documents
  ) WHERE src <> dst
)"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tf_postings(spark, sf_dir):
    return (
        _body_tokens(spark, sf_dir)
        .groupBy("did", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def q_doc_frequency(spark, sf_dir):
    return (
        q_tf_postings(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )


def q_doc_lengths(spark, sf_dir):
    return (
        _body_tokens(spark, sf_dir)
        .groupBy("did")
        .agg(F.count("*").cast("long").alias("dl"))
    )


def q_tfidf_weights(spark, sf_dir):
    """normTF * log2(N/df) — the reference's exact term weighting
    (indexer.go:362, term_weighting.go:37)."""
    tf = q_tf_postings(spark, sf_dir)
    n_docs = _docs(spark, sf_dir).count()
    w = Window.partitionBy("did")
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    out = (
        tf.withColumn("max_tf", F.max("tf").over(w))
        .join(df, "term")
        .select(
            "did",
            "term",
            F.round(
                (F.col("tf") / F.col("max_tf"))
                * F.log2(F.lit(float(n_docs)) / F.col("df"))
                * 1e6
            ).cast("long").alias("w_e6"),
        )
    )
    return out


def q_bm25_topk(spark, sf_dir):
    from spaghettisearch_spark.operators.bm25 import search

    idx = _engine_index(spark, sf_dir)
    res = search(spark, idx, " ".join(QUERY_TERMS), CFG, k=20)
    return res.select(F.col("doc_id").alias("did"), _e("score", 100000).alias("score_e5"))


def q_wand_topk(spark, sf_dir):
    from spaghettisearch_spark.operators.wand import wand_topk

    idx = _engine_index(spark, sf_dir)
    res = wand_topk(spark, idx, QUERY_TERMS, CFG, k=20, n_buckets=8)
    return res.select(F.col("doc_id").alias("did"), _e("score", 100000).alias("score_e5"))


def q_wand_topk_shards(spark, sf_dir):
    """Exact top-k straight from the COMPRESSED posting shards (pruned
    scan -> varbyte decode -> WAND) — must hash-match the same BM25
    oracle as the in-memory paths. The shards are two segments compacted
    by merge_posting_shards, so this row also gates the merge path."""
    from spaghettisearch_spark.operators.wand import wand_topk_from_shards

    shards, doc_map, meta = _engine_shards(spark, sf_dir)
    res = wand_topk_from_shards(
        spark, shards, doc_map, QUERY_TERMS, CFG, k=20, n_buckets=8,
        dense_keys=True, meta_cache=meta,
    )
    return res.select(
        F.col("doc_id").alias("did"), _e("score", 100000).alias("score_e5")
    )


def q_stats_refresh_topk(spark, sf_dir):
    """In-place scorer-migration gate for refresh_shard_stats
    (compression.py): shards are first built carrying the LEGACY tf-idf
    weights (normTF*idf — the reference's original scorer,
    ranking/term_weighting.go:37), then refresh_shard_stats with
    drift_threshold=0 re-derives BM25 weights from the stored tfs + the
    CURRENT index stats, postings untouched. The WAND top-k over the
    refreshed shards must hash-match the same DuckDB BM25 oracle as the
    clean-build paths — refreshed-from-another-scorer ==
    built-from-scratch, weight-exact to 1e-5."""
    from spaghettisearch_spark.operators.compression import (
        build_posting_shards,
        key_doc_stats,
        refresh_shard_stats,
    )
    from spaghettisearch_spark.operators.wand import (
        build_doc_map,
        wand_topk_from_shards,
    )

    idx = _engine_index(spark, sf_dir)
    corpus = idx._driver_corpus
    n_docs = corpus.count()
    # default weight_col="weight" = the tf-idf column — deliberately the
    # WRONG scorer for WAND, to be repaired in place by the refresh
    stale = build_posting_shards(idx.postings, n_docs, CFG).cache()
    stale.count()
    refreshed = refresh_shard_stats(
        stale, idx.term_stats, key_doc_stats(idx.doc_stats, None),
        idx.corpus_stats.collect(), CFG, drift_threshold=0.0,
    )
    res = wand_topk_from_shards(
        spark, refreshed, build_doc_map(corpus), QUERY_TERMS, CFG,
        k=20, n_buckets=8,
    )
    return res.select(
        F.col("doc_id").alias("did"), _e("score", 100000).alias("score_e5")
    )


def q_phrase_topk_shards(spark, sf_dir):
    """Phrase top-k from the COMPRESSED shards: pruned scan -> varbyte
    position decode -> offset-adjust intersect -> field blend. Same
    oracle as phrase_topk."""
    from spaghettisearch_spark.operators.phrase import phrase_matches_from_shards

    shards, doc_map, _meta = _engine_shards(spark, sf_dir)
    m = phrase_matches_from_shards(spark, shards, doc_map, list(PHRASE), CFG)
    scored = (
        m.groupBy("doc_id")
        .pivot("field", ["title", "body"])
        .agg(F.sum("contrib"))
        .select(
            "doc_id",
            (
                (
                    F.lit(CFG.w_title) * F.coalesce("title", F.lit(0.0))
                    + F.lit(CFG.w_body) * F.coalesce("body", F.lit(0.0))
                )
                * F.lit(CFG.blend_scale)
            ).alias("score"),
        )
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)
    return topk.select(
        F.col("doc_id").alias("did"), _e("score", 100000).alias("score_e5")
    )


def q_phrase_topk(spark, sf_dir):
    from spaghettisearch_spark.operators.bm25 import search

    idx = _engine_index(spark, sf_dir)
    res = search(spark, idx, f'"{PHRASE[0]} {PHRASE[1]}"', CFG, k=20)
    return res.select(
        F.col("doc_id").alias("did"), _e("score", 100000).alias("score_e5")
    )


def q_corpus_stats(spark, sf_dir):
    """Engine corpus_stats table — pins the whole-collection avgdl
    semantics (zero-token docs count) in the driver gate."""
    idx = _engine_index(spark, sf_dir)
    return idx.corpus_stats.select(
        "field", "n_docs", _e("avgdl", 10**6).alias("avgdl_e6")
    )


def q_vocab_prefix(spark, sf_dir):
    return (
        _body_tokens(spark, sf_dir)
        .select("term")
        .filter(F.col("term").startswith("s"))
        .distinct()
        .orderBy("term")
    )


def q_top_words_per_doc(spark, sf_dir):
    tf = q_tf_postings(spark, sf_dir)
    w = Window.partitionBy("did").orderBy(F.desc("tf"), F.asc("term"))
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("did", "term", "tf", F.col("rn").cast("int").alias("rn"))
    )


def q_doc_sha256(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        _did().alias("did"), F.sha2(F.col("text"), 256).alias("sha")
    )


def q_pagerank_3iter(spark, sf_dir):
    from spaghettisearch_spark.operators.pagerank import pagerank_step

    d = _docs(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"))
    edges = (
        _edges(spark, sf_dir)
        .select(
            F.col("src").cast("string").alias("src_doc"),
            F.col("dst").cast("string").alias("dst_doc"),
        )
        .withColumn("outdeg", F.count("*").over(Window.partitionBy("src_doc")))
    )
    n = d.count()
    ranks = d.select("doc_id", F.lit(1.0 / n).alias("rank"))
    for _ in range(3):
        ranks = pagerank_step(ranks, edges, d, 0.75).localCheckpoint()
    return ranks.select(
        F.col("doc_id").cast("long").alias("node"), _e("rank", 10**9).alias("pr_e9")
    )


def _topics(spark, sf_dir) -> DataFrame:
    """Deterministic static category assignment (ODP-fixture analog):
    category = 'c' || doc_id % 3."""
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("c"), (F.col("doc_id") % 3).cast("string")).alias(
            "category"
        ),
    )


_CATS_SQL = """
cats AS (
  SELECT 'c' || CAST(doc_id % 3 AS VARCHAR) AS category, COUNT(*)::DOUBLE AS np
  FROM documents GROUP BY 1
)"""


def q_pagerank_topic(spark, sf_dir):
    """Topic-sensitive PageRank (reference UpdateTopicSensitivePagerank,
    ranking/pagerank.go:15-88): one vector per category over the same
    graph, init 1/numPages(category), 3 fixed iterations."""
    from spaghettisearch_spark.operators.topics import compute_topic_pagerank

    d = _docs(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"))
    links = _edges(spark, sf_dir).select(
        F.col("src").cast("string").alias("src_doc"),
        F.col("dst").cast("string").alias("dst_doc"),
    )
    pr = compute_topic_pagerank(
        spark, d, links, _topics(spark, sf_dir), max_iters=3, epsilon=0.0
    )
    return pr.select(
        F.col("doc_id").cast("long").alias("node"),
        "category",
        _e("rank", 10**9).alias("pr_e9"),
    )


def q_topic_term_stats(spark, sf_dir):
    """topic_terms — per-category term frequencies (reference inv[2]
    invTopic_PR, database.go:112; populated ODP-scraper.go:128-139)."""
    from spaghettisearch_spark.operators.topics import build_topic_tables

    toks = _body_tokens(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "term"
    )
    topic_terms, _meta = build_topic_tables(toks, _topics(spark, sf_dir))
    return topic_terms.select("term_id", "term", "category", "freq")


def q_topic_meta(spark, sf_dir):
    """topic_meta — per-category numPages/wordCount (reference forw[5]
    Topic_metadata, database.go:121; ODP-scraper.go:97-125)."""
    from spaghettisearch_spark.operators.topics import build_topic_tables

    toks = _body_tokens(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "term"
    )
    _terms, meta = build_topic_tables(toks, _topics(spark, sf_dir))
    return meta.select("category", "num_pages", "word_count")


def q_graph_family_top5(spark, sf_dir):
    """family_top5 over the synthetic deterministic graph — the
    reference's top-5 parents/children result-card fields
    (retrieval/util.go:56-92), plus the out-degree column (merged r2
    entry graph_out_degree). Lists emitted as CSV strings (the driver
    canonicalizer can't hash list cells)."""
    from spaghettisearch_spark.operators.incremental import family_top5

    links = _edges(spark, sf_dir).select(
        F.col("src").cast("string").alias("src_doc"),
        F.col("dst").cast("string").alias("dst_doc"),
        F.array().cast("array<string>").alias("anchor_terms"),
    )
    fam = family_top5(links)
    outdeg = _edges(spark, sf_dir).groupBy(
        F.col("src").cast("string").alias("doc_id")
    ).agg(F.count("*").cast("long").alias("outdeg"))
    return (
        fam.join(outdeg, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("node"),
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
            F.concat_ws(",", F.coalesce("children_top5", F.array())).alias(
                "children_csv"
            ),
            F.concat_ws(",", F.coalesce("parents_top5", F.array())).alias(
                "parents_csv"
            ),
        )
    )


def q_q1_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"),
            F.round(F.sum("l_extendedprice") * 100).cast("long").alias("sum_base_e2"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            ).cast("long").alias("sum_disc_e2"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q_q3_revenue_top10(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(seg), orders.o_custkey == seg.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            ).cast("long").alias("revenue_e2")
        )
    )
    return j.orderBy(F.desc("revenue_e2"), F.asc("l_orderkey")).limit(10)


def q_snippets(spark, sf_dir):
    """Result-card snippet extraction (reference get_metadata.go:79-209):
    first free-term match -> ±10-word window around it, else the static
    middle-21-words fallback. Arrow-batched pandas UDF; runs here over
    every doc so the driver can hash the full surface, though the
    serving path applies it to the k hydrated top-k rows only. stem=False
    mode so DuckDB can mirror the match exactly (the stemmed mode is
    golden-pair gated in test_porter2/test_api)."""
    from spaghettisearch_spark.functions.snippets import summary_udf

    d = _docs(spark, sf_dir)
    udf = summary_udf(QUERY_TERMS, [], stem=False)
    return d.select(_did().alias("did"), udf(F.col("text")).alias("snippet"))


def q_events_rollup(spark, sf_dir):
    """GROUPING SETS over events — (type), (type, day), grand total —
    with exact interpolated percentiles on every grouping-set row
    (merged r2 entry events_value_quantiles; Spark `percentile` ==
    DuckDB `quantile_cont`: both sort and linearly interpolate at
    p*(n-1), so the doubles are bit-identical). The cube/rollup family
    the reference lacks and Spark gives free."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    ev.createOrReplaceTempView("ev_rollup")
    return spark.sql(
        """
        SELECT COALESCE(event_type, '<all>') AS event_type,
               COALESCE(day, '<all>') AS day,
               COUNT(*) AS n,
               CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_e2,
               CAST(ROUND(percentile(value, 0.5) * 100000) AS BIGINT) AS p50_e5,
               CAST(ROUND(percentile(value, 0.9) * 100000) AS BIGINT) AS p90_e5,
               CAST(ROUND(percentile(value, 0.99) * 100000) AS BIGINT) AS p99_e5
        FROM ev_rollup
        GROUP BY GROUPING SETS ((event_type), (event_type, day), ())
        """
    ).select(
        "event_type", "day", F.col("n").cast("long").alias("n"),
        "sum_value_e2", "p50_e5", "p90_e5", "p99_e5",
    )


def q_events_windows(spark, sf_dir):
    """Event-time windows, tumbling (1 h) and sliding (1 h / 30 min
    slide), unioned with a ``kind`` discriminator — each event lands in
    one tumbling and exactly two sliding windows; the DuckDB mirror
    expands sliding via a UNION of the two epoch-aligned starts.
    (Merged r2 entries events_hourly + events_sliding_window.)"""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def agg(w, kind):
        return (
            ev.groupBy(w.alias("win"), "event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("value") * 100).cast("long").alias("sum_value_e2"),
            )
            .select(
                F.lit(kind).alias("kind"),
                # string output: timestamp dtypes are ambiguous across engines
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "win_start"
                ),
                "event_type",
                "n",
                "sum_value_e2",
            )
        )

    return agg(F.window("ts", "1 hour"), "tumbling").unionByName(
        agg(F.window("ts", "1 hour", "30 minutes"), "sliding")
    )


def q_events_profile(spark, sf_dir):
    """Per-type profile: exact COUNT(DISTINCT) and JSON-prop extraction
    in one aggregation (merged r2 entries events_distinct_users +
    events_json_extract; the approx_count_distinct sketch variant is
    pytest-gated against a 5% bound, since HLL implementations differ
    across engines)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("long")
    return (
        ev.select("event_type", "user_id", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) — lag/cumsum window pattern;
    streaming flavor lives in streaming/sessions.py (stateful op)."""
    from spaghettisearch_spark.streaming.sessions import sessionize_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = sessionize_batch(ev, 30)
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        F.round(F.col("sum_value") * 100).cast("long").alias("sum_value_e2"),
    )


def q_events_sessionize_stream(spark, sf_dir):
    """STREAMING sessionization: replay the events table as a file-source
    stream through the applyInPandasWithState operator and hash-match
    the BATCH oracle. One sentinel event per user beyond max_ts + gap +
    watermark closes every real session via the kernel's in-batch gap
    logic; sentinel sessions stay open and are never emitted. All files
    process in one availableNow batch — the in-batch path is
    order-independent, so the result can't depend on file mtime
    tie-breaks (the multi-batch watermark path is exercised by
    tests/test_sessions.py with controlled batch boundaries)."""
    import datetime as dt
    import tempfile
    import uuid

    from spaghettisearch_spark.streaming.sessions import sessionize_stream

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    mx = ev.agg(F.max("ts")).first()[0]
    sentinel_ts = mx + dt.timedelta(minutes=30 + 10 + 5)
    sentinels = ev.select("user_id").distinct().select(
        "user_id",
        F.lit(sentinel_ts).cast("timestamp").alias("ts"),
        F.lit(0.0).alias("value"),
    )
    tmp = tempfile.mkdtemp(prefix="sess_stream_")
    src = f"{tmp}/events"
    ev.unionByName(sentinels).repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).parquet(src)
    name = f"sess_{uuid.uuid4().hex[:10]}"
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("sessionize stream did not drain within 300s")
    shutil.rmtree(tmp, ignore_errors=True)  # memory sink holds the rows
    out = spark.table(name)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        F.round(F.col("sum_value") * 100).cast("long").alias("sum_value_e2"),
    )


def q_events_lookback_join(spark, sf_dir):
    """Interval self-join: each event paired with the same user's events
    in the 10 minutes before it (streaming/joins.interval_self_join —
    identical plan runs as a watermarked stream-stream join), aggregated
    per (type, preceding type)."""
    from spaghettisearch_spark.streaming.joins import interval_self_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = interval_self_join(ev, lookback_minutes=10)
    return pairs.groupBy("a_type", "b_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("b_value") * 100).cast("long").alias("sum_b_e2"),
    )


def q_orders_windows(spark, sf_dir):
    """Two window families in one pass over orders (merged r2 entries
    orders_rank_window + orders_above_cust_avg): per-customer top-2 by
    price via row_number, plus the correlated-subquery pattern (orders
    strictly above the customer's own average) decorrelated into
    count/sum windows — the rewrite any engine wants at scale. The
    compare is exact integer cents (cents * n > sum_cents) so no
    float-boundary flip between engines."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    wr = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wa = Window.partitionBy("o_custkey")
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", cents.alias("price_e2")
        )
        .withColumn("rn", F.row_number().over(wr).cast("int"))
        .withColumn("n", F.count("*").over(wa))
        .withColumn("s", F.sum("price_e2").over(wa))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            "price_e2",
            "rn",
            (F.col("price_e2") * F.col("n") > F.col("s"))
            .cast("int")
            .alias("above_avg"),
        )
    )


def q_dedup_exact(spark, sf_dir):
    from spaghettisearch_spark.operators.textops import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf_dir), "doc_id", "text").select(
        "content_md5", "n_dupes", F.col("keep_id").cast("long").alias("keep_id")
    )


def q_minhash_signatures(spark, sf_dir):
    from spaghettisearch_spark.operators.textops import minhash_signatures

    toks = _body_tokens(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "term"
    ).distinct()
    return minhash_signatures(toks, "id", 8).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("salt").cast("int").alias("salt"),
        "minhash",
    )


def q_lsh_candidate_pairs(spark, sf_dir):
    """Banded MinHash LSH candidates (b=4 bands x r=2 rows over 8
    minhashes) on 3-token SHINGLE signatures — shingle space is large,
    so the S-curve 1-(1-s^2)^4 actually SELECTS (candidates ≪
    all-pairs). Signatures over raw term-sets of this corpus's 24-word
    shared vocabulary are the documented degenerate case (near-all-pairs
    no matter the banding; covered in tests with the ``max_bucket``
    guard), not the headline path."""
    from spaghettisearch_spark.operators.textops import (
        lsh_candidate_pairs,
        minhash_signatures,
        token_shingles,
    )

    toks = _body_tokens(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "pos", "term"
    )
    sh = token_shingles(toks, "id", 3)
    sigs = minhash_signatures(sh.withColumnRenamed("shingle", "term"), "id", 8)
    return lsh_candidate_pairs(sigs, band_rows=2).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )


def q_simhash60(spark, sf_dir):
    from spaghettisearch_spark.operators.textops import simhash60

    tf = q_tf_postings(spark, sf_dir).select(
        F.col("did").alias("id"), "term", "tf"
    )
    # join back to numeric doc_id for stable output
    m = _docs(spark, sf_dir).select(_did().alias("id"), F.col("doc_id"))
    return (
        simhash60(tf, "id")
        .join(m, "id")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "simhash")
    )


def q_embedding_cosine_top10(spark, sf_dir):
    from spaghettisearch_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    res = cosine_topk(emb, list(qv), k=10)
    return res.select("vec_id", _e("cosine", 100000).alias("cos_e5"))


def q_embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via the SRP-bucketed SCALE
    path (multi-probe Hamming<=2 over 4 planes, exact cosine verify on
    candidates only). The DuckDB oracle is the exact all-pairs form —
    matching it demonstrates the bucketed path's recall on this corpus
    (probe coverage 11/16 of bucket space; pairs split by >2 of the 4
    planes would be missed — see operators/similarity.py recall note)."""
    from spaghettisearch_spark.operators.similarity import srp_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    pairs = srp_near_dup_pairs(
        emb, dim=dim, threshold=0.55, n_planes=4, hamming=2
    )
    return pairs.select("id_a", "id_b", _e("cos", 100000).alias("cos_e5"))


LANG_PROFILES = {
    "dataflow": ["stream", "batch", "window", "spark", "filter"],
    "relational": ["table", "join", "query", "row", "column"],
    "storage": ["scan", "key", "value", "hash", "sort"],
}


def q_lang_id(spark, sf_dir):
    from spaghettisearch_spark.operators.textops import language_id_scores

    out = language_id_scores(
        _docs(spark, sf_dir), "doc_id", "text", LANG_PROFILES
    )
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("lang"),
        _e("score", 10**6).alias("score_e6"),
    )


def q_quality_stats(spark, sf_dir):
    """Cheap pretraining-quality features + the Gopher/MassiveText-style
    repetition signals (top-token fraction, duplicate bigram/trigram
    fractions) — one driver row set for both operators."""
    from spaghettisearch_spark.operators.textops import (
        quality_stats,
        repetition_stats,
    )

    qs = quality_stats(_docs(spark, sf_dir), "doc_id", "text")
    rep = repetition_stats(_docs(spark, sf_dir), "doc_id", "text")
    return qs.join(rep, "id").select(
        F.col("id").cast("long").alias("doc_id"),
        "n_chars",
        "n_tokens",
        "n_tokens_nostop",
        _e("distinct_ratio", 10**6).alias("distinct_ratio_e6"),
        _e("mean_token_len", 10**4).alias("mean_token_len_e4"),
        _e("top_token_frac", 10**6).alias("top_token_frac_e6"),
        _e("dup_bigram_frac", 10**6).alias("dup_bigram_frac_e6"),
        _e("dup_trigram_frac", 10**6).alias("dup_trigram_frac_e6"),
    )


def q_bpe_token_count(spark, sf_dir):
    from spaghettisearch_spark.operators.textops import bpe_ish_token_count

    return bpe_ish_token_count(_docs(spark, sf_dir), "doc_id", "text").select(
        F.col("id").cast("long").alias("doc_id"), "n_bpe_tokens"
    )


def q_doc_fingerprint(spark, sf_dir):
    from spaghettisearch_spark.operators.textops import doc_fingerprint

    toks = _body_tokens(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "pos", "term"
    )
    return doc_fingerprint(toks, "id", 3).select(
        F.col("id").cast("long").alias("doc_id"), "fp_min", "fp_xor", "n_shingles"
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    from spaghettisearch_spark.operators.textops import jaccard_pairs, token_shingles

    toks = _body_tokens(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "pos", "term"
    )
    sh = token_shingles(toks, "id", 3)
    return jaccard_pairs(sh, threshold=0.2).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        _e("jaccard", 10**6).alias("jaccard_e6"),
    )


def q_lsh_jaccard_verified(spark, sf_dir):
    """Full near-dup pipeline: 3-token shingles -> MinHash(8) -> banded
    LSH (4x2) candidates -> exact jaccard verify (threshold 0.2) ONLY on
    candidates. Shingle space is large, so the S-curve actually selects
    (unlike term-set LSH on a tiny shared vocabulary)."""
    from spaghettisearch_spark.operators.textops import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        token_shingles,
    )

    toks = _body_tokens(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "pos", "term"
    )
    sh = token_shingles(toks, "id", 3)
    sigs = minhash_signatures(sh.withColumnRenamed("shingle", "term"), "id", 8)
    cands = lsh_candidate_pairs(sigs, band_rows=2)
    out = jaccard_pairs(sh, threshold=0.2, candidates=cands)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        _e("jaccard", 10**6).alias("jaccard_e6"),
    )


def q_train_val_split(spark, sf_dir):
    """Deterministic hash split (80/10/10) of the documents table —
    stable train/val/test assignment, bit-identical in DuckDB."""
    from spaghettisearch_spark.operators.textops import hash_split

    d = _docs(spark, sf_dir).select("doc_id")
    return hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


def q_dup_clusters(spark, sf_dir):
    """Dedup clustering: connected components over the verified near-dup
    pairs — (doc, cluster) with cluster = min doc id in the component
    (the canonical keep-doc). Oracle: DuckDB recursive reachability."""
    from spaghettisearch_spark.operators.graph import connected_components

    pairs = q_lsh_jaccard_verified(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


def q_train_split_dedup(spark, sf_dir):
    """End-to-end leakage-safe split: connected-component dedup clusters
    -> cluster representative (component min-id; self for singleton
    docs) -> the 80/10/10 hash split keyed on the REPRESENTATIVE, so
    near-duplicate docs can never straddle train/test
    (textops.hash_split's documented intended use)."""
    from spaghettisearch_spark.operators.graph import connected_components
    from spaghettisearch_spark.operators.textops import hash_split

    pairs = q_lsh_jaccard_verified(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )
    d = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).cast("long").alias("rep"),
        )
    )
    return hash_split(d, "rep", {"train": 0.8, "val": 0.1, "test": 0.1}).select(
        "doc_id", "rep", "split"
    )


def q_redact_pii(spark, sf_dir):
    """PII scrub gate (operators/textops.redact_pii — native
    regexp_replace/regexp_count, patterns restricted to the Java-regex
    ∩ RE2 syntax so the DuckDB mirror is bit-identical). Every doc gets
    a deterministic synthetic contact line (email, IPv4, 32-hex secret)
    appended so the redaction actually fires on this corpus; counts are
    per-pattern over the pre-redaction text."""
    from spaghettisearch_spark.operators.textops import redact_pii

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from "),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.0.1 key "),
            F.md5(F.col("text")),
        ).alias("text"),
    )
    out = redact_pii(d, "doc_id", "text")
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        "redacted",
        "n_email",
        "n_ipv4",
        "n_hex_secret",
    )


def q_dedup_stream(spark, sf_dir):
    """STREAMING effectively-once guard: replay the events table as a
    file-source stream WITH redelivered duplicates (every 7th user's
    rows appear twice, i.e. within the watermark horizon) through
    ``dropDuplicatesWithinWatermark`` and hash-match the DuckDB
    DISTINCT of the original table. Output is the key columns only, so
    the arbitrary which-copy-survives choice can't leak into the hash;
    (user_id, event_type, second-formatted ts) is verified unique on
    this corpus, so formatting can't collapse distinct keys."""
    import tempfile
    import uuid

    from spaghettisearch_spark.streaming.ingest import dedup_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    redelivered = ev.filter(F.col("user_id") % 7 == 0)
    tmp = tempfile.mkdtemp(prefix="dedup_stream_")
    src = f"{tmp}/events"
    ev.unionByName(redelivered).repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "user_id bigint, event_type string, ts timestamp"
    ).parquet(src)
    deduped = dedup_stream(
        stream, ["user_id", "event_type", "ts"], watermark="30 minutes"
    )
    name = f"dedup_{uuid.uuid4().hex[:10]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("dedup stream did not drain within 300s")
    shutil.rmtree(tmp, ignore_errors=True)  # memory sink holds the rows
    return spark.table(name).select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )


# --- rows-only entries (no SQL oracle; driver records weaker check) ------

def q_porter2_stem_vocab(spark, sf_dir):
    from spaghettisearch_spark.functions.stem_udf import stem_word_udf

    vocab = _body_tokens(spark, sf_dir).select("term").distinct()
    return vocab.select("term", stem_word_udf("term").alias("stem")).orderBy("term")


def q_ann_srp_top10(spark, sf_dir):
    from spaghettisearch_spark.operators.similarity import ann_topk_bucketed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 1).select("embedding").first()[0]
    res = ann_topk_bucketed(
        emb, list(qv), dim=len(qv), k=10, n_planes=6, hamming=1
    )
    return res.select("vec_id", _e("cosine", 100000).alias("cos_e5"))


def q_ann_ivf_top10(spark, sf_dir):
    """IVF-style ANN (coarse quantize -> probe nearest cells -> exact
    cosine inside). Approximate by design -> rows-only."""
    from spaghettisearch_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 2).select("embedding").first()[0]
    res = ivf_topk(emb, list(qv), k=10, n_cells=8, n_probe=2)
    return res.select("vec_id", _e("cosine", 100000).alias("cos_e5"))


def q_fixture_flagship(spark, sf_dir):
    """Full engine semantics (stemming + phrase + field weights + anchor
    credit + PageRank blend) on the self-generated fixture corpus —
    covered by the pytest pandas-oracle; rows-only here."""
    from spaghettisearch_spark.fixtures import make_documents
    from spaghettisearch_spark.operators.bm25 import search
    from spaghettisearch_spark.operators.index_build import build_index
    from spaghettisearch_spark.operators.links import extract_links
    from spaghettisearch_spark.operators.pagerank import compute_pagerank
    from spaghettisearch_spark.sources.corpus import ingest

    corpus = ingest(spark.createDataFrame(make_documents(200))).cache()
    links = extract_links(corpus).cache()
    idx = build_index(corpus, links=links)
    pr = compute_pagerank(spark, corpus, links)
    res = search(spark, idx, '"hash table" parse', pagerank=pr, k=20, hydrate=True)
    # driver canonicalizer sorts row values — project the map column
    # through to_json and scale floats so every column is hashable+stable
    return res.select(
        "doc_id",
        "repo",
        "path",
        "page_size",
        _e("score", 10**5).alias("score_e5"),
        _e("title_rank", 10**5).alias("title_e5"),
        _e("body_rank", 10**5).alias("body_e5"),
        _e("pagerank", 10**9).alias("pr_e9"),
        F.to_json("top_words").alias("top_words_json"),
    )


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 multi-term top-k over sf0.001 documents via the
    engine index (tokenize -> postings -> stats -> broadcast-join scoring
    -> deterministic top-k)."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the driver records the first 50, so every
    entry gets a driver-visible row (round 2 had 53 and the last three,
    including the flagship, were silently dropped). Six r2 entry pairs
    are merged, semantics preserved: events_hourly+events_sliding_window
    -> events_windows; events_distinct_users+events_json_extract ->
    events_profile; events_value_quantiles folded into events_rollup;
    orders_rank_window+orders_above_cust_avg -> orders_windows;
    graph_out_degree folded into graph_family_top5. Rows-only entries
    sit mid-list so a lower cap would still report them. Round 5
    rotated the low-value relational region_rollup (merged r2
    customers_without_orders+region_supplier_counts; anti-join coverage
    remains via train_split_dedup and the merge tombstone path) for
    stats_refresh_topk, putting the compaction family under the hash
    gate."""
    return {
        "tf_postings": q_tf_postings,
        "doc_frequency": q_doc_frequency,
        "doc_lengths": q_doc_lengths,
        "tfidf_weights": q_tfidf_weights,
        "bm25_topk": q_bm25_topk,
        "wand_topk": q_wand_topk,
        "wand_topk_shards": q_wand_topk_shards,
        "phrase_topk": q_phrase_topk,
        "phrase_topk_shards": q_phrase_topk_shards,
        # rows-only (non-SQL-expressible) entries — early, not last
        "fixture_flagship": q_fixture_flagship,
        "ann_srp_top10": q_ann_srp_top10,
        "ann_ivf_top10": q_ann_ivf_top10,
        "porter2_stem_vocab": q_porter2_stem_vocab,
        "vocab_prefix": q_vocab_prefix,
        "corpus_stats": q_corpus_stats,
        "top_words_per_doc": q_top_words_per_doc,
        "doc_sha256": q_doc_sha256,
        "graph_family_top5": q_graph_family_top5,
        "pagerank_3iter": q_pagerank_3iter,
        "pagerank_topic": q_pagerank_topic,
        "topic_term_stats": q_topic_term_stats,
        "topic_meta": q_topic_meta,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_revenue_top10": q_q3_revenue_top10,
        "snippets": q_snippets,
        "stats_refresh_topk": q_stats_refresh_topk,
        "events_rollup": q_events_rollup,
        "events_profile": q_events_profile,
        "events_windows": q_events_windows,
        "events_lookback_join": q_events_lookback_join,
        "events_sessionize": q_events_sessionize,
        "events_sessionize_stream": q_events_sessionize_stream,
        "dedup_stream": q_dedup_stream,
        "orders_windows": q_orders_windows,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidate_pairs": q_lsh_candidate_pairs,
        "lsh_jaccard_verified": q_lsh_jaccard_verified,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "dup_clusters": q_dup_clusters,
        "train_val_split": q_train_val_split,
        "train_split_dedup": q_train_split_dedup,
        "simhash60": q_simhash60,
        "embedding_cosine_top10": q_embedding_cosine_top10,
        "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
        "lang_id": q_lang_id,
        "quality_stats": q_quality_stats,
        "bpe_token_count": q_bpe_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "redact_pii": q_redact_pii,
    }


def oracle_sql() -> dict[str, str]:
    h60 = term_hash60_sql  # shorthand
    n_docs_sub = "(SELECT COUNT(*) FROM documents)"
    sqls: dict[str, str] = {}

    sqls["tf_postings"] = f"""
WITH {_TOKS}
SELECT did, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY did, term
"""
    sqls["doc_frequency"] = f"""
WITH {_TOKS}, tf AS (SELECT did, term FROM toks GROUP BY did, term)
SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
"""
    sqls["doc_lengths"] = f"""
WITH {_TL}
SELECT did, len(toks)::BIGINT AS dl FROM tl
"""
    sqls["tfidf_weights"] = f"""
WITH {_TOKS},
tf AS (SELECT did, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY did, term),
mx AS (SELECT did, MAX(tf)::DOUBLE AS max_tf FROM tf GROUP BY did),
df AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term)
SELECT tf.did, tf.term,
       CAST(ROUND((tf.tf / mx.max_tf) * log2({n_docs_sub}::DOUBLE / df.df) * 1e6) AS BIGINT) AS w_e6
FROM tf JOIN mx USING (did) JOIN df USING (term)
"""
    sqls["bm25_topk"] = _bm25_sql(QUERY_TERMS, 20)
    sqls["wand_topk"] = _bm25_sql(QUERY_TERMS, 20)
    sqls["wand_topk_shards"] = _bm25_sql(QUERY_TERMS, 20)
    # refresh-from-tfidf must land on the SAME BM25 truth as a clean build
    sqls["stats_refresh_topk"] = _bm25_sql(QUERY_TERMS, 20)
    t1, t2 = PHRASE
    sqls["phrase_topk"] = f"""
WITH {_TOKS},
tf AS (SELECT did, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY did, term),
dl AS (SELECT did, len(toks)::BIGINT AS dl FROM tl),
stats AS (
  SELECT {n_docs_sub}::DOUBLE AS n_docs, (SELECT AVG(len(toks)) FROM tl) AS avgdl
),
df AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
pdocs AS (
  SELECT DISTINCT a.did
  FROM toks a JOIN toks b ON a.did = b.did AND b.pos = a.pos + 1
  WHERE a.term = '{t1}' AND b.term = '{t2}'
),
hits AS (
  SELECT tf.did,
         ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) AS contrib
  FROM tf JOIN df USING (term) JOIN dl USING (did) CROSS JOIN stats s
  WHERE tf.term IN ('{t1}', '{t2}') AND tf.did IN (SELECT did FROM pdocs)
),
scored AS (SELECT did, SUM(contrib) * {BODY_W} AS score FROM hits GROUP BY did)
SELECT did, CAST(ROUND(score * 100000) AS BIGINT) AS score_e5
FROM scored ORDER BY score DESC, did ASC LIMIT 20
"""
    sqls["phrase_topk_shards"] = sqls["phrase_topk"]
    sqls["corpus_stats"] = f"""
WITH {_TL},
ttl AS (
  SELECT len(list_filter(
           string_split(trim(regexp_replace(lower(CAST(doc_id AS VARCHAR)),
                                            '[^a-z0-9]+', ' ', 'g')), ' '),
           t -> t <> '' AND t NOT IN ({_SW_SQL}))) AS tlen
  FROM documents
)
SELECT 'body' AS field, COUNT(*)::BIGINT AS n_docs,
       CAST(ROUND(SUM(len(toks))::DOUBLE / COUNT(*) * 1e6) AS BIGINT) AS avgdl_e6
FROM tl
UNION ALL
SELECT 'title', COUNT(*)::BIGINT,
       CAST(ROUND(SUM(tlen)::DOUBLE / COUNT(*) * 1e6) AS BIGINT)
FROM ttl
"""
    sqls["vocab_prefix"] = f"""
WITH {_TOKS}
SELECT DISTINCT term FROM toks WHERE term LIKE 's%' ORDER BY term
"""
    sqls["top_words_per_doc"] = f"""
WITH {_TOKS},
tf AS (SELECT did, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY did, term),
r AS (
  SELECT did, term, tf,
         ROW_NUMBER() OVER (PARTITION BY did ORDER BY tf DESC, term ASC) AS rn
  FROM tf
)
SELECT did, term, tf, rn::INT AS rn FROM r WHERE rn <= 3
"""
    sqls["doc_sha256"] = """
SELECT md5(source || '/' || CAST(doc_id AS VARCHAR)) AS did, sha256(text) AS sha
FROM documents
"""
    sqls["graph_family_top5"] = f"""
WITH {_EDGES_SQL},
se AS (SELECT CAST(src AS VARCHAR) AS s, CAST(dst AS VARCHAR) AS d, src, dst FROM edges),
ch AS (
  SELECT src AS node,
         array_to_string(list_sort(list(DISTINCT d))[1:5], ',') AS children_csv
  FROM se GROUP BY src
),
pa AS (
  SELECT dst AS node,
         array_to_string(list_sort(list(DISTINCT s))[1:5], ',') AS parents_csv
  FROM se GROUP BY dst
),
od AS (SELECT src AS node, COUNT(*)::BIGINT AS outdeg FROM edges GROUP BY src)
SELECT COALESCE(ch.node, pa.node)::BIGINT AS node,
       COALESCE(od.outdeg, 0)::BIGINT AS outdeg,
       COALESCE(children_csv, '') AS children_csv,
       COALESCE(parents_csv, '') AS parents_csv
FROM ch FULL OUTER JOIN pa ON ch.node = pa.node
LEFT JOIN od ON od.node = COALESCE(ch.node, pa.node)
"""
    sqls["pagerank_3iter"] = f"""
WITH {_EDGES_SQL},
outd AS (SELECT src, COUNT(*)::DOUBLE AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT doc_id AS node FROM documents),
r0 AS (SELECT node, 1.0 / {n_docs_sub} AS r FROM nodes),
i1 AS (
  SELECT e.dst AS node, SUM(0.75 * r0.r / o.outdeg) AS inh
  FROM edges e JOIN r0 ON r0.node = e.src JOIN outd o ON o.src = e.src GROUP BY e.dst
),
raw1 AS (SELECT n.node, COALESCE(i1.inh, 0) + 0.25 AS raw FROM nodes n LEFT JOIN i1 USING (node)),
r1 AS (SELECT node, raw / (SELECT SUM(raw) FROM raw1) AS r FROM raw1),
i2 AS (
  SELECT e.dst AS node, SUM(0.75 * r1.r / o.outdeg) AS inh
  FROM edges e JOIN r1 ON r1.node = e.src JOIN outd o ON o.src = e.src GROUP BY e.dst
),
raw2 AS (SELECT n.node, COALESCE(i2.inh, 0) + 0.25 AS raw FROM nodes n LEFT JOIN i2 USING (node)),
r2 AS (SELECT node, raw / (SELECT SUM(raw) FROM raw2) AS r FROM raw2),
i3 AS (
  SELECT e.dst AS node, SUM(0.75 * r2.r / o.outdeg) AS inh
  FROM edges e JOIN r2 ON r2.node = e.src JOIN outd o ON o.src = e.src GROUP BY e.dst
),
raw3 AS (SELECT n.node, COALESCE(i3.inh, 0) + 0.25 AS raw FROM nodes n LEFT JOIN i3 USING (node)),
r3 AS (SELECT node, raw / (SELECT SUM(raw) FROM raw3) AS r FROM raw3)
SELECT node, CAST(ROUND(r * 1000000000) AS BIGINT) AS pr_e9 FROM r3
"""
    topic_iters = []
    for i in range(1, 4):
        p = f"r{i - 1}"
        topic_iters.append(f"""
i{i} AS (
  SELECT e.dst AS node, {p}.category, SUM(0.75 * {p}.r / o.outdeg) AS inh
  FROM edges e JOIN {p} ON {p}.node = e.src JOIN outd o ON o.src = e.src
  GROUP BY e.dst, {p}.category
),
raw{i} AS (
  SELECT r0.node, r0.category, COALESCE(i{i}.inh, 0) + 0.25 AS raw
  FROM r0 LEFT JOIN i{i} ON i{i}.node = r0.node AND i{i}.category = r0.category
),
t{i} AS (SELECT category, SUM(raw) AS t FROM raw{i} GROUP BY category),
r{i} AS (
  SELECT node, raw{i}.category, raw / t{i}.t AS r
  FROM raw{i} JOIN t{i} ON t{i}.category = raw{i}.category
)""")
    sqls["pagerank_topic"] = f"""
WITH {_EDGES_SQL},
outd AS (SELECT src, COUNT(*)::DOUBLE AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT doc_id AS node FROM documents),
{_CATS_SQL},
r0 AS (SELECT n.node, c.category, 1.0 / c.np AS r FROM nodes n CROSS JOIN cats c),
{",".join(topic_iters)}
SELECT node, category, CAST(ROUND(r * 1000000000) AS BIGINT) AS pr_e9 FROM r3
"""
    sqls["topic_term_stats"] = f"""
WITH {_TOKS}
SELECT md5(term) AS term_id, term,
       'c' || CAST(doc_id % 3 AS VARCHAR) AS category,
       COUNT(*)::BIGINT AS freq
FROM toks GROUP BY term, 3
"""
    sqls["topic_meta"] = f"""
WITH {_TOKS},
np AS (
  SELECT 'c' || CAST(doc_id % 3 AS VARCHAR) AS category,
         COUNT(*)::BIGINT AS num_pages
  FROM documents GROUP BY 1
),
wc AS (
  SELECT 'c' || CAST(doc_id % 3 AS VARCHAR) AS category,
         COUNT(*)::BIGINT AS word_count
  FROM toks GROUP BY 1
)
SELECT np.category, num_pages, COALESCE(word_count, 0)::BIGINT AS word_count
FROM np LEFT JOIN wc ON wc.category = np.category
"""
    sqls["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_e2,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_e2,
       COUNT(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
    sqls["q3_revenue_top10"] = """
SELECT l_orderkey,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_e2
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue_e2 DESC, l_orderkey ASC
LIMIT 10
"""
    snippet_terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    # RE2's \\s is ASCII-only while the Spark UDF's str.split() breaks on
    # Unicode whitespace (incl. NBSP and the \\x1c-\\x1f separators) —
    # normalize every such codepoint to a plain space BEFORE the split so
    # both sides see identical token boundaries on any corpus
    # \x0b (vertical tab) included: Python str.split() breaks on it but
    # RE2's \s ([\t\n\f\r ]) does not — verified against DuckDB
    _uws = (
        "[\\x0b\\x1c-\\x1f\\x{0085}\\x{00a0}\\x{1680}\\x{2000}-\\x{200a}"
        "\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]"
    )
    sqls["snippets"] = f"""
WITH w AS (
  SELECT md5(source || '/' || CAST(doc_id AS VARCHAR)) AS did,
         list_filter(
           regexp_split_to_array(
             regexp_replace(text, '{_uws}', ' ', 'g'), '\\s+'),
           x -> x <> '') AS words
  FROM documents
),
n AS (
  SELECT did, words, len(words) AS L,
         [regexp_replace(lower(x), '[^a-z0-9]', '', 'g') FOR x IN words] AS norm
  FROM w
),
m AS (
  SELECT did, words, L,
         [i FOR i IN generate_series(1, L) IF norm[i] IN ({snippet_terms})][1] AS idx
  FROM n
)
SELECT did,
  CASE WHEN L = 0 THEN ''
       WHEN idx IS NOT NULL THEN array_to_string(words[greatest(idx-10,1):least(idx+10,L)], ' ')
       ELSE array_to_string(words[greatest((L//2)-10,0)+1:least(greatest((L//2)-10,0)+21, L)], ' ')
  END AS snippet
FROM m
"""
    sqls["events_rollup"] = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(day, '<all>') AS day,
       COUNT(*)::BIGINT AS n,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_e2,
       CAST(ROUND(quantile_cont(value, 0.5) * 100000) AS BIGINT) AS p50_e5,
       CAST(ROUND(quantile_cont(value, 0.9) * 100000) AS BIGINT) AS p90_e5,
       CAST(ROUND(quantile_cont(value, 0.99) * 100000) AS BIGINT) AS p99_e5
FROM (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
  FROM events
)
GROUP BY GROUPING SETS ((event_type), (event_type, day), ())
"""
    sqls["events_windows"] = """
WITH starts AS (
  SELECT event_type, value,
         date_trunc('hour', ts) AS h1,
         make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000) AS s1
  FROM events
),
expanded AS (
  SELECT 'tumbling' AS kind, event_type, value, h1 AS win_start FROM starts
  UNION ALL
  SELECT 'sliding', event_type, value, s1 FROM starts
  UNION ALL
  SELECT 'sliding', event_type, value, s1 - INTERVAL 30 MINUTE FROM starts
)
SELECT kind, strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
       COUNT(*)::BIGINT AS n,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_e2
FROM expanded GROUP BY 1, 2, 3
"""
    sqls["events_profile"] = r"""
SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_users,
       COUNT(*)::BIGINT AS n_events,
       SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))::BIGINT AS sum_k,
       MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))::BIGINT AS max_k
FROM events GROUP BY event_type
"""
    sqls["dedup_stream"] = """
SELECT DISTINCT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
FROM events
"""
    sqls["events_sessionize"] = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0
         END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*)::BIGINT AS n_events,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_e2
FROM sessions GROUP BY user_id, session_id
"""
    sqls["events_sessionize_stream"] = sqls["events_sessionize"]
    sqls["events_lookback_join"] = """
SELECT a.event_type AS a_type, b.event_type AS b_type,
       COUNT(*)::BIGINT AS n,
       CAST(ROUND(SUM(b.value) * 100) AS BIGINT) AS sum_b_e2
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts < a.ts
 AND b.ts >= a.ts - INTERVAL 10 MINUTE
GROUP BY 1, 2
"""
    sqls["orders_windows"] = """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_e2,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey) AS s
  FROM orders
)
SELECT o_custkey, o_orderkey, price_e2, rn::INT AS rn,
       (CASE WHEN price_e2 * n > s THEN 1 ELSE 0 END)::INT AS above_avg
FROM r WHERE rn <= 2
"""
    sqls["train_val_split"] = f"""
SELECT doc_id,
       CASE WHEN {h60("CAST(doc_id AS VARCHAR)", "split:")} % 10000 < 8000 THEN 'train'
            WHEN {h60("CAST(doc_id AS VARCHAR)", "split:")} % 10000 < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""
    sqls["dedup_exact"] = """
SELECT md5(text) AS content_md5, COUNT(*)::BIGINT AS n_dupes,
       MIN(doc_id)::BIGINT AS keep_id
FROM documents GROUP BY md5(text)
"""
    minhash_parts = "\nUNION ALL\n".join(
        f"SELECT doc_id, {s} AS salt, MIN({h60('term', f's{s}:')}) AS minhash "
        f"FROM dtf GROUP BY doc_id"
        for s in range(8)
    )
    sqls["minhash_signatures"] = f"""
WITH {_TOKS},
dtf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term)
SELECT doc_id::BIGINT AS doc_id, salt::INT AS salt, minhash FROM ({minhash_parts})
"""
    sqls["simhash60"] = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN ({h60('term')} >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(60)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id::BIGINT AS doc_id,
       SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""
    sqls["embedding_cosine_top10"] = """
SELECT vec_id,
       CAST(ROUND(list_cosine_similarity(
         embedding::DOUBLE[],
         (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]
       ) * 100000) AS BIGINT) AS cos_e5
FROM embeddings
ORDER BY list_cosine_similarity(
  embedding::DOUBLE[],
  (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]) DESC, vec_id ASC
LIMIT 10
"""
    sqls["embedding_near_dup_pairs"] = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 100000) AS BIGINT) AS cos_e5
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.55
"""
    lang_score_parts = "\nUNION ALL\n".join(
        "SELECT doc_id, '{lang}' AS lang, "
        "len(list_intersect(dtoks, [{markers}]))::DOUBLE / {n} AS score FROM rawt".format(
            lang=lang,
            markers=",".join(f"'{m}'" for m in markers),
            n=float(len(markers)),
        )
        for lang, markers in sorted(LANG_PROFILES.items())
    )
    sqls["lang_id"] = f"""
WITH rawt AS (
  SELECT doc_id,
         list_distinct(list_filter(
           string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
           t -> t <> '')) AS dtoks
  FROM documents
),
scored AS ({lang_score_parts}),
ranked AS (
  SELECT doc_id, lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM scored
)
SELECT doc_id::BIGINT AS doc_id, lang,
       CAST(ROUND(score * 1000000) AS BIGINT) AS score_e6
FROM ranked WHERE rn = 1
"""
    sqls["quality_stats"] = f"""
WITH raw AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS rt,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '' AND t NOT IN ({_SW_SQL})) AS ft
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id, n_chars,
       len(rt)::BIGINT AS n_tokens,
       len(ft)::BIGINT AS n_tokens_nostop,
       CAST(ROUND(len(list_distinct(rt))::DOUBLE / GREATEST(len(rt), 1) * 1e6) AS BIGINT) AS distinct_ratio_e6,
       CAST(ROUND(list_sum(list_transform(rt, t -> length(t)))::DOUBLE / GREATEST(len(rt), 1) * 1e4) AS BIGINT) AS mean_token_len_e4,
       CAST(ROUND(CASE WHEN len(rt) = 0 THEN 0.0 ELSE
         list_max(list_transform(list_distinct(rt),
                                 t -> len(list_filter(rt, x -> x = t))))::DOUBLE
           / len(rt) END * 1e6) AS BIGINT) AS top_token_frac_e6,
       CAST(ROUND(CASE WHEN len(rt) <= 1 THEN 0.0 ELSE
         1.0 - len(list_distinct(list_transform(range(1, len(rt)),
                     i -> rt[i] || ' ' || rt[i+1])))::DOUBLE
           / (len(rt) - 1) END * 1e6) AS BIGINT) AS dup_bigram_frac_e6,
       CAST(ROUND(CASE WHEN len(rt) <= 2 THEN 0.0 ELSE
         1.0 - len(list_distinct(list_transform(range(1, len(rt) - 1),
                     i -> rt[i] || ' ' || rt[i+1] || ' ' || rt[i+2])))::DOUBLE
           / (len(rt) - 2) END * 1e6) AS BIGINT) AS dup_trigram_frac_e6
FROM raw
"""
    sqls["bpe_token_count"] = r"""
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(text, '\w+|[^\w\s]'))::BIGINT AS n_bpe_tokens
FROM documents
"""
    sqls["doc_fingerprint"] = f"""
WITH {_TL},
sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM tl CROSS JOIN (SELECT unnest(range(1, 100000)) AS i)
  WHERE i + 2 <= len(toks)
),
h AS (SELECT doc_id, {h60('shingle')} AS h FROM sh)
SELECT doc_id::BIGINT AS doc_id, MIN(h) AS fp_min, bit_xor(h) AS fp_xor,
       COUNT(*)::BIGINT AS n_shingles
FROM h GROUP BY doc_id
"""
    sqls["ngram_jaccard_pairs"] = f"""
WITH {_TL},
sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM tl CROSS JOIN (SELECT unnest(range(1, 100000)) AS i)
  WHERE i + 2 <= len(toks)
),
sizes AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       CAST(ROUND(n_inter::DOUBLE / (sa.n + sb.n - n_inter) * 1e6) AS BIGINT) AS jaccard_e6
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_inter::DOUBLE / (sa.n + sb.n - n_inter) >= 0.2
"""
    shingle_minhash_parts = "\nUNION ALL\n".join(
        f"SELECT doc_id, {s} AS salt, MIN({h60('shingle', f's{s}:')}) AS minhash "
        f"FROM sh GROUP BY doc_id"
        for s in range(8)
    )
    shingle_cand_ctes = f"""{_TL},
sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM tl CROSS JOIN (SELECT unnest(range(1, 100000)) AS i)
  WHERE i + 2 <= len(toks)
),
sigs AS (SELECT doc_id, salt, minhash FROM ({shingle_minhash_parts}) ),
bands AS (
  SELECT doc_id, CAST(salt // 2 AS INT) AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY salt) AS band_sig
  FROM sigs GROUP BY doc_id, CAST(salt // 2 AS INT)
),
bk AS (SELECT doc_id, band, {h60('band_sig')} AS bucket FROM bands),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
)"""
    sqls["lsh_candidate_pairs"] = f"""
WITH {shingle_cand_ctes}
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b FROM cand
"""
    shingle_pair_ctes = shingle_cand_ctes + f""",
sizes AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
vpairs AS (
  SELECT i.id_a, i.id_b,
         n_inter::DOUBLE / (sa.n + sb.n - n_inter) AS jaccard
  FROM inter i
  JOIN cand c ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE n_inter::DOUBLE / (sa.n + sb.n - n_inter) >= 0.2
)"""
    sqls["lsh_jaccard_verified"] = f"""
WITH {shingle_pair_ctes}
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       CAST(ROUND(jaccard * 1e6) AS BIGINT) AS jaccard_e6
FROM vpairs
"""
    sqls["dup_clusters"] = f"""
WITH RECURSIVE {shingle_pair_ctes},
und AS (
  SELECT id_a AS s, id_b AS d FROM vpairs
  UNION
  SELECT id_b AS s, id_a AS d FROM vpairs
),
cnodes AS (SELECT DISTINCT s AS id FROM und),
reach(id, root) AS (
  SELECT id, id FROM cnodes
  UNION
  SELECT u.d, r.root FROM reach r JOIN und u ON u.s = r.id
)
SELECT id::BIGINT AS doc_id, MIN(root)::BIGINT AS component
FROM reach GROUP BY id
"""
    rep = "COALESCE(comp.component, d.doc_id)"
    rep_h = h60(f"CAST({rep} AS VARCHAR)", "split:")
    sqls["train_split_dedup"] = f"""
WITH RECURSIVE {shingle_pair_ctes},
und AS (
  SELECT id_a AS s, id_b AS d FROM vpairs
  UNION
  SELECT id_b AS s, id_a AS d FROM vpairs
),
cnodes AS (SELECT DISTINCT s AS id FROM und),
reach(id, root) AS (
  SELECT id, id FROM cnodes
  UNION
  SELECT u.d, r.root FROM reach r JOIN und u ON u.s = r.id
),
comp AS (SELECT id AS doc_id, MIN(root) AS component FROM reach GROUP BY id)
SELECT d.doc_id, {rep}::BIGINT AS rep,
       CASE WHEN {rep_h} % 10000 < 8000 THEN 'train'
            WHEN {rep_h} % 10000 < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
"""
    pii_email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    pii_ip = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
    pii_hex = r"\b[0-9a-fA-F]{32,}\b"
    sqls["redact_pii"] = f"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from '
              || CAST(doc_id % 256 AS VARCHAR) || '.0.0.1 key ' || md5(text) AS text
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{pii_email}', '<EMAIL>', 'g'),
         '{pii_ip}', '<IP>', 'g'),
         '{pii_hex}', '<SECRET>', 'g') AS redacted,
       len(regexp_extract_all(text, '{pii_email}'))::BIGINT AS n_email,
       len(regexp_extract_all(text, '{pii_ip}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(text, '{pii_hex}'))::BIGINT AS n_hex_secret
FROM d
"""
    return sqls
