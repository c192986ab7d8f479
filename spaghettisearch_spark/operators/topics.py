"""Topic-sensitive PageRank + topic tables — the reference's per-ODP-
category feature cluster, static-fixture shaped.

Reference semantics (/root/reference/ranking/pagerank.go:15-88
UpdateTopicSensitivePagerank): for EVERY category it runs updatePagerank
over the SAME full link graph; the only per-category input is
numPages(category), used for the uniform init 1/n (pagerank.go:100-108).
The per-doc artifact is map[category]float64 (written via BatchSet,
pagerank.go:66-82 into forw[3] DocHash_rank, database/database.go:119).
Because normalization happens every iteration, the init scale is a
transient — categories' vectors differ early and converge toward the
same fixed point, exactly as the reference's do.

Spark shape: category is ONE MORE KEY COLUMN of the ranks frame, so all
categories power-iterate together — per iteration one join+agg shuffle
regardless of |categories| (the reference loops categories serially,
pagerank.go:55-62). Per-category normalization totals and L1 deltas come
from a single tiny groupBy(category) action per iteration.

Topic tables (static-fixture analog of the ODP scrape tables the
reference populates in crawler/ODP-scraper.go:97-139):
    topic_terms(term_id, term, category, freq)    inv[2] invTopic_PR
                                                  (database.go:112)
    topic_meta(category, num_pages, word_count)   forw[5] Topic_metadata
                                                  (database.go:121)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import term_id_col
from .pagerank import _dedup_edges, pagerank_nodes


def build_topic_tables(
    tokens: DataFrame, topics: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """tokens(doc_id, field, pos, term) x topics(doc_id, category) ->
    (topic_terms, topic_meta). Per-category term frequencies aggregate
    with map-side combine; num_pages counts member docs, word_count the
    total token volume (reference ODP-scraper.go:100-139 keeps exactly
    these: per-topic word freq map + numPages/wordCount)."""
    t = tokens.join(topics, "doc_id")
    topic_terms = (
        t.groupBy("category", "term")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(term_id_col("term").alias("term_id"), "term", "category", "freq")
    )
    pages = topics.groupBy("category").agg(
        F.count_distinct("doc_id").cast("long").alias("num_pages")
    )
    words = t.groupBy("category").agg(
        F.count("*").cast("long").alias("word_count")
    )
    topic_meta = pages.join(words, "category", "left").select(
        "category",
        "num_pages",
        F.coalesce("word_count", F.lit(0).cast("long")).alias("word_count"),
    )
    return topic_terms, topic_meta


def compute_topic_pagerank(
    spark: SparkSession,
    corpus: DataFrame,
    links: DataFrame,
    topics: DataFrame,
    cfg: EngineConfig = DEFAULT,
    max_iters: int | None = None,
    epsilon: float | None = None,
) -> DataFrame:
    """-> (doc_id, category, rank): one PageRank vector per category over
    the full graph, init 1/numPages(category) (reference-exact, see
    module docstring). One join+agg shuffle and ONE driver action per
    iteration (per-category totals + L1 deltas in a single tiny
    groupBy(category) aggregate; delta checked one iteration behind,
    same contract as compute_pagerank). Stops when EVERY category's
    delta < epsilon."""
    damping = cfg.damping
    epsilon = cfg.pr_epsilon if epsilon is None else epsilon
    max_iters = cfg.pr_max_iters if max_iters is None else max_iters

    nodes = pagerank_nodes(corpus, links).repartition("doc_id").cache()
    if nodes.isEmpty():
        return spark.createDataFrame([], "doc_id string, category string, rank double")
    edges = _dedup_edges(links).repartition("src_doc").cache()
    edges.count()

    num_pages = topics.groupBy("category").agg(
        F.count_distinct("doc_id").alias("np")
    )
    cats = F.broadcast(
        num_pages.select("category", (F.lit(1.0) / F.col("np")).alias("r0"))
    )
    # full node set x categories: every node starts at 1/numPages(cat)
    ranks = nodes.crossJoin(cats).select(
        "doc_id", "category", F.col("r0").alias("rank")
    ).localCheckpoint()
    prev = None

    for it in range(max_iters):
        contribs = (
            ranks.join(edges, ranks["doc_id"] == edges["src_doc"])
            .select(
                F.col("dst_doc").alias("doc_id"),
                "category",
                (F.lit(damping) * F.col("rank") / F.col("outdeg")).alias("contrib"),
            )
            .groupBy("doc_id", "category")
            .agg(F.sum("contrib").alias("inherited"))
        )
        raw = (
            ranks.withColumnRenamed("rank", "cur")
            .join(contribs, ["doc_id", "category"], "left")
            .select(
                "doc_id",
                "category",
                (
                    F.coalesce(F.col("inherited"), F.lit(0.0))
                    + F.lit(1.0 - damping)
                ).alias("raw_rank"),
                "cur",
            )
        )
        if prev is not None:
            raw = raw.join(
                prev.withColumnRenamed("rank", "prevr"),
                ["doc_id", "category"],
                "left",
            )
            stats = raw.groupBy("category").agg(
                F.sum("raw_rank").alias("t"),
                F.sum(F.abs(F.col("cur") - F.coalesce("prevr", F.lit(0.0)))).alias(
                    "d"
                ),
            ).collect()
            if all(r["d"] is not None and r["d"] < epsilon for r in stats):
                break
        else:
            stats = raw.groupBy("category").agg(
                F.sum("raw_rank").alias("t")
            ).collect()
        totals = F.broadcast(
            spark.createDataFrame(
                [(r["category"], float(r["t"])) for r in stats],
                "category string, t double",
            )
        )
        new_ranks = raw.join(totals, "category").select(
            "doc_id", "category", (F.col("raw_rank") / F.col("t")).alias("rank")
        )
        if (it + 1) % cfg.pr_checkpoint_every == 0 or it == max_iters - 1:
            new_ranks = new_ranks.localCheckpoint()
        prev, ranks = ranks, new_ranks

    nodes.unpersist()
    edges.unpersist()
    return ranks
