"""PageRank over the document link graph — iterative DataFrame joins
with checkpointed lineage.

Reference semantics (/root/reference/ranking/pagerank.go):
  - node set = union of sources and targets, including dangling targets
    (pagerank.go:24-44 unions table keys with every child list)
  - init rank = 1/n (pagerank.go:97-101)
  - contribution pass: rank[child] += d * rank[parent]/outdeg(parent)
    (computeRankInherited, pagerank.go:126-145)
  - normalize (rank + (1-d)) / total, where total = sum over nodes of
    (rank + (1-d)) (updatePagerank, pagerank.go:111-117)
  - iterate until L1 delta < eps (pagerank.go:115-119; reference eps
    1e-20 with damping 0.75 from cmd/crawl/start_crawl.go:175)

Spark shape: ranks ⋈ edges on src -> groupBy(dst).sum -> normalize.
Each iteration is one shuffle; ``localCheckpoint`` every
``pr_checkpoint_every`` iterations truncates the logical plan (without
it the lineage doubles per iteration and Catalyst analysis time blows
up long before data does). At cluster scale swap localCheckpoint for
reliable ``checkpoint()`` on HDFS/object storage — the loop is
structured so that is a one-line change; resumability across restarts
comes from the build pipeline persisting ranks parquet per stage.

Nodes with no outlinks ("dangling" in the PageRank sense) simply leak
their mass each iteration, exactly as the reference does (it divides
only parents' ranks among children); the (1-d) re-injection plus
normalization keeps the distribution summing to 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig


def pagerank_nodes(corpus: DataFrame, links: DataFrame) -> DataFrame:
    """(doc_id) node set: every corpus doc ∪ every link endpoint
    (reference unions stored keys with children, pagerank.go:24-44)."""
    return (
        corpus.select("doc_id")
        .unionByName(links.select(F.col("src_doc").alias("doc_id")))
        .unionByName(links.select(F.col("dst_doc").alias("doc_id")))
        .distinct()
    )


def pagerank_step(
    ranks: DataFrame, edges: DataFrame, nodes: DataFrame, damping: float
) -> DataFrame:
    """One power iteration -> new (doc_id, rank). ``edges`` must carry
    (src_doc, dst_doc, outdeg)."""
    contribs = (
        ranks.join(edges, ranks["doc_id"] == edges["src_doc"])
        .select(
            F.col("dst_doc").alias("doc_id"),
            (F.lit(damping) * F.col("rank") / F.col("outdeg")).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("inherited"))
    )
    raw = nodes.join(contribs, "doc_id", "left").select(
        "doc_id",
        (F.coalesce(F.col("inherited"), F.lit(0.0)) + F.lit(1.0 - damping)).alias(
            "raw_rank"
        ),
    )
    total = raw.agg(F.sum("raw_rank")).first()[0]
    return raw.select("doc_id", (F.col("raw_rank") / F.lit(float(total))).alias("rank"))


def _dedup_edges(links: DataFrame) -> DataFrame:
    """Distinct edges with outdegree; parallel edges collapse (a page
    linking twice contributes once, matching the reference's child-set
    dedup, crawler.go:163-169)."""
    return (
        links.select("src_doc", "dst_doc")
        .distinct()
        .withColumn("outdeg", F.count("*").over(Window.partitionBy("src_doc")))
    )


def compute_pagerank(
    spark: SparkSession,
    corpus: DataFrame,
    links: DataFrame,
    cfg: EngineConfig = DEFAULT,
    max_iters: int | None = None,
    epsilon: float | None = None,
) -> DataFrame:
    """-> (doc_id, rank), converged. One shuffle AND one driver action
    per iteration: normalization totals are carried as driver-side
    literals, and the convergence L1 delta is folded into the same
    aggregate that computes the next total — checked one iteration
    behind (delta(r_i, r_{i-1}) decides before r_{i+1} is normalized),
    so the returned frame is identical to the check-then-stop loop.
    Lineage truncated every cfg.pr_checkpoint_every iterations."""
    damping = cfg.damping
    epsilon = cfg.pr_epsilon if epsilon is None else epsilon
    max_iters = cfg.pr_max_iters if max_iters is None else max_iters

    # pre-partition the per-iteration join inputs ONCE by their join key:
    # every iteration's ranks-x-edges join and nodes-join then reuses the
    # cached partitioning instead of re-shuffling the static sides
    nodes = pagerank_nodes(corpus, links).repartition("doc_id").cache()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "doc_id string, rank double")

    edges = _dedup_edges(links).repartition("src_doc").cache()
    edges.count()

    ranks = nodes.select("doc_id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    prev = None  # r_{i-1}, for the delayed delta

    for it in range(max_iters):
        contribs = (
            ranks.join(edges, ranks["doc_id"] == edges["src_doc"])
            .select(
                F.col("dst_doc").alias("doc_id"),
                (F.lit(damping) * F.col("rank") / F.col("outdeg")).alias("contrib"),
            )
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("inherited"))
        )
        raw = (
            nodes.join(contribs, "doc_id", "left")
            .join(ranks.withColumnRenamed("rank", "cur"), "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.coalesce(F.col("inherited"), F.lit(0.0))
                    + F.lit(1.0 - damping)
                ).alias("raw_rank"),
                "cur",
            )
        )
        if prev is not None:
            raw = raw.join(
                prev.withColumnRenamed("rank", "prevr"), "doc_id", "left"
            )
        # LAZY checkpoint of the un-normalized frame, materialized by the
        # convergence/total aggregate below — ONE job per iteration where
        # the eager-checkpoint shape paid two (the aggregate AND the
        # checkpoint each recomputed the iteration's joins). new_ranks
        # then normalizes off the checkpointed partitions, so the join
        # pipeline runs exactly once per iteration.
        if (it + 1) % cfg.pr_checkpoint_every == 0 or it == max_iters - 1:
            raw = raw.localCheckpoint(eager=False)
        if prev is not None:
            agg = raw.agg(
                F.sum("raw_rank").alias("t"),
                F.sum(F.abs(F.col("cur") - F.coalesce("prevr", F.lit(0.0)))).alias(
                    "d"
                ),
            ).first()
            if agg["d"] is not None and agg["d"] < epsilon:
                break  # r_it already converged; discard this iteration
        else:
            agg = raw.agg(F.sum("raw_rank").alias("t")).first()
        total = float(agg["t"])
        new_ranks = raw.select(
            "doc_id", (F.col("raw_rank") / F.lit(total)).alias("rank")
        )
        prev, ranks = ranks, new_ranks

    nodes.unpersist()
    edges.unpersist()
    return ranks
