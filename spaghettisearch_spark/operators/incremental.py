"""Incremental re-index — the reference's modified-page path, batch-shaped.

Reference (/root/reference/indexer/indexer.go:41-75): on re-crawl, if the
stored Mod_date is stale, ``checkAndUpdate`` (indexer.go:420-641) deletes
the doc's stale title/body/anchor postings with per-word read-modify-
write, then the doc is re-indexed.

Spark shape: no point deletes — the update set is a DataFrame; stale
rows are removed with one ``left_anti`` join and replacements appended
in the same write. The diff itself is computed from the per-row
``content_sha256`` invariant (changed == same (repo, path), different
sha; new == unseen (repo, path)).

At warehouse scale this rewrites only the term-bucket partitions that
contain the changed docs' terms — with dynamic partition overwrite the
untouched buckets' files are left in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import term_hash60_col
from ..operators import index_build as ib
from ..sources.corpus import ingest


def diff_corpus(old_corpus: DataFrame, new_documents: DataFrame) -> DataFrame:
    """New/changed rows of ``new_documents`` (canonical-ingested) vs the
    existing corpus, by content_sha256 — the staleness check."""
    incoming = ingest(new_documents)
    current = old_corpus.select(
        "repo", "path", F.col("content_sha256").alias("old_sha")
    )
    return (
        incoming.join(current, ["repo", "path"], "left")
        .filter(
            F.col("old_sha").isNull() | (F.col("old_sha") != F.col("content_sha256"))
        )
        .drop("old_sha")
    )


def apply_updates(
    postings: DataFrame,
    corpus: DataFrame,
    changed: DataFrame,
    cfg: EngineConfig = DEFAULT,
) -> tuple[DataFrame, DataFrame]:
    """-> (new_postings, new_corpus) with the changed docs' rows replaced.

    One anti-join (removes every stale posting of a changed doc — title,
    body, and anchor rows at once, where the reference walks three
    tables word-by-word under a mutex) + one union of freshly built
    postings.
    """
    changed_ids = changed.select("doc_id").distinct()
    keep = postings.join(changed_ids, "doc_id", "left_anti")
    fresh_tokens = ib.tokenize_fields(changed, cfg)
    fresh = ib.build_postings(fresh_tokens)
    if "bucket" in postings.columns:
        fresh = fresh.withColumn(
            "bucket", F.pmod(term_hash60_col("term"), F.lit(cfg.n_shards)).cast("int")
        )
    fresh = fresh.select(*[c for c in keep.columns if c in fresh.columns])
    for c in keep.columns:
        if c not in fresh.columns:
            fresh = fresh.withColumn(c, F.lit(None).cast(keep.schema[c].dataType))
    new_postings = keep.unionByName(fresh.select(*keep.columns))

    new_corpus = corpus.join(changed_ids, "doc_id", "left_anti").unionByName(
        changed.select(*corpus.columns)
    )
    return new_postings, new_corpus


def incremental_reindex(
    spark: SparkSession,
    warehouse: str,
    new_documents: DataFrame,
    cfg: EngineConfig = DEFAULT,
) -> int:
    """Warehouse flavor: rewrite corpus/links/postings_raw with changed
    docs replaced. Returns the number of changed docs.

    Anchor-credit closure (reference checkAndUpdate, indexer.go:536-641
    removes a changed page's anchor postings from its children): a
    changed doc's OUTGOING links may change, so every doc that received
    anchor credit from it — under the old or the new link set — is
    'affected' and gets its postings rebuilt too (its own content is
    unchanged; only its inbound anchor rows move). Everything else is
    one anti-join + append.

    Stats tables (df/dl/avgdl/weights/shards) are refreshed by re-running
    the batch pipeline, which resumes from these updated checkpoints.
    """
    from .links import extract_links

    corpus = spark.read.parquet(f"{warehouse}/corpus")
    old_links = spark.read.parquet(f"{warehouse}/links")
    postings = spark.read.parquet(f"{warehouse}/postings_raw")
    changed = diff_corpus(corpus, new_documents).cache()
    n = changed.count()
    if n == 0:
        changed.unpersist()
        return 0

    changed_ids = changed.select("doc_id").distinct()
    new_corpus = corpus.join(changed_ids, "doc_id", "left_anti").unionByName(
        changed.select(*corpus.columns)
    )
    kept_links = old_links.join(
        changed_ids.withColumnRenamed("doc_id", "src_doc"), "src_doc", "left_anti"
    )
    # resolve targets against the FULL updated corpus: a changed doc
    # linking to an existing UNCHANGED doc must keep dst_exists=true, or
    # the target silently loses its inbound anchor credit (ADVICE r01)
    fresh_links = extract_links(changed, cfg, resolve_with=new_corpus)
    new_links = kept_links.unionByName(fresh_links.select(*kept_links.columns))

    # affected = changed ∪ old/new anchor-credit targets of changed docs
    old_targets = old_links.join(
        changed_ids.withColumnRenamed("doc_id", "src_doc"), "src_doc"
    ).select(F.col("dst_doc").alias("doc_id"))
    new_targets = fresh_links.select(F.col("dst_doc").alias("doc_id"))
    affected = (
        changed_ids.unionByName(old_targets).unionByName(new_targets).distinct()
    ).cache()

    affected_corpus = new_corpus.join(affected, "doc_id", "left_semi")
    affected_links = new_links.join(
        affected.withColumnRenamed("doc_id", "dst_doc"), "dst_doc", "left_semi"
    )
    fresh_tokens = ib.tokenize_fields(affected_corpus, cfg, affected_links)
    fresh = ib.build_postings(fresh_tokens)
    if "bucket" in postings.columns:
        fresh = fresh.withColumn(
            "bucket", F.pmod(term_hash60_col("term"), F.lit(cfg.n_shards)).cast("int")
        )
    keep = postings.join(affected, "doc_id", "left_anti")
    new_postings = keep.unionByName(fresh.select(*keep.columns))

    # write every updated table to a tmp dir (reads still source the old
    # dirs — no overwrite-while-reading race), then swap atomically and
    # record lineage with the NEW input fingerprint, so a subsequent
    # build_all over the updated documents SKIPS these stages and
    # rebuilds only the stale downstream stats/shards (ADVICE r01: the
    # old in-place overwrite wiped the _lineage.json sidecars, breaking
    # the resume flow entirely)
    from ..plans.build_pipeline import corpus_fingerprint
    from ..sources.checkpoints import atomic_swap, write_lineage

    new_fp = corpus_fingerprint(
        new_corpus.select("repo", "path", "commit", "lang", "content")
    )
    part_by = ["bucket"] if "bucket" in new_postings.columns else None
    tables = [
        ("postings_raw", new_postings, part_by),
        ("corpus", new_corpus, None),
        ("links", new_links, None),
    ]
    for name, df, pb in tables:
        writer = df.write.mode("overwrite")
        if pb:
            writer = writer.partitionBy(*pb)
        writer.parquet(f"{warehouse}/{name}__tmp")
    for name, _df, pb in tables:
        atomic_swap(f"{warehouse}/{name}__tmp", f"{warehouse}/{name}")
        written = spark.read.parquet(f"{warehouse}/{name}")
        write_lineage(
            f"{warehouse}/{name}",
            name,
            new_fp,
            rows=written.count(),
            partitions=written.rdd.getNumPartitions(),
            partition_by=pb,
            incremental_changed_docs=n,
        )
    for df in (changed, affected):
        df.unpersist()
    return n


def family_top5(links: DataFrame) -> DataFrame:
    """Per-doc first-5 parents (each with its anchor terms) and children
    — the reference's result-card fields (retrieval/util.go:56-92 keeps
    5 of each; get_metadata.go:237-266 resolves parents WITH the anchor
    terms they credited, DocInfo.Parents map[parent][]anchorTerms,
    noschema_schema.go:34-44). Deterministic: lexicographic doc-id /
    term order replaces goroutine arrival order.

    Output: (doc_id, children_top5 array<string>, parents_top5
    array<string>, parents_anchors array<struct<parent, terms>>)."""
    children = links.groupBy(F.col("src_doc").alias("doc_id")).agg(
        F.slice(F.array_sort(F.collect_set("dst_doc")), 1, 5).alias("children_top5")
    )
    # per (target, parent): union of anchor terms over all of the
    # parent's links to the target, distinct+sorted, first 5
    per_parent = (
        links.groupBy(
            F.col("dst_doc").alias("doc_id"), F.col("src_doc").alias("parent")
        )
        .agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("anchor_terms")))
                ),
                1,
                5,
            ).alias("terms")
        )
    )
    parents = per_parent.groupBy("doc_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("parent", "terms"))), 1, 5
        ).alias("parents_anchors")
    ).select(
        "doc_id",
        F.transform("parents_anchors", lambda s: s["parent"]).alias("parents_top5"),
        "parents_anchors",
    )
    return children.join(parents, "doc_id", "outer")
