"""Link-graph extraction from document content.

Fixture analog of the reference's href extraction + anchor-text model
(/root/reference/crawler/crawler.go:21-109 link extraction;
indexer/indexer.go:163-299 anchor crediting): ``@link{repo/path}``
markers embedded in ``content`` become edges; the up-to-3 tokens
immediately preceding a marker are its anchor terms.

All splitting/zipping is native Spark array functions; only the final
anchor-term stemming crosses into Python (vectorized pandas UDF).

Output: links(src_doc, dst_doc, dst_exists, anchor_terms array<string>)
— edge list, not per-doc adjacency blobs (the reference's
DocHash_children / Parents maps, database.go:118), because joins and
groupBys over edges are what Spark shuffles optimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.stem_udf import stemmed
from ..functions.tokenize import tokenize_col

_MARKER = r"@link\{([^}]*)\}"


def extract_links(
    corpus: DataFrame,
    cfg: EngineConfig = DEFAULT,
    resolve_with: DataFrame | None = None,
) -> DataFrame:
    """Canonical corpus -> links edge list.

    Dangling targets (referenced doc not in corpus) are kept with
    ``dst_exists = false`` — the reference includes them in the PageRank
    node set (ranking/pagerank.go:24-44 unions keys with children).

    ``resolve_with``: corpus to resolve targets against when extracting
    links from a SUBSET (incremental re-index): dst_exists must be
    checked against the FULL corpus, not just the changed slice —
    otherwise a changed doc linking to an unchanged existing doc gets
    dst_exists=false and the target silently loses its anchor credit.
    """
    target_corpus = resolve_with if resolve_with is not None else corpus
    segs = F.split("content", _MARKER)
    targets = F.regexp_extract_all("content", F.lit(_MARKER), 1)

    exploded = (
        corpus.select(
            F.col("doc_id").alias("src_doc"),
            F.posexplode(
                F.zip_with(
                    targets,
                    F.slice(segs, 1, F.size(targets)),
                    lambda t, s: F.struct(t.alias("target"), s.alias("pre_text")),
                )
            ).alias("ord", "z"),
        )
        .select(
            "src_doc",
            "ord",
            F.col("z.target").alias("target"),
            F.col("z.pre_text").alias("pre_text"),
        )
    )
    anchor_toks = tokenize_col("pre_text", remove_stopwords=cfg.remove_stopwords)
    anchors = exploded.withColumn(
        "anchor_terms_raw",
        F.slice(anchor_toks, F.greatest(F.size(anchor_toks) - 2, F.lit(1)), 3),
    )
    anchors = anchors.withColumn(
        "anchor_terms",
        stemmed("anchor_terms_raw") if cfg.stem else F.col("anchor_terms_raw"),
    )

    ids = target_corpus.select(
        F.concat("repo", F.lit("/"), "path").alias("target"),
        F.col("doc_id").alias("dst_doc_known"),
    )
    return (
        anchors.join(ids, "target", "left")
        .select(
            "src_doc",
            F.coalesce("dst_doc_known", F.md5("target")).alias("dst_doc"),
            F.col("dst_doc_known").isNotNull().alias("dst_exists"),
            "anchor_terms",
        )
    )
