"""Corpus ingest — adapters to the engine's canonical document shape.

Canonical corpus schema (north-rule input_hint, Iceberg-shaped):

    documents(repo string, path string, commit string, lang string,
              content string)

Ingest derives:
    doc_id          = md5(repo || '/' || path)   (reference: md5(url),
                      /root/reference/indexer/indexer.go:38-39)
    content_sha256  = sha2(content, 256)          (north-rule invariant,
                      carried through to every downstream table that
                      holds doc rows, asserted end-to-end in tests)
    title           = path   (stand-in for page title in a code corpus;
                      reference stores page title per doc,
                      /root/reference/database/noschema_schema.go:34-44)
    body            = content

At 100 TB the ``documents`` table is an Iceberg table partitioned by
repo-bucket; ``read_corpus`` is a thin ``spark.read`` so partition
pruning and column pruning reach the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import doc_id_col

CORPUS_COLS = ["doc_id", "repo", "path", "commit", "lang", "content", "content_sha256"]


def ingest(documents: DataFrame) -> DataFrame:
    """(repo, path, commit, lang, content) -> canonical corpus frame."""
    return documents.select(
        doc_id_col("repo", "path").alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )


def from_driver_documents(documents: DataFrame) -> DataFrame:
    """Adapter for the driver's testdata shape
    (doc_id bigint, text, lang, source, n_chars) -> canonical corpus.

    repo := source, path := the numeric doc_id, commit := fixed marker,
    content := text.  Keeps md5 doc ids so both corpora flow through the
    same engine code.
    """
    return ingest(
        documents.select(
            F.col("source").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("HEAD").alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
    )


def read_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a documents table (parquet dir or Iceberg table name)."""
    if fmt == "iceberg":
        return ingest(spark.read.format("iceberg").load(path))
    return ingest(spark.read.parquet(path))
