"""Structured Streaming ingest — incremental index maintenance.

The reference re-indexes modified pages inside its crawl loop
(/root/reference/indexer/indexer.go:41-75 staleness check;
checkAndUpdate 420-641 deletes stale postings then re-adds). The
streaming analog: new/changed document files arrive in a drop directory;
each micro-batch tokenizes ONLY the new docs and appends their posting
rows (partitioned by term bucket), so the index grows incrementally
without touching existing partitions' history. Readers recompute df/
avgdl from the appended state (or periodically compact via the batch
pipeline — same code path, plans/build_pipeline.py).

Also provides a watermarked event-time windowed aggregation over a query
log stream — the standard Structured Streaming stateful-op surface
(no reference analog; SURVEY.md §2.9 notes the reference has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import term_hash60_col
from ..operators import index_build as ib
from ..sources.corpus import ingest

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def stream_ingest_documents(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    cfg: EngineConfig = DEFAULT,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """File-source stream of documents -> incremental postings append.

    Returns the StreamingQuery. ``available_now=True`` drains what's
    there and stops (test/batch-catchup mode); False = continuous.
    """
    checkpoint_dir = checkpoint_dir or f"{warehouse}/_stream_checkpoint"
    raw = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        corpus = ingest(batch_df)
        tokens = ib.tokenize_fields(corpus, cfg)
        postings = ib.build_postings(tokens).withColumn(
            "bucket", F.pmod(term_hash60_col("term"), F.lit(cfg.n_shards)).cast("int")
        )
        (
            postings.write.mode("append")
            .partitionBy("bucket")
            .parquet(f"{warehouse}/postings_raw")
        )
        corpus.write.mode("append").parquet(f"{warehouse}/corpus")

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_query_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts with late-data watermark over a
    (streaming or batch) frame with columns (ts timestamp, event_type
    string, value double). Works identically on a batch frame (Spark
    runs the same plan), which is how the test cross-checks it."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # watermarks require TIMESTAMP (NTZ parquet columns won't do)
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def compact(spark: SparkSession, warehouse: str, cfg: EngineConfig = DEFAULT):
    """Rebuild the derived index tables after streaming appends.

    The stream appends raw postings + corpus rows; global stats (df,
    avgdl, weights, shards, pagerank) go stale. Compaction re-runs the
    batch pipeline with the warehouse corpus as input — ``ingest`` is
    idempotent on canonical rows, and the changed input fingerprint
    invalidates every stage, so this is one call, resumable like any
    build. Same pattern at cluster scale, on a schedule or a row-count
    trigger.
    """
    from ..plans.build_pipeline import build_all

    documents = spark.read.parquet(f"{warehouse}/corpus").select(
        "repo", "path", "commit", "lang", "content"
    )
    # materialize the input before stages overwrite the corpus dir
    documents = documents.cache()
    documents.count()
    try:
        return build_all(spark, documents, warehouse, cfg)
    finally:
        documents.unpersist()
