"""Stream-stream interval join — the remaining core Structured
Streaming surface (no reference analog; SURVEY §2.9 notes the reference
has no streaming at all).

Use case here: correlate a user's events with their OWN events shortly
before (self-join within a time interval) — the "what happened in the N
minutes before a conversion" query every event pipeline runs. Spark
requires watermarks on BOTH sides plus a time-range join condition so it
can bound the buffered state; the same plan runs unchanged on batch
frames, which is how the test cross-checks it.

Scale notes: state size is bounded by watermark + interval width per
key; the join itself shuffles both sides by the equi-key (user), so key
skew behaves like any keyed stream agg (salt hot users upstream if one
user dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_self_join(
    events: DataFrame,
    lookback_minutes: int = 10,
    watermark: str = "30 minutes",
    left_type: str | None = None,
    right_type: str | None = None,
) -> DataFrame:
    """Pairs of a user's events (a, b) with b in the ``lookback_minutes``
    BEFORE a (strictly earlier; same-timestamp pairs excluded so output
    is symmetric-free and batch/stream agree deterministically).

    Optional event-type filters on each side (e.g. left='purchase',
    right='click' = clicks preceding a purchase). Works on a streaming
    frame (watermarks applied) and identically on a batch frame.
    """
    a = events.select(
        F.col("user_id"),
        F.col("ts").cast("timestamp").alias("a_ts"),
        F.col("event_type").alias("a_type"),
        F.col("value").alias("a_value"),
    )
    b = events.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").cast("timestamp").alias("b_ts"),
        F.col("event_type").alias("b_type"),
        F.col("value").alias("b_value"),
    )
    if a.isStreaming:
        a = a.withWatermark("a_ts", watermark)
        b = b.withWatermark("b_ts", watermark)
    if left_type is not None:
        a = a.filter(F.col("a_type") == left_type)
    if right_type is not None:
        b = b.filter(F.col("b_type") == right_type)
    cond = (
        (a["user_id"] == b["b_user"])
        & (b["b_ts"] < a["a_ts"])
        & (b["b_ts"] >= a["a_ts"] - F.expr(f"INTERVAL {lookback_minutes} MINUTES"))
    )
    return a.join(b, cond).select(
        "user_id",
        "a_ts",
        "a_type",
        "a_value",
        "b_ts",
        "b_type",
        "b_value",
    )
