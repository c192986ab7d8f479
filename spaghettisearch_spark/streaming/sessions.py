"""Sessionization — gap-based user sessions, batch and streaming.

Batch: the classic lag/cumsum window pattern — a new session starts
where the gap to the previous event of the same user exceeds
``gap_minutes``; session_id = running count of session starts. Fully
SQL-expressible (DuckDB oracle: __spark_entry__.events_sessionize).

Streaming: a CUSTOM STATEFUL operator via ``applyInPandasWithState`` —
per-user open-session state (start, last_ts, n, sum_value), extended by
each micro-batch, emitted when the event-time watermark passes
last_ts + gap (timeout) or when a longer gap appears inside the batch.
This is the engine's example of state the built-in windowed aggs can't
express (the emitted record carries per-session aggregates computed
incrementally, and the state key outlives any fixed window).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value)."""
    ev = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.lit(gap_minutes * 60)
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > gap,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("session_id")
    )


def _us(ts) -> int:
    return int(ts.value // 1000) if hasattr(ts, "value") else int(ts)


def _session_func(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def func(key, pdf_iter, state):
        user_id = int(key[0])
        out = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, sv = state.get
                out.append((user_id, start_us, last_us, n, sv))
                state.remove()
            yield pd.DataFrame(
                out, columns=["user_id", "start_us", "last_us", "n", "sum_value"]
            )
            return

        rows = []
        for pdf in pdf_iter:
            for r in pdf.itertuples(index=False):
                rows.append((_us(pd.Timestamp(r.ts)), float(r.value)))
        rows.sort()

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = None
            n, sv = 0, 0.0

        for ts_us, val in rows:
            if last_us is not None and ts_us - last_us > gap_us:
                out.append((user_id, start_us, last_us, n, sv))
                start_us = last_us = None
                n, sv = 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = max(last_us or ts_us, ts_us)
            n += 1
            sv += val

        if start_us is not None:
            state.update((start_us, last_us, n, sv))
            # close the session when the watermark passes last event + gap
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        yield pd.DataFrame(
            out, columns=["user_id", "start_us", "last_us", "n", "sum_value"]
        )

    return func


_RAW_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def sessionize_stream(
    events_stream: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming sessions via applyInPandasWithState (event-time timeout).

    Emits one row per CLOSED session: closed in-batch by a gap, or by
    the watermark passing last_ts + gap. Output matches
    ``sessionize_batch`` for every session the stream gets to close.
    """
    ev = events_stream.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    ).withWatermark("ts", watermark)
    raw = ev.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_minutes),
        outputStructType=_RAW_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
    return raw.select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("last_us")).alias("session_end"),
        F.col("n").alias("n_events"),
        "sum_value",
    )
