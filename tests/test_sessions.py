"""Sessionization: batch vs python mirror; streaming stateful operator
(applyInPandasWithState) closes the same sessions as batch."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spaghettisearch_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

GAP = 30


def _mk_events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions (gap 45 min between event 2 and 3)
    for mins, v in [(0, 1.0), (10, 2.0), (55, 3.0), (60, 4.0)]:
        rows.append((1, base + dt.timedelta(minutes=mins), v))
    # user 2: one session
    for mins, v in [(5, 10.0), (20, 20.0)]:
        rows.append((2, base + dt.timedelta(minutes=mins), v))
    # flush events far in the future so the watermark closes everything
    for uid in (1, 2):
        rows.append((uid, base + dt.timedelta(days=2), 0.0))
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_batch_sessions(spark):
    ev = _mk_events(spark)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(ev, GAP).collect()
    }
    base = dt.datetime(2024, 1, 1)
    assert got[(1, base)] == (2, 3.0)
    assert got[(1, base + dt.timedelta(minutes=55))] == (2, 7.0)
    assert got[(2, base + dt.timedelta(minutes=5))] == (2, 30.0)
    # flush singletons exist too
    assert len(got) == 5


def test_stream_sessions_match_batch(spark, tmp_path):
    ev = _mk_events(spark)
    src = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(stream, GAP, watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want_all = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(ev, GAP).collect()
    }
    # every streamed session must match the batch result exactly; the
    # flush sessions themselves may stay open (nothing after them)
    assert got, "stream emitted no sessions"
    for key, val in got.items():
        assert want_all[key] == val
    # all real (non-flush) sessions were closed and emitted
    real = {k for k, (n, sv) in want_all.items() if not (n == 1 and sv == 0.0)}
    assert real.issubset(set(got))
