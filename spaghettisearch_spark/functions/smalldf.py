"""Tiny driver-side DataFrames without the RDD round-trip.

``spark.createDataFrame(rows, schema)`` in classic PySpark builds an
RDD[Row]-backed plan: EVERY action on it (and on anything joined with
it) runs an extra 1-task Python stage just to re-serialize the handful
of rows — measured ~0.3 s per action on local[32], paid by every query
(the per-query term frame). A ``VALUES``-literal LocalRelation carries
the same rows inside the plan itself: no job, no Python worker, ~20 ms
per action (guide §4 — remove the Python boundary entirely).

Only used for bounded, driver-known inputs (query terms, phrase term
indexes): never corpus-sized data.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# characters we embed raw inside single-quoted SQL literals; anything
# else falls back to createDataFrame (correct for arbitrary strings,
# just slower). Tokenizer output is ^[a-z0-9]+$, so the fast path
# covers every real query term.
_SAFE_STR = re.compile(r"^[A-Za-z0-9 _.:/\-]*$")


def _sql_lit(v, typ: str) -> str | None:
    """SQL literal for one cell, or None if it can't be embedded safely."""
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "string":
        if not isinstance(v, str) or not _SAFE_STR.match(v):
            return None
        return f"'{v}'"
    if typ in ("int", "bigint", "long"):
        return f"CAST({int(v)} AS {'BIGINT' if typ != 'int' else 'INT'})"
    if typ == "double":
        # repr keeps full float64 precision; Spark parses it back exactly
        return f"CAST({float(v)!r} AS DOUBLE)"
    return None


def tiny_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """rows + 'name type, ...' schema -> LocalRelation DataFrame.

    Semantically identical to ``spark.createDataFrame(rows, schema)``
    for string/int/long/double columns (the only types the query paths
    use); falls back to createDataFrame when a value can't be embedded
    as a SQL literal (exotic string content) or the rows are empty.
    """
    fields = [tuple(p.strip().rsplit(" ", 1)) for p in schema.split(",")]
    if not rows:
        return spark.createDataFrame([], schema)
    sql_rows = []
    for row in rows:
        cells = []
        for v, (_n, typ) in zip(row, fields):
            lit = _sql_lit(v, typ)
            if lit is None:
                return spark.createDataFrame(rows, schema)
            cells.append(lit)
        sql_rows.append("(" + ", ".join(cells) + ")")
    names = ", ".join(n for n, _t in fields)
    return spark.sql(
        f"SELECT * FROM VALUES {', '.join(sql_rows)} AS t({names})"
    )
