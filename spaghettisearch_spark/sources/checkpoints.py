"""Stage checkpoints with lineage metrics — resumable builds.

Every build stage writes its output parquet plus a ``_lineage.json``
sidecar (stage name, input fingerprint, rows out, partition count, wall
seconds, engine version). A stage is skipped on re-run when its
checkpoint is complete (parquet ``_SUCCESS``) AND its recorded input
fingerprint matches — the Spark-native analog of the reference's
incremental re-index staleness check
(/root/reference/indexer/indexer.go:41-75, which compares stored
Mod_date/md5 before re-indexing a page).

At cluster scale the warehouse dir lives on object storage; nothing
here assumes a local filesystem beyond what Spark's committers already
need.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .. import __version__

LINEAGE_FILE = "_lineage.json"


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    partitions: int
    seconds: float
    skipped: bool
    extra: dict = field(default_factory=dict)


def _lineage_path(out_dir: str) -> Path:
    return Path(out_dir) / LINEAGE_FILE


def is_complete(out_dir: str, input_fingerprint: str | None = None) -> bool:
    p = Path(out_dir)
    if not (p / "_SUCCESS").exists() or not _lineage_path(out_dir).exists():
        return False
    if input_fingerprint is None:
        return True
    try:
        meta = json.loads(_lineage_path(out_dir).read_text())
    except (OSError, json.JSONDecodeError):
        return False
    return meta.get("input_fingerprint") == input_fingerprint


def write_lineage(
    out_dir: str,
    stage: str,
    input_fingerprint: str,
    rows: int,
    partitions: int,
    seconds: float = 0.0,
    partition_by: list[str] | None = None,
    **extra,
) -> dict:
    """Write a stage's lineage sidecar (same shape run_stage records) —
    used by out-of-band table rewrites (incremental_reindex) so resume
    semantics stay coherent: the rewritten stages carry the NEW input
    fingerprint (skipped on the next build_all over the updated input),
    while downstream stages keep their stale fingerprint and rebuild."""
    meta = {
        "stage": stage,
        "engine_version": __version__,
        "input_fingerprint": input_fingerprint,
        "rows_out": rows,
        "partitions": partitions,
        "wall_seconds": round(seconds, 3),
        "partition_by": partition_by or [],
        "written_at_unix": int(time.time()),
        **extra,
    }
    _lineage_path(out_dir).write_text(json.dumps(meta, indent=2))
    return meta


def atomic_swap(tmp_dir: str, out_dir: str) -> None:
    """Replace ``out_dir`` with ``tmp_dir`` via two renames — readers of
    the old path never observe a half-written table, and a crash leaves
    either the old or the new table intact (plus at worst a stale
    ``__old``/``__tmp`` dir to garbage-collect).

    Local-filesystem semantics; on object storage swap the table pointer
    in a metastore instead (e.g. an Iceberg snapshot commit) — the call
    site is the single place to change."""
    import shutil

    old = out_dir.rstrip("/") + "__old"
    if Path(old).exists():
        shutil.rmtree(old)
    Path(out_dir).rename(old)
    Path(tmp_dir).rename(out_dir)
    shutil.rmtree(old)


def run_stage(
    spark: SparkSession,
    name: str,
    out_dir: str,
    build: "callable",
    input_fingerprint: str = "",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    resume: bool = True,
    extra_metrics: dict | None = None,
) -> StageResult:
    """Run (or skip) one checkpointed stage.

    ``build()`` returns the stage DataFrame; it is written to
    ``out_dir`` (optionally partitioned / sorted within partitions) and
    a lineage sidecar is recorded. On resume, a complete checkpoint with
    a matching input fingerprint short-circuits to a metadata read.
    """
    if resume and is_complete(out_dir, input_fingerprint or None):
        meta = json.loads(_lineage_path(out_dir).read_text())
        return StageResult(
            name=name,
            path=out_dir,
            rows=meta.get("rows_out", -1),
            partitions=meta.get("partitions", -1),
            seconds=0.0,
            skipped=True,
            extra=meta,
        )

    t0 = time.time()
    df = build()
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_dir)

    written = spark.read.parquet(out_dir)
    # one verification pass yields BOTH the row count and the
    # per-partition row histogram (north rule: per-partition lineage +
    # metrics — skew is visible in the sidecar, not discovered later)
    from pyspark.sql import functions as F

    hist = (
        written.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(
            F.sum("count").alias("rows"),
            F.count("*").alias("n_parts"),
            F.min("count").alias("p_min"),
            F.max("count").alias("p_max"),
            F.avg("count").alias("p_avg"),
        )
        .first()
    )
    rows = int(hist["rows"] or 0)
    partitions = int(hist["n_parts"] or 0)
    seconds = time.time() - t0
    meta = {
        "stage": name,
        "engine_version": __version__,
        "input_fingerprint": input_fingerprint,
        "rows_out": rows,
        "partitions": partitions,
        "partition_rows": {
            "min": int(hist["p_min"] or 0),
            "max": int(hist["p_max"] or 0),
            "avg": round(float(hist["p_avg"] or 0.0), 1),
        },
        "wall_seconds": round(seconds, 3),
        "partition_by": partition_by or [],
        "written_at_unix": int(time.time()),
        **(extra_metrics or {}),
    }
    _lineage_path(out_dir).write_text(json.dumps(meta, indent=2))
    return StageResult(
        name=name, path=out_dir, rows=rows, partitions=partitions,
        seconds=seconds, skipped=False, extra=meta,
    )
