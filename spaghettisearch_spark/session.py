"""SparkSession factory with scale-appropriate defaults.

Tuned for local[N] testing but written for a multi-executor cluster:
Arrow on (every Python crossing is vectorized), shuffle partitions
sized by parallelism rather than the 200 default.

AQE (round 6): OFF by default, parameterised via ``adaptive=`` /
``$SPARK_GRAFT_AQE``. Rationale, measured not assumed: AQE executes
every shuffle as a separate materialized query stage with a replan in
between — pure fixed cost on a workload whose stages are already
explicitly sized. This engine derives its partitioning statically
(query path: decode/kernel stages sized from the skip planner's known
decode volume; build paths: one shared doc_id exchange, term-salt
splitting for hot-term skew; joins: explicit broadcast hints on every
known-small side), so AQE has nothing left to fix and measurably slows
multi-stage operators (dedup pipeline 4.9 s -> 9.2 s with AQE on at
sf0.1; shard queries +15-20%; iterative PageRank/CC rounds likewise).
Set ``SPARK_GRAFT_AQE=1`` (or ``adaptive=True``) on clusters where
stage input sizes are NOT known at plan time — e.g. ad-hoc corpora
with no size statistics — to get runtime coalescing/skew handling
back; every operator is correct under both settings (exactness never
depends on the physical plan).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spaghettisearch_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    adaptive: bool | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) else all.
    ``shuffle_partitions`` defaults to max(cores, 32) locally — on a real
    cluster size this to ~2-3x total executor cores.
    ``adaptive`` defaults to ``$SPARK_GRAFT_AQE`` (off — see module
    docstring for the measured rationale and when to turn it back on).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores or os.cpu_count() or 8, 32)
    if adaptive is None:
        adaptive = os.environ.get("SPARK_GRAFT_AQE", "0") not in ("0", "", "false")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true" if adaptive else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local mode runs driver + executors in ONE JVM: the heap holds
        # every cached table AND all concurrent tasks' aggregation and
        # Arrow buffers (guide §5). 8g was arbitrary and sat within ~10%
        # of OOM on 150k-doc corpora; size to the host (still overridden
        # by $SPARK_DRIVER_MEM, and irrelevant on a real cluster where
        # executors carry the data)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
