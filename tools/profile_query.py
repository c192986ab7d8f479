"""Per-query latency breakdown for the shard-backed WAND path (guide §1).

Builds the sf0.1 index + shards exactly like bench.py, then times:
  - the session's fixed action floor (collect on a 1-row cached frame)
  - each sub-stage of wand_topk_from_shards in isolation
  - the full query under config variations (AQE on/off, shuffle partitions)

Run:  python tools/profile_query.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def t(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times), sorted(times)[len(times) // 2]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from spaghettisearch_spark.config import EngineConfig
    from spaghettisearch_spark.operators.bm25 import search
    from spaghettisearch_spark.operators.compression import (
        build_doc_dim,
        build_posting_shards,
        decode_shards,
        prune_shards,
    )
    from spaghettisearch_spark.operators.index_build import build_index
    from spaghettisearch_spark.operators.wand import (
        wand_topk,
        wand_topk_from_shards,
    )
    from spaghettisearch_spark.session import get_spark
    from spaghettisearch_spark.sources.corpus import from_driver_documents
    from spaghettisearch_spark.functions.porter2 import stem as p2stem

    spark = get_spark("profile-query", cores=cpus, shuffle_partitions=max(cpus, 16))
    cfg = EngineConfig(stem=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus * 2).cache()
    n_files = docs.count()
    corpus = from_driver_documents(docs)
    idx = build_index(corpus, cfg)
    idx.postings.cache().count()
    idx.doc_stats.cache().count()
    idx.term_stats.cache().count()
    idx.corpus_stats.cache().count()

    doc_dim = build_doc_dim(corpus).cache()
    doc_dim.count()
    shards = build_posting_shards(
        idx.postings, n_files, cfg, doc_dim=doc_dim, weight_col="bm25_weight"
    ).cache()
    shards.count()
    doc_map = doc_dim.select(F.col("doc_idx").alias("doc_key"), "doc_id").cache()
    doc_map.count()
    meta: dict = {}

    wand_terms = [p2stem(x) for x in ["spark", "query", "scan"]]

    one = spark.createDataFrame([(1,)], "x int").cache()
    one.count()
    print("floor_1row_collect", t(lambda: one.collect()))
    print("floor_createDataFrame", t(lambda: spark.createDataFrame(
        [(x, i, 1.0) for i, x in enumerate(wand_terms)],
        "term string, qterm_id int, qtf double").collect()))

    # full query, warm cache
    def full():
        wand_topk_from_shards(
            spark, shards, doc_map, wand_terms, cfg, k=50, dense_keys=True,
            meta_cache=meta,
        ).collect()

    print("full_q_wand_shards", t(full))

    # stage 1: pruned metadata already cached; decode only
    pruned = prune_shards(shards, wand_terms, cfg)
    print("decode_only_collect", t(lambda: decode_shards(
        pruned, fields=("weight",)).collect()))

    # stage 2: decode + qdf join + bucket groupBy + kernel (no final join)
    from spaghettisearch_spark.operators.wand import _wand_from_hits
    from collections import Counter
    counts = Counter(wand_terms)

    def kernel_only():
        qdf = spark.createDataFrame(
            [(x, i, float(counts[x])) for i, x in enumerate(sorted(counts))],
            "term string, qterm_id int, qtf double",
        )
        decoded = decode_shards(pruned, fields=("weight",))
        hits = decoded.join(F.broadcast(qdf), "term").select(
            F.col("doc_key").alias("doc_id"), "field", "qterm_id", "qtf",
            F.col("weight").alias("contrib"),
        )
        _wand_from_hits(spark, hits, len(counts), cfg, 50, 16, None, "taat").collect()

    print("kernel_no_hydration", t(kernel_only))

    # exhaustive for comparison
    print("exhaustive_search", t(lambda: search(
        spark, idx, "spark query scan", cfg, k=50).collect()))
    print("wand_mem", t(lambda: wand_topk(
        spark, idx, wand_terms, cfg, k=50, n_buckets=cpus).collect()))

    # AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("full_AQE_off", t(full))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    print("full_AQE_off_sp8", t(full))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print("full_AQE_on_sp8", t(full))
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus, 16)))

    # explain for the record
    df = wand_topk_from_shards(
        spark, shards, doc_map, wand_terms, cfg, k=50, dense_keys=True,
        meta_cache=meta,
    )
    Path("plans/r06").mkdir(parents=True, exist_ok=True)
    with open("plans/r06/profile_wand_shards_plan.txt", "w") as f:
        f.write(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print("done")


if __name__ == "__main__":
    main()
