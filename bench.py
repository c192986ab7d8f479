"""Benchmark runner (driver contract).

Builds the full index over $SPARK_GRAFT_SF_DIR/documents.parquet on
local[$SPARK_GRAFT_CPUS], runs the headline query set, and prints ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "files_per_sec": ..., "query_p50_ms": ...}

Extra env:
    SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
    SPARK_GRAFT_CPUS     default 32
    BENCH_REPS           query repetitions for p50 (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F


def _no_floor(cache: dict) -> dict:
    """Cold-wave view of a block-metadata cache: the term rows are
    shared (shallow copy), the cached wave-1 floors are dropped — so a
    two-phase rep pays the wave job every time. Keeps the `_2phase`
    bench rows comparable round-over-round now that a repeated bag
    would otherwise hit the floor cache and skip the wave (that serving
    steady state is measured separately as the `_floor` rows)."""
    return {k: v for k, v in cache.items() if not k.startswith("\x00floor:")}


def _oracle_skippable(shards, bag, cfg, k) -> dict:
    """Information-theoretic block-skip ceiling for a term bag: a block
    is skippable by ANY exact planner iff its best doc's TRUE total
    score (computed from the fully decoded shards) is below the true
    k-th score. Keeping more than (total - skippable) blocks is planner
    slack; total == kept means the query shape admits no skipping."""
    from pyspark.sql import functions as F

    from spaghettisearch_spark.operators.compression import decode_shards

    d = decode_shards(
        shards.filter(F.col("term").isin(bag)),
        passthrough=("salt",), fields=("weight",),
    )
    fw = (
        F.when(F.col("field") == "title", F.lit(cfg.w_title))
        .otherwise(F.lit(cfg.w_body))
    )
    per = d.withColumn("b", fw * F.col("weight") * F.lit(cfg.blend_scale))
    tot = per.groupBy("doc_key").agg(F.sum("b").alias("s")).cache()
    t_true = tot.orderBy(F.desc("s")).limit(k).collect()[-1]["s"]
    blk = (
        per.join(tot, "doc_key")
        .groupBy("term", "field", "salt")
        .agg(F.max("s").alias("blockmax"))
        .collect()
    )
    tot.unpersist()
    return {
        "total": len(blk),
        "skippable": sum(1 for r in blk if r["blockmax"] < t_true),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # every recorded number is a min over >=2 reps so round-over-round
    # artifact comparisons don't inherit host noise (the r2 verdict
    # flagged single-rep index_build/minhash drift as spurious)
    op_reps = int(os.environ.get("BENCH_OP_REPS", "2"))

    def best_of(fn, n=None) -> float:
        times = []
        for _ in range(n or op_reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 4)

    from spaghettisearch_spark.config import EngineConfig
    from spaghettisearch_spark.operators.bm25 import search
    from spaghettisearch_spark.operators.index_build import build_index
    from spaghettisearch_spark.operators.wand import wand_topk
    from spaghettisearch_spark.session import get_spark
    from spaghettisearch_spark.sources.corpus import from_driver_documents

    spark = get_spark("sss-bench", cores=cpus, shuffle_partitions=max(cpus, 16))
    cfg = EngineConfig(stem=True)

    timings: dict[str, float] = {}
    t_total0 = time.time()

    # ---- index build (ingest -> tokenize/stem -> postings -> stats) ----
    # the testdata parquet is a single file = ONE input partition; spread
    # it so tokenize/stem parallelizes (at warehouse scale the source is
    # already many files/partitions)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus * 2)
    docs = docs.cache()
    n_files = docs.count()
    # the host has noisy neighbors: repeat the build, keep the best
    build_reps = int(os.environ.get("BENCH_BUILD_REPS", "2"))
    build_times = []
    idx = None
    for _ in range(build_reps):
        spark.catalog.clearCache()
        docs.cache().count()
        t0 = time.time()
        corpus = from_driver_documents(docs)
        idx = build_index(corpus, cfg)
        # materialize the index tables (cache = the queryable index)
        idx.postings.cache().count()
        idx.doc_stats.cache().count()
        idx.term_stats.cache().count()
        idx.corpus_stats.cache().count()
        build_times.append(time.time() - t0)
    build_sec = min(build_times)
    timings["index_build"] = round(build_sec, 4)

    # ---- PageRank over synthetic deterministic graph ----
    from spaghettisearch_spark.operators.pagerank import compute_pagerank

    ids = docs.select(F.col("doc_id").cast("string").alias("path"))
    links_df = (
        docs.select(
            F.md5(F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"))).alias("src_doc"),
            F.md5(
                F.concat(
                    F.col("source"),
                    F.lit("/"),
                    ((F.col("doc_id") * 7 + 3) % n_files).cast("string"),
                )
            ).alias("dst_doc"),
        )
        .filter(F.col("src_doc") != F.col("dst_doc"))
        .withColumn("dst_exists", F.lit(True))
        .withColumn("anchor_terms", F.array().cast("array<string>"))
    )
    pr = None

    def run_pagerank():
        nonlocal pr
        if pr is not None:
            pr.unpersist()
        pr = compute_pagerank(spark, corpus, links_df, cfg, max_iters=10)
        pr.cache().count()

    timings["pagerank_10iter"] = best_of(run_pagerank)

    # ---- queries ----
    # wand_topk takes INDEX-VOCABULARY terms (bm25.search stems inside
    # parse_query; the WAND entry points don't re-tokenize). This index
    # is built with stem=True, so stem the bag first — passing raw
    # "query"/"table" silently matched zero postings for those terms in
    # earlier rounds and flattered every q_wand* number.
    from spaghettisearch_spark.functions.porter2 import stem as p2stem

    wand_terms = [p2stem(t) for t in ["spark", "query", "scan"]]
    hot_term = [p2stem("table")]
    qset = {
        "q_single": lambda: search(spark, idx, "spark", cfg, k=50),
        "q_multi": lambda: search(spark, idx, "spark query scan", cfg, k=50),
        "q_hot": lambda: search(spark, idx, "table", cfg, k=50),
        "q_phrase": lambda: search(spark, idx, '"value table"', cfg, k=50),
        "q_phrase_terms": lambda: search(spark, idx, '"value table" spark', cfg, k=50),
        "q_blended_pr": lambda: search(
            spark, idx, "spark query", cfg, pagerank=pr, k=50
        ),
        "q_wand": lambda: wand_topk(
            spark, idx, wand_terms, cfg, k=50, n_buckets=cpus
        ),
        # hot term (df ~ 1.0): the vectorized bucket kernel must keep WAND
        # at-or-under the exhaustive path even when pruning can't skip
        "q_wand_hot": lambda: wand_topk(
            spark, idx, hot_term, cfg, k=50, n_buckets=cpus
        ),
    }
    # compressed path: build shards once, query via pruned decode + WAND
    from spaghettisearch_spark.operators.compression import (
        build_doc_dim,
        build_posting_shards,
    )
    from spaghettisearch_spark.operators.wand import wand_topk_from_shards

    # dense doc dimension: shards keyed by doc_idx, doc_id strings joined
    # only to the kernel's n_buckets*k output rows (the at-scale shape —
    # the corpus-sized map never enters the per-query shuffle)
    doc_dim = build_doc_dim(corpus).cache()
    doc_dim.count()
    shards = None
    shard_meta: dict = {}  # per-term block metadata (serving-node dictionary)

    def run_shard_build():
        nonlocal shards
        if shards is not None:
            shards.unpersist()
        shard_meta.clear()
        shards = build_posting_shards(
            idx.postings, n_files, cfg, doc_dim=doc_dim, weight_col="bm25_weight"
        ).cache()
        shards.count()

    timings["shard_build"] = best_of(run_shard_build)

    # LSM delta merge: 90% of docs as the standing base, time compacting
    # the other 10% in (delta build + merge). The number to read against
    # shard_build: incremental maintenance cost vs full re-shard.
    from spaghettisearch_spark.operators.compression import merge_posting_shards

    seg = F.pmod(F.xxhash64("doc_id"), F.lit(10))
    base_90 = build_posting_shards(
        idx.postings.filter(seg != 0), n_files, cfg,
        doc_dim=doc_dim, weight_col="bm25_weight",
    ).cache()
    base_90.count()

    def run_shard_merge():
        # the delta segment is materialized before compaction (as any
        # real segment would be on storage); its build cost is timed
        delta = build_posting_shards(
            idx.postings.filter(seg == 0), n_files, cfg,
            doc_dim=doc_dim, weight_col="bm25_weight",
        ).cache()
        try:
            merge_posting_shards(base_90, delta, n_files, cfg).count()
        finally:
            delta.unpersist()

    timings["shard_merge_10pct"] = best_of(run_shard_merge)

    # pass-through case: a delta touching only a handful of (term,
    # field) groups — everything else must flow through undecoded, so
    # this cost is ~independent of index size (the LSM win condition;
    # the 10pct case above is the worst case on a tiny-vocab corpus
    # where any real delta touches every hot term)
    # deterministic 10-row delta, one unique synthetic term per row
    # (an unordered limit would compare different deltas across rounds,
    # and reused terms could collide into duplicate doc_keys per block)
    _sample = (
        idx.postings.select("field", "doc_id", "tf", "positions", "bm25_weight")
        .orderBy("doc_id", "field", "tf")
        .limit(10)
        .collect()
    )
    rare_delta = spark.createDataFrame(
        [
            (f"qzzrare{i}", r["field"], r["doc_id"], r["tf"],
             r["positions"], r["bm25_weight"])
            for i, r in enumerate(_sample)
        ],
        "term string, field string, doc_id string, tf int, "
        "positions array<int>, bm25_weight double",
    )

    def run_shard_merge_rare():
        delta = build_posting_shards(
            rare_delta, n_files, cfg, doc_dim=doc_dim, weight_col="bm25_weight"
        ).cache()
        try:
            # partitions_only: the dynamic-partition-overwrite write set
            # — compaction I/O bounded by touched shard partitions
            merge_posting_shards(
                base_90, delta, n_files, cfg, partitions_only=True
            ).count()
        finally:
            delta.unpersist()

    timings["shard_merge_rare"] = best_of(run_shard_merge_rare)
    base_90.unpersist()

    doc_map = doc_dim.select(
        F.col("doc_idx").alias("doc_key"), "doc_id"
    ).cache()
    doc_map.count()
    qset["q_wand_shards"] = lambda: wand_topk_from_shards(
        spark, shards, doc_map, wand_terms, cfg, k=50, dense_keys=True,
        meta_cache=shard_meta,
    )
    # the same query against PARQUET-backed shards partitioned by shard id
    # (the warehouse layout): measures the real cold path — partition-
    # pruned scan + column-pruned metadata + weight-only decode off disk,
    # not a cached in-memory frame
    import shutil as _shutil
    import tempfile as _tempfile

    _shard_dir = _tempfile.mkdtemp(prefix="bench_shards_")
    shards.write.mode("overwrite").partitionBy("shard").parquet(_shard_dir)
    shards_pq = spark.read.parquet(_shard_dir)
    shard_meta_pq: dict = {}
    qset["q_wand_shards_parquet"] = lambda: wand_topk_from_shards(
        spark, shards_pq, doc_map, wand_terms, cfg, k=50, dense_keys=True,
        meta_cache=shard_meta_pq,
    )
    # the same warehouse served through the SearchEngine facade (parse ->
    # WAND over parquet shards -> post-limit doc_meta hydration) — the
    # full serving path a query node runs, minus snippets (no corpus
    # attached, matching the other q_* rows)
    from spaghettisearch_spark.api import SearchEngine

    eng_wh = SearchEngine(
        spark=spark, index=idx, cfg=cfg, shards=shards_pq, doc_map=doc_map,
        warehouse_dir=_shard_dir, n_docs=n_files,
    )
    qset["q_engine_warehouse"] = lambda: eng_wh.query_df(
        "spark query scan", k=50, use_wand=True, backend="shards"
    )
    # phrase + free term from the disk warehouse: position intersection
    # and scoring run on dense long keys, doc_map broadcast-joins the
    # k-row output only (plan-gated in test_plans); ranking hard-gated
    # against the in-memory path below
    qset["q_engine_warehouse_phrase"] = lambda: eng_wh.query_df(
        '"value table" spark', k=50, backend="shards"
    )
    mem_phrase = [
        r["doc_id"]
        for r in search(spark, idx, '"value table" spark', cfg, k=50).collect()
    ]
    wh_phrase = [
        r["doc_id"]
        for r in eng_wh.query_df(
            '"value table" spark', k=50, backend="shards"
        ).collect()
    ]
    assert wh_phrase == mem_phrase, "warehouse phrase ranking != in-memory"

    # serving throughput under concurrency: ONE engine, one Spark
    # session, 4 driver threads issuing a mixed stream (term bags via
    # WAND, a phrase via the shard search path) — Spark schedules
    # concurrent actions from separate threads; the meta/floor caches
    # are shared. Reported as engine_qps alongside the sequential wall
    # for the same 16 queries, so the overlap factor is visible.
    import concurrent.futures as _fut

    qs_mix = [
        "spark query scan", '"value table" spark', "spark scan",
        "query table", "scan table spark",
    ]

    def _serve(q):
        eng_wh.query_df(q, k=50, use_wand=True, backend="shards").collect()

    for q in qs_mix:  # warm plans + metadata/floor caches once
        _serve(q)
    n_q = 16
    stream = [qs_mix[i % len(qs_mix)] for i in range(n_q)]
    t0 = time.time()
    for q in stream:
        _serve(q)
    seq_wall = time.time() - t0
    t0 = time.time()
    with _fut.ThreadPoolExecutor(4) as ex:
        list(ex.map(_serve, stream))
    conc_wall = time.time() - t0
    timings["engine_serve_seq16"] = round(seq_wall, 4)
    timings["engine_serve_conc16_t4"] = round(conc_wall, 4)
    engine_qps = round(n_q / conc_wall, 2)
    # hard gate: the WAND paths must return the same ranking as the
    # exhaustive path for the same bag — catches term-vocabulary
    # mismatches (raw vs stemmed) that would otherwise just make the
    # WAND numbers quietly faster
    exhaustive = [
        r["doc_id"]
        for r in search(spark, idx, "spark query scan", cfg, k=50).collect()
    ]
    for q in (
        wand_topk(spark, idx, wand_terms, cfg, k=50, n_buckets=cpus),
        wand_topk_from_shards(
            spark, shards, doc_map, wand_terms, cfg, k=50, dense_keys=True,
            meta_cache=shard_meta,
        ),
        wand_topk_from_shards(
            spark, shards_pq, doc_map, wand_terms, cfg, k=50, dense_keys=True,
            meta_cache=shard_meta_pq,
        ),
    ):
        got = [r["doc_id"] for r in q.collect()]
        assert got == exhaustive, "bench WAND ranking != exhaustive ranking"
    eng_rank = [
        r["doc_id"]
        for r in eng_wh.query_df(
            "spark query scan", k=50, use_wand=True, backend="shards"
        ).collect()
    ]
    assert eng_rank == exhaustive, "engine warehouse ranking != exhaustive"
    from spaghettisearch_spark.operators import wand as wand_mod

    skip_stats = {"main_multi": dict(wand_mod.LAST_SKIP_STATS)}
    # oracle ceiling for the uniform corpus + where the exact-floor
    # plan lands next to it. Measured finding (r5): the oracle says
    # 10-23/48 blocks are skippable, yet even the 2-phase exact floor
    # keeps 48/48 — on flat-weight corpora the binding constraint is
    # the SUM-OF-MAXIMA cross-term bound itself (own max + other
    # groups' overlapping maxima bounds a hypothetical doc achieving
    # every max at once, far above any real doc's sum), not threshold
    # quality. That gap is closed only by co-occurrence knowledge no
    # undecoded-metadata planner has — the honest limit of block-max
    # WAND, recorded per run rather than claimed away. A copied cache
    # keeps the floor out of shard_meta so the timed q_wand_shards
    # rows stay cold single-phase.
    skip_stats["main_multi_oracle"] = _oracle_skippable(
        shards, wand_terms, cfg, 50
    )
    mm_cache = dict(shard_meta)
    got_mm2p = [
        r["doc_id"]
        for r in wand_topk_from_shards(
            spark, shards, doc_map, wand_terms, cfg, k=50, dense_keys=True,
            meta_cache=mm_cache, two_phase=True,
        ).collect()
    ]
    assert got_mm2p == exhaustive, "main 2-phase WAND != exhaustive"
    skip_stats["main_multi_2phase"] = dict(wand_mod.LAST_SKIP_STATS)

    lat_ms: list[float] = []
    min_ms: list[float] = []
    for name, q in qset.items():
        times = []
        for _ in range(reps):
            t0 = time.time()
            q().collect()
            times.append(time.time() - t0)
        timings[name] = round(min(times), 4)
        lat_ms.extend(t * 1000 for t in times)
        min_ms.append(min(times) * 1000)

    _shutil.rmtree(_shard_dir, ignore_errors=True)

    # ---- training-data ops ----
    from spaghettisearch_spark.functions.tokenize import tokenize_col
    from spaghettisearch_spark.operators.textops import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash60,
    )

    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(tokenize_col("text")).alias("pos", "term"),
    )
    # scale path: cap degenerate buckets (the synthetic 24-word vocab makes
    # most docs near-identical; uncapped pairs are the oracle entry's job)
    timings["minhash_lsh"] = best_of(
        lambda: lsh_candidate_pairs(
            minhash_signatures(toks.select("id", "term").distinct(), "id", 8),
            band_rows=2,
            max_bucket=200,
        ).count()
    )

    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    timings["simhash"] = best_of(lambda: simhash60(tf, "id").count())

    # full near-dup pipeline: shingles -> MinHash -> banded LSH ->
    # exact-jaccard verify on candidates only -> connected components
    from spaghettisearch_spark.operators.graph import connected_components
    from spaghettisearch_spark.operators.textops import (
        jaccard_pairs,
        token_shingles,
    )

    def run_dedup_pipeline():
        # shingles feed BOTH the signature and the verify stage — cache
        # the shared intermediate (timing includes materialization)
        sh = token_shingles(toks, "id", 3).cache()
        try:
            sigs = minhash_signatures(
                sh.withColumnRenamed("shingle", "term"), "id", 8
            )
            cands = lsh_candidate_pairs(sigs, band_rows=2, max_bucket=200)
            verified = jaccard_pairs(sh, threshold=0.2, candidates=cands)
            connected_components(verified.select("id_a", "id_b")).count()
        finally:
            sh.unpersist()

    timings["dedup_pipeline"] = best_of(run_dedup_pipeline)

    from spaghettisearch_spark.operators.similarity import (
        cosine_topk,
        srp_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    timings["ann_cosine_topk"] = best_of(
        lambda: cosine_topk(emb, list(qv), k=10).collect()
    )

    timings["near_dup_srp"] = best_of(
        lambda: srp_near_dup_pairs(
            emb, dim=len(qv), threshold=0.55, n_planes=4, hamming=2
        ).count()
    )

    # ---- Zipf-vocabulary section: the at-scale machinery measured on a
    # corpus that can exercise it (the driver corpus's uniform 24-word
    # vocabulary can't: every delta touches every hot group and block
    # maxima are flat). 20k-term Zipf(1.1) corpus, same doc count. ----
    from spaghettisearch_spark.fixtures import make_zipf_documents
    from spaghettisearch_spark.operators.compression import merge_posting_shards as _merge

    zn = int(os.environ.get("BENCH_ZIPF_DOCS", str(n_files)))
    zdocs = make_zipf_documents(spark, zn).cache()
    zdocs.count()
    zcfg = EngineConfig(stem=False)
    t0 = time.time()
    zcorpus = from_driver_documents(zdocs)
    zidx = build_index(zcorpus, zcfg)
    zidx.postings.cache().count()
    zidx.doc_stats.cache().count()
    zidx.term_stats.cache().count()
    zidx.corpus_stats.cache().count()
    timings["zipf_index_build"] = round(time.time() - t0, 4)

    zdim = build_doc_dim(zcorpus).cache()
    zdim.count()
    zshards = None
    zmeta: dict = {}

    def run_zipf_shard_build():
        nonlocal zshards
        if zshards is not None:
            zshards.unpersist()
        zmeta.clear()
        zshards = build_posting_shards(
            zidx.postings, zn, zcfg, doc_dim=zdim, weight_col="bm25_weight"
        ).cache()
        zshards.count()

    timings["zipf_shard_build"] = best_of(run_zipf_shard_build)
    zmap = zdim.select(F.col("doc_idx").alias("doc_key"), "doc_id").cache()
    zmap.count()

    hot_bag = ["zw00000", "zw00001", "zw00002"]
    mid_bag = ["zw00000", "zw00150", "zw02500"]
    rarehot_bag = ["zw00000", "zw02500"]  # hot + rare: candidate pruning
    # hot + MID-tail (df >> sample size, so the mid group is
    # sample-INCOMPLETE): pruning here needs the round-5 sample-minimum
    # unsampled-doc bound — the global-max bound provably never fires on
    # this shape (hot max alone exceeds any k-th partial)
    midtail_bag = ["zw00000", "zw00500"]

    def zq(bag, meta=zmeta, sh=None, two_phase=False, k=50):
        return wand_topk_from_shards(
            spark, sh if sh is not None else zshards, zmap, bag, zcfg,
            k=k, dense_keys=True, meta_cache=meta, two_phase=two_phase,
        )

    # hard exactness gate before timing anything
    for bag, k in (
        (hot_bag, 50), (mid_bag, 50), (["zw00000"], 50), (rarehot_bag, 10),
        (midtail_bag, 10),
    ):
        exh = [
            r["doc_id"]
            for r in search(spark, zidx, " ".join(bag), zcfg, k=k).collect()
        ]
        got = [r["doc_id"] for r in zq(bag, k=k).collect()]
        assert got == exh, f"zipf WAND != exhaustive for {bag}"

    for name, bag, k in (
        ("hot", hot_bag, 50),
        ("mid", mid_bag, 50),
        ("single_hot", ["zw00000"], 50),
        # rare high-idf + hot flat term at k=10: the shape where DOC-level
        # candidate pruning is admissible (every unsampled doc provably
        # misses the threshold) — skip_stats.cand_docs records how few
        # postings survive the decode (at 10^12 files this is the
        # difference between shuffling the hot term's df and ~k*blocks)
        ("rarehot_k10", rarehot_bag, 10),
        ("midtail_k10", midtail_bag, 10),
    ):
        timings[f"zipf_q_wand_shards_{name}"] = best_of(
            lambda bag=bag, k=k: zq(bag, k=k).collect(), n=reps
        )
        # blocks kept vs saw + candidate-doc count on the LAST run
        skip_stats[f"zipf_{name}"] = dict(wand_mod.LAST_SKIP_STATS)
    # two-phase planner: wave-1 exact scoring of the sampled docs floors
    # the threshold near the true k-th. Since round 5 this UNLOCKS
    # multi-term skipping (the single-phase sample-partial threshold was
    # the binding constraint; with the floor + doc-range-aligned bounds
    # the hot bag drops from keeping ~everything to ~2/3, vs an oracle
    # skippability floor recorded below). Exactness hard-asserted.
    got_2p = [r["doc_id"] for r in zq(hot_bag, two_phase=True).collect()]
    exh_hot = [
        r["doc_id"]
        for r in search(spark, zidx, " ".join(hot_bag), zcfg, k=50).collect()
    ]
    assert got_2p == exh_hot, "two-phase zipf WAND != exhaustive"
    timings["zipf_q_wand_shards_hot_2phase"] = best_of(
        lambda: zq(hot_bag, meta=_no_floor(zmeta), two_phase=True).collect(),
        n=reps,
    )
    skip_stats["zipf_hot_2phase"] = dict(wand_mod.LAST_SKIP_STATS)
    # repeat-query serving steady state: the gate call above cached the
    # wave-1 floor in zmeta, so this single-phase call plans with the
    # near-oracle threshold and ZERO extra jobs — what every subsequent
    # occurrence of a hot bag costs on a serving node
    got_f = [r["doc_id"] for r in zq(hot_bag).collect()]
    assert got_f == exh_hot, "floor-cached zipf WAND != exhaustive"
    timings["zipf_q_wand_shards_hot_floor"] = best_of(
        lambda: zq(hot_bag).collect(), n=reps
    )
    skip_stats["zipf_hot_floor"] = dict(wand_mod.LAST_SKIP_STATS)

    # ORACLE skippability floor for the hot bag — the limit the planner
    # is judged against (see _oracle_skippable)
    skip_stats["zipf_hot_oracle"] = _oracle_skippable(zshards, hot_bag, zcfg, 50)

    timings["zipf_q_exhaustive_hot"] = best_of(
        lambda: search(spark, zidx, " ".join(hot_bag), zcfg, k=50).collect(),
        n=reps,
    )
    timings["zipf_q_exhaustive_single"] = best_of(
        lambda: search(spark, zidx, "zw00000", zcfg, k=50).collect(), n=reps
    )
    timings["zipf_q_wand_mem_hot"] = best_of(
        lambda: wand_topk(
            spark, zidx, hot_bag, zcfg, k=50, n_buckets=cpus
        ).collect(),
        n=reps,
    )

    # LSM on a real vocabulary: 10% doc delta. Three numbers to read
    # together: full re-shard (zipf_shard_build), delta-merge compaction,
    # and the append-only segment path (segment build cost ∝ delta; the
    # 2-segment query shows the read-side price of deferring compaction).
    zseg = F.pmod(F.xxhash64("doc_id"), F.lit(10))
    zbase = build_posting_shards(
        zidx.postings.filter(zseg != 0), zn, zcfg,
        doc_dim=zdim, weight_col="bm25_weight",
    ).cache()
    zbase.count()

    def run_zipf_merge():
        delta = build_posting_shards(
            zidx.postings.filter(zseg == 0), zn, zcfg,
            doc_dim=zdim, weight_col="bm25_weight",
        ).cache()
        try:
            _merge(zbase, delta, zn, zcfg).count()
        finally:
            delta.unpersist()

    timings["zipf_shard_merge_10pct"] = best_of(run_zipf_merge)

    def run_zipf_append():
        build_posting_shards(
            zidx.postings.filter(zseg == 0), zn, zcfg,
            doc_dim=zdim, weight_col="bm25_weight",
        ).count()

    timings["zipf_segment_append_10pct"] = best_of(run_zipf_append)

    # stats-refresh compaction: the 90% base's block-encoded dfs lag the
    # full-corpus term_stats by ~10% — refresh re-weights only the
    # drifted groups (decode-touched-only, untouched blocks pass through
    # undecoded). Read against zipf_shard_build: the cost of repairing
    # weight staleness without a pipeline rebuild.
    from spaghettisearch_spark.operators.compression import (
        key_doc_stats,
        refresh_shard_stats,
    )

    _dsk = key_doc_stats(zidx.doc_stats, zdim).cache()
    _dsk.count()
    _zstats_rows = zidx.corpus_stats.collect()
    timings["zipf_stats_refresh"] = best_of(
        lambda: refresh_shard_stats(
            zbase, zidx.term_stats, _dsk, _zstats_rows, zcfg,
            drift_threshold=0.05,
        ).count()
    )
    _dsk.unpersist()

    zdelta = build_posting_shards(
        zidx.postings.filter(zseg == 0), zn, zcfg,
        doc_dim=zdim, weight_col="bm25_weight",
    ).cache()
    zdelta.count()
    two_seg = zbase.unionByName(zdelta)
    zmeta2: dict = {}
    exh = [
        r["doc_id"]
        for r in search(spark, zidx, " ".join(hot_bag), zcfg, k=50).collect()
    ]
    got2 = [
        r["doc_id"] for r in zq(hot_bag, meta=zmeta2, sh=two_seg).collect()
    ]
    assert got2 == exh, "2-segment query != exhaustive"
    timings["zipf_q_wand_2seg_hot"] = best_of(
        lambda: zq(hot_bag, meta=zmeta2, sh=two_seg).collect(), n=reps
    )

    # ---- LARGE Zipf section: the LSM crossover needs enough posting
    # volume that per-op fixed costs stop dominating (the 5k-doc section
    # can't show it — append ≈ build there because both are overhead-
    # bound). 50k docs / ~6.3M postings, ONE rep per op (these are
    # multi-second distributed jobs; rep noise is amortized by size).
    # What this section is evidence FOR (measured, round 5):
    #   - segment append (1% delta) ≪ full re-shard: the per-batch
    #     incremental-maintenance win (~5x at 50k docs);
    #   - bounded-reach merge (rare terms, partitions_only) ≪ full
    #     re-shard: compaction I/O follows the delta's reach (~6x);
    #   - 1%-random-delta merge ~= full re-shard on a Zipf vocabulary —
    #     honestly reported: a random doc delta touches the hot terms
    #     that carry most posting volume, so per-batch eager compaction
    #     degenerates and the LSM answer is append N segments + merge
    #     once (amortized), exactly what the segment rows price out.
    zl = int(os.environ.get("BENCH_ZIPF_LARGE", "50000"))
    lsm_summary = None
    if zl > 0:
        zldocs = make_zipf_documents(spark, zl).cache()
        zldocs.count()
        t0 = time.time()
        zlcorpus = from_driver_documents(zldocs)
        zlidx = build_index(zlcorpus, zcfg)
        zlidx.postings.cache().count()
        timings["zipfL_index_build"] = round(time.time() - t0, 4)
        zldim = build_doc_dim(zlcorpus).cache()
        zldim.count()
        t0 = time.time()
        zlshards = build_posting_shards(
            zlidx.postings, zl, zcfg, doc_dim=zldim, weight_col="bm25_weight"
        ).cache()
        zlshards.count()
        timings["zipfL_shard_build"] = round(time.time() - t0, 4)

        zlseg = F.pmod(F.xxhash64("doc_id"), F.lit(100))
        t0 = time.time()
        zldelta = build_posting_shards(
            zlidx.postings.filter(zlseg == 0), zl, zcfg,
            doc_dim=zldim, weight_col="bm25_weight",
        ).cache()
        zldelta.count()
        timings["zipfL_segment_append_1pct"] = round(time.time() - t0, 4)
        zlbase = build_posting_shards(
            zlidx.postings.filter(zlseg != 0), zl, zcfg,
            doc_dim=zldim, weight_col="bm25_weight",
        ).cache()
        zlbase.count()
        t0 = time.time()
        _merge(zlbase, zldelta, zl, zcfg).count()
        timings["zipfL_shard_merge_1pct"] = round(time.time() - t0, 4)
        _lsample = (
            zlidx.postings.select("field", "doc_id", "tf", "positions",
                                  "bm25_weight")
            .orderBy("doc_id", "field", "tf").limit(10).collect()
        )
        zlrare = spark.createDataFrame(
            [
                (f"qzzrare{i}", r["field"], r["doc_id"], r["tf"],
                 r["positions"], r["bm25_weight"])
                for i, r in enumerate(_lsample)
            ],
            "term string, field string, doc_id string, tf int, "
            "positions array<int>, bm25_weight double",
        )
        zlrd = build_posting_shards(
            zlrare, zl, zcfg, doc_dim=zldim, weight_col="bm25_weight"
        ).cache()
        zlrd.count()
        t0 = time.time()
        _merge(zlbase, zlrd, zl, zcfg, partitions_only=True).count()
        timings["zipfL_shard_merge_rare"] = round(time.time() - t0, 4)

        # ---- amortized LSM cycle, measured end-to-end (not derived):
        # K=4 batches of 1% arrive; each batch is a cheap segment append
        # (served immediately — the 2-segment query row prices that),
        # then ONE merge compacts all four segments into the base. The
        # honest per-batch comparison is
        #   (sum of K appends + 1 merge) / K   vs   one full re-shard
        # because the eager alternative re-runs build_posting_shards on
        # the whole corpus every batch. A random doc-keyed delta touches
        # every hot term (zipfL_shard_merge_1pct ~= re-shard shows per-
        # batch eager compaction degenerating on Zipf volume), so
        # amortization IS the LSM win condition — this row is the
        # committed artifact for it.
        zlbase96 = build_posting_shards(
            zlidx.postings.filter(zlseg >= 4), zl, zcfg,
            doc_dim=zldim, weight_col="bm25_weight",
        ).cache()
        zlbase96.count()
        t0 = time.time()
        zlsegs = []
        for i in range(4):
            s = build_posting_shards(
                zlidx.postings.filter(zlseg == i), zl, zcfg,
                doc_dim=zldim, weight_col="bm25_weight",
            ).cache()
            s.count()
            zlsegs.append(s)
        t_appends = time.time() - t0
        timings["zipfL_lsm_cycle_appends4"] = round(t_appends, 4)
        delta4 = zlsegs[0]
        for s in zlsegs[1:]:
            delta4 = delta4.unionByName(s)
        t0 = time.time()
        _merge(zlbase96, delta4, zl, zcfg).count()
        t_merge = time.time() - t0
        timings["zipfL_lsm_cycle_merge4"] = round(t_merge, 4)
        # derived per-batch comparison (NOT a wall row — kept out of
        # timings so sum_min_ops_sec stays a sum of measured walls)
        lsm_summary = {
            "k_batches": 4,
            "amortized_batch_sec": round((t_appends + t_merge) / 4, 4),
            "reshard_batch_sec": timings["zipfL_shard_build"],
        }
        zlbase96.unpersist()
        for s in zlsegs:
            s.unpersist()

        # queries at volume: long posting lists are where block skipping
        # and doc-level candidate pruning actually pay
        zlmap = zldim.select(F.col("doc_idx").alias("doc_key"), "doc_id").cache()
        zlmap.count()
        zlmeta: dict = {}

        def zlq(bag, k=50, two_phase=False, meta=None):
            return wand_topk_from_shards(
                spark, zlshards, zlmap, bag, zcfg, k=k, dense_keys=True,
                meta_cache=zlmeta if meta is None else meta,
                two_phase=two_phase,
            )

        exh_l = [
            r["doc_id"]
            for r in search(spark, zlidx, " ".join(hot_bag), zcfg, k=50).collect()
        ]
        for tp in (False, True):
            got_l = [r["doc_id"] for r in zlq(hot_bag, two_phase=tp).collect()]
            assert got_l == exh_l, f"zipfL WAND != exhaustive (2p={tp})"
        # the tp=True gate above cached the hot bag's wave-1 floor in
        # zlmeta: strip it for the cold single-phase / two-phase rows,
        # measure the floor-cached serving steady state separately
        timings["zipfL_q_wand_hot"] = best_of(
            lambda: zlq(hot_bag, meta=_no_floor(zlmeta)).collect(), n=reps
        )
        skip_stats["zipfL_hot"] = dict(wand_mod.LAST_SKIP_STATS)
        timings["zipfL_q_wand_hot_2phase"] = best_of(
            lambda: zlq(hot_bag, meta=_no_floor(zlmeta), two_phase=True)
            .collect(),
            n=reps,
        )
        skip_stats["zipfL_hot_2phase"] = dict(wand_mod.LAST_SKIP_STATS)
        got_lf = [r["doc_id"] for r in zlq(hot_bag).collect()]
        assert got_lf == exh_l, "floor-cached zipfL WAND != exhaustive"
        timings["zipfL_q_wand_hot_floor"] = best_of(
            lambda: zlq(hot_bag).collect(), n=reps
        )
        skip_stats["zipfL_hot_floor"] = dict(wand_mod.LAST_SKIP_STATS)
        # deeper tail term than the small section's zw02500: candidate
        # pruning needs the rare group SAMPLE-COMPLETE (df <= 32), and
        # at 50k docs zw02500's df (~308) outgrows the sample while
        # zw17500's (~23) stays under it
        rarehot_l = ["zw00000", "zw17500"]
        exh_rh = [
            r["doc_id"]
            for r in search(
                spark, zlidx, " ".join(rarehot_l), zcfg, k=10
            ).collect()
        ]
        got_rh = [r["doc_id"] for r in zlq(rarehot_l, k=10).collect()]
        assert got_rh == exh_rh, "zipfL rarehot != exhaustive"
        timings["zipfL_q_rarehot_k10"] = best_of(
            lambda: zlq(rarehot_l, k=10).collect(), n=reps
        )
        skip_stats["zipfL_rarehot_k10"] = dict(wand_mod.LAST_SKIP_STATS)
        # hot + mid-tail (mid group sample-INCOMPLETE at this scale):
        # admissible only under the sample-minimum unsampled-doc bound
        midtail_l = ["zw00000", "zw00500"]
        exh_mt = [
            r["doc_id"]
            for r in search(
                spark, zlidx, " ".join(midtail_l), zcfg, k=10
            ).collect()
        ]
        got_mt = [r["doc_id"] for r in zlq(midtail_l, k=10).collect()]
        assert got_mt == exh_mt, "zipfL midtail != exhaustive"
        timings["zipfL_q_midtail_k10"] = best_of(
            lambda: zlq(midtail_l, k=10).collect(), n=reps
        )
        skip_stats["zipfL_midtail_k10"] = dict(wand_mod.LAST_SKIP_STATS)
        for f_ in (zldocs, zlidx.postings, zldim, zlshards, zldelta,
                   zlbase, zlrd, zlmap):
            f_.unpersist()

    total = time.time() - t_total0
    out = {
        "metric": "index_build+query_suite_wall",
        # wall includes EVERY rep of every op (>=2 each since r3); the
        # rep-invariant round-over-round number is sum_min_ops_sec
        "sum_min_ops_sec": round(sum(timings.values()), 3),
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_files": n_files,
        "files_per_sec": round(n_files / build_sec, 2),
        "query_p50_ms": round(statistics.median(lat_ms), 1),
        # median of per-query MINs — the noise-robust latency headline
        # (query_p50_ms medians ALL reps incl. cold first runs)
        "query_p50_min_ms": round(statistics.median(min_ms), 1),
        "cpus": cpus,
        "reps": {"query": reps, "build": build_reps, "op": op_reps},
        # blocks kept vs total by the skip-before-decode planner — the
        # block-max evidence (impact-ordered salt blocks since r4)
        "skip_stats": skip_stats,
        "zipf": {"n_docs": zn, "vocab_size": 20000, "s": 1.1},
        # amortized LSM cycle at the large-Zipf scale (K segment appends
        # + one merge, per-batch, vs a full re-shard per batch)
        "lsm": lsm_summary,
        # mixed-stream serving throughput, 4 driver threads over one
        # warehouse engine (see engine_serve_* wall rows)
        "engine_qps": engine_qps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
