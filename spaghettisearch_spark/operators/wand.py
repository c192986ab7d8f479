"""Block-max WAND top-k — exact document-at-a-time pruning inside
``applyInPandas``.

The reference scores every candidate doc exhaustively
(/root/reference/retrieval/main_retrieve.go:50-97); the north rule asks
for block-max WAND posting-list intersection with exact results. Catalyst
cannot express document-at-a-time skipping, so this is one of the three
genuinely custom algorithmic pieces (SURVEY.md §4.2).

Distributed shape (the part that must survive 100 TB):

  1. posting rows are fetched ONLY for the query terms (term-pruned scan
     of posting_shards / postings — a few million rows for even the
     hottest term, never the whole index);
  2. those rows are hash-partitioned by ``doc_bucket`` (one shuffle of
     candidate postings only), so each bucket holds the complete posting
     set of every query term for its doc range — the precondition for
     document-at-a-time evaluation;
  3. each bucket independently computes its exact local top-k. Two
     kernels, both exact and cross-asserted against the exhaustive
     scorer: kernel='taat' (default) — a single branchless numpy
     bincount scatter-add over the Arrow-resident bucket + k-th-score
     partition (see _score_bucket_vectorized for why this beats
     pointer-chasing once the data is in memory); kernel='daat' —
     document-at-a-time WAND with per-term upper bounds and a local
     top-k heap (the classic skipping form, kept for parity and for
     engines that stream postings instead of materializing them);
  4. global top-k = TakeOrderedAndProject over n_buckets * k rows.

Exactness: every bucket returns its true local top-k, and the global
merge of true local top-k sets contains the true global top-k. Pruning
(upper-bound skipping) only ever discards docs that cannot enter the
local heap.

Scoring model: per-posting impact weights are precomputed at index time
(BM25 weights need only tf, df, dl, avgdl — all known at build), so
query-time score(d) = sum over query terms of stored weight * qtf. This
matches the exhaustive bm25.py path bit-for-bit on the same floats, and
is asserted so in tests/test_wand.py.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT, EngineConfig
from .bm25 import posting_hits
from .index_build import FIELD_BODY, FIELD_TITLE, Index

class _InvStr(str):
    """String with reversed ordering — lets the min-heap treat the
    LARGEST doc_id as worst among equal scores, matching the global
    (score desc, doc_id asc) total order."""

    __slots__ = ()

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other):  # type: ignore[override]
        return str.__lt__(self, other)


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("title_rank", T.DoubleType()),
        T.StructField("body_rank", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)

# dense-key variant: the shard path can score on the long doc_idx and
# hydrate doc_id strings AFTER top-k (see wand_topk_from_shards)
_OUT_SCHEMA_LONG = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("title_rank", T.DoubleType()),
        T.StructField("body_rank", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _wand_bucket(cfg: EngineConfig, k: int):
    """Build the per-bucket kernel. Input pdf columns:
    doc_id, qterm_id (dense 0..m-1), contrib (blended per-field impact),
    title_c, body_c. Emits local top-k rows."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["doc_id", "title_rank", "body_rank", "score"])
        m = int(pdf["qterm_id"].max()) + 1
        # organize per-term posting arrays sorted by doc_id
        term_docs: list[np.ndarray] = []
        term_scores: list[np.ndarray] = []
        term_title: list[np.ndarray] = []
        term_body: list[np.ndarray] = []
        ubs = np.zeros(m)
        for t in range(m):
            sub = pdf[pdf["qterm_id"] == t]
            if sub.empty:
                term_docs.append(np.array([], dtype=object))
                term_scores.append(np.zeros(0))
                term_title.append(np.zeros(0))
                term_body.append(np.zeros(0))
                continue
            sub = sub.sort_values("doc_id")
            term_docs.append(sub["doc_id"].to_numpy())
            term_scores.append(sub["contrib"].to_numpy(dtype=np.float64))
            term_title.append(sub["title_c"].to_numpy(dtype=np.float64))
            term_body.append(sub["body_c"].to_numpy(dtype=np.float64))
            ubs[t] = term_scores[-1].max()

        ptrs = np.zeros(m, dtype=np.int64)
        lens = np.array([len(d) for d in term_docs], dtype=np.int64)
        # heap entries: (score, _InvStr(doc_id), doc_id, title, body) — the
        # min element is the worst-kept doc under (score desc, doc_id asc)
        heap: list[tuple] = []
        threshold = -np.inf

        def cur_doc(t):
            return term_docs[t][ptrs[t]] if ptrs[t] < lens[t] else None

        while True:
            # order live terms by current doc id (WAND sort step)
            live = [(cur_doc(t), t) for t in range(m) if ptrs[t] < lens[t]]
            if not live:
                break
            live.sort(key=lambda x: x[0])
            # find pivot: smallest prefix whose UB sum can still enter the
            # heap (>= threshold: an exact tie can win on doc_id order)
            acc = 0.0
            pivot_idx = -1
            for i, (_, t) in enumerate(live):
                acc += ubs[t]
                if acc >= threshold or len(heap) < k:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # no doc can beat the threshold
            pivot_doc = live[pivot_idx][0]
            if live[0][0] == pivot_doc:
                # fully evaluate pivot_doc
                s = tt = bb = 0.0
                for d, t in live:
                    p = ptrs[t]
                    if p < lens[t] and term_docs[t][p] == pivot_doc:
                        s += term_scores[t][p]
                        tt += term_title[t][p]
                        bb += term_body[t][p]
                        ptrs[t] += 1
                entry = (s, _InvStr(pivot_doc), pivot_doc, tt, bb)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry[:2] > heap[0][:2]:
                    heapq.heapreplace(heap, entry)
                if len(heap) == k:
                    threshold = heap[0][0]
            else:
                # advance all terms before the pivot to >= pivot_doc
                for d, t in live[:pivot_idx]:
                    arr = term_docs[t]
                    ptrs[t] += int(
                        np.searchsorted(arr[ptrs[t]:], pivot_doc, side="left")
                    )
        rows = [
            {"doc_id": d, "title_rank": tt, "body_rank": bb, "score": s}
            for (s, _inv, d, tt, bb) in heap
        ]
        return pd.DataFrame(rows, columns=["doc_id", "title_rank", "body_rank", "score"])

    return kernel


def _score_bucket_vectorized(k: int):
    """Vectorized exact per-bucket top-k: factorize doc ids once, then a
    single branchless ``np.bincount`` scatter-add per score column over
    the WHOLE bucket, followed by an O(n) k-th-score partition and a
    tiny (-score, doc_id) tie-break sort of the survivors.

    Why this beats document-at-a-time WAND here: the bucket's postings
    are already Arrow-resident (the pruned scan + shuffle did the real
    skipping), so DAAT's upper-bound skipping saves only Python-loop CPU
    — and a bincount accumulates a posting in ~1ns vs ~1us per iteration
    of the pointer-chasing loop. Pruning would have to skip >99.9% of
    postings to win; on hot terms (df ~ 80%) it skips almost nothing.
    The DAAT kernel (_wand_bucket) is retained as kernel='daat' — both
    are exact and asserted equal to the exhaustive scorer in tests."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "title_rank", "body_rank", "score"]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        codes, uniques = pd.factorize(pdf["doc_id"], sort=False)
        n = len(uniques)
        acc = np.bincount(
            codes, weights=pdf["contrib"].to_numpy(np.float64), minlength=n
        )
        acc_t = np.bincount(
            codes, weights=pdf["title_c"].to_numpy(np.float64), minlength=n
        )
        acc_b = np.bincount(
            codes, weights=pdf["body_c"].to_numpy(np.float64), minlength=n
        )
        if n > k:
            kth = np.partition(acc, n - k)[n - k]
            cand = np.nonzero(acc >= kth)[0]  # >= keeps kth-score ties
        else:
            cand = np.arange(n)
        ids = uniques[cand]
        order = sorted(range(len(cand)), key=lambda i: (-acc[cand[i]], ids[i]))[:k]
        sel = cand[[order[i] for i in range(len(order))]]
        return pd.DataFrame(
            {
                "doc_id": uniques[sel],
                "title_rank": acc_t[sel],
                "body_rank": acc_b[sel],
                "score": acc[sel],
            },
            columns=cols,
        )

    return kernel


def wand_topk(
    spark: SparkSession,
    index: Index,
    query_terms: list[str],
    cfg: EngineConfig = DEFAULT,
    k: int | None = None,
    n_buckets: int = 16,
    pagerank: DataFrame | None = None,
    kernel: str = "taat",
) -> DataFrame:
    """Exact top-k for a bag of free terms via distributed block-max WAND.

    Returns (doc_id, title_rank, body_rank, pagerank, score) — same shape
    and (to float associativity) same values as bm25.search's exhaustive
    path for term-only queries, asserted in tests. PageRank, when given,
    is folded in as an additional WAND term so its mass participates in
    the upper bounds — pruning stays admissible and results stay exact.
    """
    from collections import Counter

    if cfg.scorer != "bm25":
        raise ValueError(
            "wand_topk scores precomputed impact weights; tfidf_cosine's "
            "per-query normalization needs the exhaustive path (bm25.search)"
        )
    k = k or cfg.top_k
    if not query_terms:
        return spark.createDataFrame(
            [], "doc_id string, title_rank double, body_rank double, "
            "pagerank double, score double"
        )
    counts = Counter(query_terms)
    qdf = spark.createDataFrame(
        [(t, i, float(c)) for i, (t, c) in enumerate(sorted(counts.items()))],
        "term string, qterm_id int, qtf double",
    )

    hits = posting_hits(index, list(counts), cfg).join(F.broadcast(qdf), "term")
    return _wand_from_hits(
        spark, hits, len(counts), cfg, k, n_buckets, pagerank, kernel
    )


def _wand_from_hits(
    spark: SparkSession,
    hits: DataFrame,
    n_qterms: int,
    cfg: EngineConfig,
    k: int,
    n_buckets: int,
    pagerank: DataFrame | None,
    kernel: str = "taat",
) -> DataFrame:
    """Shared tail of the WAND paths: ``hits`` must carry
    (doc_id, field, qterm_id, qtf, contrib)."""
    # blended per-posting impact: field weight folded in, so the WAND
    # kernel maximizes the FINAL blended score directly
    fw = (
        F.when(F.col("field") == FIELD_TITLE, F.lit(cfg.w_title))
        .when(F.col("field") == FIELD_BODY, F.lit(cfg.w_body))
        .otherwise(F.lit(0.0))
    )
    per_posting = hits.select(
        "doc_id",
        "qterm_id",
        (fw * F.col("contrib") * F.col("qtf") * F.lit(cfg.blend_scale)).alias(
            "blended"
        ),
        F.when(F.col("field") == FIELD_TITLE, F.col("contrib") * F.col("qtf"))
        .otherwise(F.lit(0.0))
        .alias("title_c"),
        F.when(F.col("field") == FIELD_BODY, F.col("contrib") * F.col("qtf"))
        .otherwise(F.lit(0.0))
        .alias("body_c"),
    )
    if kernel == "daat":
        # a doc can hit the same query term in BOTH fields: collapse to
        # one posting per (doc, qterm) so document-at-a-time sees one
        # cursor each. The vectorized kernel's scatter-add collapses
        # duplicates natively, so it skips this whole shuffle — posting
        # rows flow straight into the bucket partitioning (halves the
        # query path's shuffle volume).
        per_doc_term = per_posting.groupBy("doc_id", "qterm_id").agg(
            F.sum("blended").alias("contrib"),
            F.sum("title_c").alias("title_c"),
            F.sum("body_c").alias("body_c"),
        )
    else:
        per_doc_term = per_posting.withColumnRenamed("blended", "contrib")
    if pagerank is not None:
        # exact PR blending: PR becomes one more WAND term, present for
        # every candidate doc — its bucket max feeds the upper bounds, so
        # pruning stays admissible. Candidate set unchanged (docs with at
        # least one term hit), matching the exhaustive path.
        pr_rows = (
            per_doc_term.select("doc_id")
            .distinct()
            .join(pagerank.select("doc_id", F.col("rank").alias("pr")), "doc_id", "left")
            .select(
                "doc_id",
                F.lit(n_qterms).alias("qterm_id"),
                (
                    F.lit(cfg.w_pagerank * cfg.blend_scale)
                    * F.coalesce("pr", F.lit(0.0))
                ).alias("contrib"),
                F.lit(0.0).alias("title_c"),
                F.lit(0.0).alias("body_c"),
            )
        )
        per_doc_term = per_doc_term.unionByName(pr_rows)

    bucketed = per_doc_term.withColumn(
        "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )
    long_keys = dict(hits.dtypes).get("doc_id") == "bigint"
    if long_keys and kernel == "daat":
        raise ValueError(
            "the DAAT kernel tie-breaks on string doc_ids; dense long "
            "keys require the vectorized kernel (kernel='taat')"
        )
    bucket_kernel = (
        _wand_bucket(cfg, k) if kernel == "daat" else _score_bucket_vectorized(k)
    )
    local = bucketed.groupBy("doc_bucket").applyInPandas(
        bucket_kernel, _OUT_SCHEMA_LONG if long_keys else _OUT_SCHEMA
    )
    out = local
    if pagerank is not None:
        out = out.join(
            pagerank.select("doc_id", F.col("rank").alias("pr")), "doc_id", "left"
        ).withColumn("pr", F.coalesce("pr", F.lit(0.0)))
    else:
        out = out.withColumn("pr", F.lit(0.0))
    return (
        out.select(
            "doc_id",
            "title_rank",
            "body_rank",
            F.col("pr").alias("pagerank"),
            "score",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# telemetry from the latest wand_topk_from_shards call: how many blocks
# the skip planner kept vs saw (tests assert kept < total on skewed data)
LAST_SKIP_STATS: dict[str, int] = {"total": 0, "kept": 0}

# reserved meta_cache key for the cached PageRank blend maximum (terms
# never contain NUL, so this cannot shadow a term's metadata entry)
_PR_MAX_KEY = "\x00pr_max"


def select_blocks(
    meta_rows: list,
    cfg: EngineConfig,
    qtf: dict[str, float],
    k: int,
    extra_ub: float = 0.0,
    min_threshold: float | None = None,
) -> set[tuple[str, str, int]]:
    """Block-max skip planner (driver-side, pure): given undecoded block
    metadata rows (term, field, salt, max_weight, top_doc_keys,
    top_weights), return the (term, field, salt) blocks that must be
    decoded for an EXACT top-k.

    Threshold: each block's top-N (doc_key, weight) sample yields partial
    blended scores per doc (a lower bound of the doc's full score, since
    contributions are non-negative); T = k-th largest partial. A block is
    skippable iff its best-case doc score — its own max_weight plus every
    OTHER (term, field) group's max block weight plus ``extra_ub`` (e.g.
    the PageRank blend maximum) — is strictly below T: every doc in it
    then provably scores below the k-th result, so the doc is not in the
    top-k and dropping its remaining contributions cannot corrupt the
    top-k (top-k docs appear only in kept blocks, so their scores stay
    exact). Strict inequality keeps tie-on-T blocks."""
    fw = {FIELD_TITLE: cfg.w_title, FIELD_BODY: cfg.w_body}

    def factor(field: str, term: str) -> float:
        return fw.get(field, 0.0) * qtf.get(term, 0.0) * cfg.blend_scale

    # per-(term, field) max blended upper bound across its blocks
    group_ub: dict[tuple[str, str], float] = {}
    partials: dict[int, float] = {}
    for r in meta_rows:
        f = factor(r["field"], r["term"])
        key = (r["term"], r["field"])
        ub = float(r["max_weight"]) * f
        if ub > group_ub.get(key, 0.0):
            group_ub[key] = ub
        for dk, w in zip(r["top_doc_keys"] or [], r["top_weights"] or []):
            partials[dk] = partials.get(dk, 0.0) + float(w) * f
    if len(partials) < k:
        if min_threshold is None:
            return {(r["term"], r["field"], int(r["salt"])) for r in meta_rows}
        threshold = min_threshold
    else:
        threshold = sorted(partials.values(), reverse=True)[k - 1]
        # an externally supplied EXACT lower bound (the two-phase
        # planner's k-th wave-1 partial score) can only tighten the
        # sample-derived threshold — both are lower bounds on the true
        # k-th score, so max() preserves admissibility
        if min_threshold is not None and min_threshold > threshold:
            threshold = min_threshold
    sum_ub = sum(group_ub.values()) + extra_ub
    keep: set[tuple[str, str, int]] = set()
    for r in meta_rows:
        key = (r["term"], r["field"])
        bound = (
            sum_ub
            - group_ub.get(key, 0.0)
            + float(r["max_weight"]) * factor(r["field"], r["term"])
        )
        if bound >= threshold:
            keep.add((r["term"], r["field"], int(r["salt"])))
    return keep


def wand_topk_from_shards(
    spark: SparkSession,
    shards: DataFrame,
    doc_map: DataFrame,
    query_terms: list[str],
    cfg: EngineConfig = DEFAULT,
    k: int | None = None,
    n_buckets: int = 16,
    pagerank: DataFrame | None = None,
    kernel: str = "taat",
    dense_keys: bool = False,
    meta_cache: dict | None = None,
    two_phase: bool = False,
    pr_max_key: str = _PR_MAX_KEY,
) -> DataFrame:
    """Exact top-k straight from the compressed posting shards: pruned
    shard scan -> varbyte decode (mapInPandas) -> block-max WAND.

    ``two_phase=True`` refines the skip threshold with one extra
    distributed round: decode ONLY the highest-impact block of each
    (term, field), score those postings exactly, and use the k-th best
    partial score — an exact lower bound on the true k-th result — as a
    floor for the planner threshold. Multi-term bags skip little under
    the sample-derived threshold (the admissible cross-term bound needs
    a tight k-th estimate to bite); the wave-1 partials capture
    cross-term sums for the high-impact docs and tighten it. Costs one
    extra job per query (~fixed local overhead), so it's opt-in: right
    for long posting lists at scale, wrong for latency-bound tiny
    corpora. Exactness argument is select_blocks', unchanged: both
    thresholds are lower bounds on the true k-th score.

    This is the north-rule query path at scale: the scan touches only
    the |terms| shard partitions (``shard = hash60(term) % n_shards``
    derived driver-side) and only the query terms' block rows inside
    them; everything else never leaves parquet.

    ``doc_map`` is (doc_key long, doc_id string). Two keying modes:

    - ``dense_keys=False``: doc_key is ``term_hash60(doc_id)`` (no
      dimension table needed — test/ad-hoc mode). The map joins the
      candidate postings BEFORE scoring, because tie-breaking needs the
      doc_id string and hash keys don't preserve its order. Collisions
      at 60 bits merge postings of distinct docs — detectable by
      comparing count(distinct doc_key) to count(distinct doc_id).
    - ``dense_keys=True`` (the warehouse/at-scale path): doc_key is the
      dense ``doc_idx`` from build_doc_dim, which is assigned in GLOBAL
      doc_id sort order — so (score desc, doc_key asc) is the same total
      order as (score desc, doc_id asc) and scoring can run entirely on
      long keys. doc_map is then joined AFTER top-k against the
      n_buckets*k kernel output (broadcast k-row side): the corpus-sized
      map never enters the per-query shuffle, which is the only join
      shape that survives 10^12 docs. Requires the vectorized kernel.

    ``meta_cache``: optional dict owned by the caller, mapping term ->
    its block-metadata rows. A serving node queries the same shards
    frame repeatedly; without the cache every query pays one extra
    driver job just to fetch the (tiny) per-term block metadata for
    skip planning. With it, only first-seen terms are collected — the
    in-memory term dictionary every native engine keeps, made explicit.
    The caller must drop the dict when the shards frame is rebuilt.

    ``pr_max_key``: the meta_cache slot for the cached PageRank blend
    maximum. The per-term block rows are pagerank-INVARIANT, so a caller
    serving several PR vectors over the same shards (topic-sensitive
    blending) shares ONE cache and keys only the pr_max slot per vector
    (e.g. ``_PR_MAX_KEY + ":" + topic``) — a stale pr_max under a
    different vector would break skip-planner admissibility, while
    duplicating the term metadata per vector just wastes fetches. Must
    start with NUL so it can never shadow a term's entry.
    """
    from collections import Counter

    from .compression import decode_shards, prune_shards

    if cfg.scorer != "bm25":
        raise ValueError("shard-backed WAND requires bm25 impact weights")
    k = k or cfg.top_k
    if not query_terms:
        return spark.createDataFrame(
            [], "doc_id string, title_rank double, body_rank double, "
            "pagerank double, score double"
        )
    counts = Counter(query_terms)
    if dense_keys and "top_weights" not in shards.columns:
        # without block metadata the hash-vs-dense key-mode mismatch guard
        # below can't run, and a mismatched doc_map would silently return
        # an empty result — refuse loudly instead. Every shard frame
        # build_posting_shards produces carries these columns.
        raise ValueError(
            "dense_keys=True requires the block-metadata columns "
            "(top_doc_keys/top_weights) so the key-mode guard can run; "
            "this shards frame lacks them"
        )
    term_list = sorted(counts)
    pruned = prune_shards(shards, term_list, cfg)

    meta = None
    if "top_weights" in pruned.columns:
        # block-max skipping BEFORE decode: read ONLY the block metadata
        # columns (parquet column pruning — the varbyte payloads stay on
        # disk), derive an exact threshold from the per-block top-N
        # samples, and decode only blocks whose upper bound can beat it.
        meta_cols = [
            "term", "field", "salt", "max_weight",
            "top_doc_keys", "top_weights",
        ]
        if meta_cache is None:
            meta = pruned.select(*meta_cols).collect()
        else:
            missing = [t for t in term_list if t not in meta_cache]
            if missing:
                m_pruned = prune_shards(shards, missing, cfg)
                fetched: dict[str, list] = {t: [] for t in missing}
                for r in m_pruned.select(*meta_cols).collect():
                    fetched[r["term"]].append(r)
                meta_cache.update(fetched)
            meta = [r for t in term_list for r in meta_cache.get(t, [])]
        extra_ub = 0.0
        if pagerank is not None:
            # cache the PR blend maximum alongside the term metadata —
            # without this every blended query pays one driver aggregation
            # even on the repeat-query path the meta_cache exists for. The
            # reserved key can't collide: the tokenizer never emits NUL.
            if not pr_max_key.startswith("\x00"):
                raise ValueError("pr_max_key must start with NUL")
            if meta_cache is not None and pr_max_key in meta_cache:
                pr_max = meta_cache[pr_max_key]
            else:
                pr_max = pagerank.agg(F.max("rank")).first()[0]
                if meta_cache is not None:
                    meta_cache[pr_max_key] = pr_max
            extra_ub = cfg.w_pagerank * cfg.blend_scale * float(pr_max or 0.0)
        qtf_map = {t: float(counts[t]) for t in term_list}
        keep = select_blocks(meta, cfg, qtf_map, k, extra_ub)
        if two_phase and meta:
            # wave 1: the single highest-impact block per (term, field)
            best: dict[tuple[str, str], tuple[float, int]] = {}
            for r in meta:
                key = (r["term"], r["field"])
                if key not in best or float(r["max_weight"]) > best[key][0]:
                    best[key] = (float(r["max_weight"]), int(r["salt"]))
            w1_keys = [
                f"{t}\x01{f}\x01{s}"
                for (t, f), (_w, s) in sorted(best.items())
            ]
            qdf1 = spark.createDataFrame(
                [(t, qtf_map[t]) for t in term_list], "term string, qtf double"
            )
            fw1 = (
                F.when(F.col("field") == FIELD_TITLE, F.lit(cfg.w_title))
                .when(F.col("field") == FIELD_BODY, F.lit(cfg.w_body))
                .otherwise(F.lit(0.0))
            )
            d1 = decode_shards(
                pruned.filter(
                    F.concat_ws(
                        "\x01", "term", "field", F.col("salt").cast("string")
                    ).isin(w1_keys)
                ),
                fields=("weight",),
            )
            rows1 = (
                d1.join(F.broadcast(qdf1), "term")
                .groupBy("doc_key")
                .agg(
                    F.sum(
                        fw1 * F.col("weight") * F.col("qtf")
                        * F.lit(cfg.blend_scale)
                    ).alias("s")
                )
                .orderBy(F.desc("s"))
                .limit(k)
                .collect()
            )
            if len(rows1) == k:
                # exact partial scores are lower bounds (PR and undecoded
                # blocks only add non-negative mass)
                keep = select_blocks(
                    meta, cfg, qtf_map, k, extra_ub,
                    min_threshold=float(rows1[-1]["s"]),
                )
        LAST_SKIP_STATS["total"] = len(meta)
        LAST_SKIP_STATS["kept"] = len(keep)
        if len(keep) < len(meta):
            keep_keys = [f"{t}\x01{f}\x01{s}" for t, f, s in sorted(keep)]
            pruned = pruned.filter(
                F.concat_ws(
                    "\x01", "term", "field", F.col("salt").cast("string")
                ).isin(keep_keys)
            )

    # term-bag scoring needs ONLY the precomputed impact weights: skip
    # the tf/positions varbyte decode and their Arrow transfer entirely
    decoded = decode_shards(pruned, fields=("weight",))
    qdf = spark.createDataFrame(
        [(t, i, float(counts[t])) for i, t in enumerate(term_list)],
        "term string, qterm_id int, qtf double",
    )
    if dense_keys:
        # loud guard for the silent-empty failure mode: shards built
        # with 60-bit hash keys joined against a dense doc_map match
        # nothing. The block-metadata samples are already on the driver;
        # dense doc_idx values are < n_docs while hash keys are uniform
        # in [0, 2^60) — a sampled key past 2^44 (~17T docs) cannot be a
        # dense index this engine targets.
        if meta is not None:
            sampled = [
                dk for r in meta for dk in (r["top_doc_keys"] or [])
            ]
            if sampled and max(sampled) >= (1 << 44):
                raise ValueError(
                    "dense_keys=True but the shards' doc_keys look like "
                    "60-bit hash keys (sampled key >= 2^44) — build the "
                    "shards with doc_dim= and pass the matching dense "
                    "doc_map, or drop dense_keys"
                )
        # score on the dense long keys; hydrate doc_id strings after top-k
        hits = decoded.join(F.broadcast(qdf), "term").select(
            F.col("doc_key").alias("doc_id"), "field", "qterm_id", "qtf",
            F.col("weight").alias("contrib"),
        )
        pr_keyed = None
        if pagerank is not None:
            # at 10^12 docs store PR doc_key-keyed at build time; this
            # remap is the ad-hoc equivalent
            pr_keyed = pagerank.join(doc_map, "doc_id").select(
                F.col("doc_key").alias("doc_id"), "rank"
            )
        ranked = _wand_from_hits(
            spark, hits, len(counts), cfg, k, n_buckets, pr_keyed, kernel
        ).withColumnRenamed("doc_id", "doc_key")
        return (
            doc_map.join(F.broadcast(ranked), "doc_key")
            .select("doc_id", "title_rank", "body_rank", "pagerank", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    hits = (
        decoded.join(F.broadcast(qdf), "term")
        .join(doc_map, "doc_key")
        .select(
            "doc_id", "field", "qterm_id", "qtf",
            F.col("weight").alias("contrib"),
        )
    )
    return _wand_from_hits(
        spark, hits, len(counts), cfg, k, n_buckets, pagerank, kernel
    )


def build_doc_map(corpus: DataFrame) -> DataFrame:
    """(doc_key, doc_id) dimension for shard-backed queries."""
    from ..functions.hashing import term_hash60_col

    return corpus.select(
        term_hash60_col("doc_id").alias("doc_key"), "doc_id"
    ).distinct()
