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
  3. each bucket independently computes its exact local top-k with a
     single branchless numpy bincount scatter-add over the
     Arrow-resident bucket + k-th-score partition (see
     _score_bucket_vectorized for why this beats pointer-chasing once
     the data is in memory). The classic per-row document-at-a-time
     heap kernel lives in tests/daat_reference.py ONLY — a parity
     oracle, deliberately unreachable from any production path (the
     engine ships no per-row Python kernel); tests inject it via the
     ``kernel`` callable parameter and cross-assert both against the
     exhaustive scorer;
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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT, EngineConfig
from .bm25 import posting_hits
from .index_build import FIELD_BODY, FIELD_TITLE, Index

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
    The classic DAAT heap kernel survives only as the test-side parity
    oracle (tests/daat_reference.py) — both are exact and asserted
    equal to the exhaustive scorer in tests."""

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
    kernel="taat",
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
    from ..functions.smalldf import tiny_df

    qdf = tiny_df(
        spark,
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
    kernel="taat",
    shuffle_parts: int | None = None,
) -> DataFrame:
    """Shared tail of the WAND paths: ``hits`` must carry
    (doc_id, field, qterm_id, qtf, contrib). ``shuffle_parts`` (shard
    path) sizes the bucket-kernel exchange from the planner-known decode
    volume — an explicit repartition by doc_bucket that the groupBy
    reuses (one exchange, exact task count) instead of the session-wide
    shuffle-partition default."""
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
    if callable(kernel):
        # an injected reference kernel (tests/daat_reference.py) walks
        # document-at-a-time and needs ONE cursor per (doc, qterm): a
        # doc can hit the same query term in BOTH fields, so collapse
        # first. The vectorized kernel's scatter-add collapses
        # duplicates natively, so the production path skips this whole
        # shuffle — posting rows flow straight into the bucket
        # partitioning (halves the query path's shuffle volume).
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
    if shuffle_parts is not None:
        # explicit partition count (clamped to n_buckets by the caller):
        # hash-partitioning on the grouping key with a known count, so
        # the groupBy below adds NO second exchange and AQE has nothing
        # to coalesce — the kernel stage runs exactly this many tasks
        bucketed = bucketed.repartition(shuffle_parts, "doc_bucket")
    long_keys = dict(hits.dtypes).get("doc_id") == "bigint"
    if callable(kernel):
        # parity-test injection point; reference kernels tie-break on
        # string doc_ids, so dense long keys are refused loudly
        if long_keys:
            raise ValueError(
                "injected reference kernels tie-break on string doc_ids; "
                "dense long keys require the vectorized kernel"
            )
        bucket_kernel = kernel(cfg, k)
    elif kernel == "taat":
        bucket_kernel = _score_bucket_vectorized(k)
    else:
        raise ValueError(
            "only the vectorized kernel ships in the engine; pass a "
            "callable (cfg, k) -> (pdf -> pdf) factory to inject a "
            "reference kernel (see tests/daat_reference.py)"
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
# the skip planner kept vs saw (tests assert kept < total on skewed
# data), the doc-level candidate count (-1 = pruning not admissible),
# whether the exact-floor wave ran / was served from the floor cache,
# and the DECODE VOLUME the plan implies (kept_df = summed df of kept
# blocks vs total_df of all query-term blocks) — the metric that scales
# with the corpus, unlike local wall-clock
LAST_SKIP_STATS: dict[str, int] = {
    "total": 0, "kept": 0, "cand_docs": -1, "two_phase": 0,
    "floor_cached": 0, "total_df": 0, "kept_df": 0,
    "total_ranges": 0, "kept_ranges": 0, "decoded_df": 0,
}

# reserved meta_cache key for the cached PageRank blend maximum (terms
# never contain NUL, so this cannot shadow a term's metadata entry)
_PR_MAX_KEY = "\x00pr_max"


_I64_MIN = np.iinfo(np.int64).min
_I64_MAX = np.iinfo(np.int64).max


def _row_ranges(r) -> tuple | None:
    """(range_bounds, range_maxw) off a metadata row, or None when the
    row predates the range-aligned schema (pre-round-5 shard frames)."""
    try:
        rb, rm = r["range_bounds"], r["range_maxw"]
    except (ValueError, KeyError):
        return None
    if rb is None or rm is None or len(rb) != len(rm) + 1:
        return None
    return rb, rm


def _plan_df(meta_rows: list, keep: set | None) -> int:
    """Summed df of the metadata rows in ``keep`` (all rows when None) —
    the posting volume a plan implies, used both for the two-phase auto
    decision and the decode-volume telemetry. Rows predating the df
    column count as 0."""
    total = 0
    for r in meta_rows:
        if keep is not None and (
            r["term"], r["field"], int(r["salt"]),
        ) not in keep:
            continue
        try:
            total += int(r["df"] or 0)
        except (ValueError, KeyError):
            pass
    return total


def select_blocks(
    meta_rows: list,
    cfg: EngineConfig,
    qtf: dict[str, float],
    k: int,
    extra_ub: float = 0.0,
    min_threshold: float | None = None,
) -> set[tuple[str, str, int]]:
    """Back-compat wrapper: the kept-block set from plan_blocks."""
    return plan_blocks(meta_rows, cfg, qtf, k, extra_ub, min_threshold)[0]


def _range_counts(df: int, n_sub: int) -> np.ndarray:
    """Posting count of each equi-depth sub-range of a df-posting block
    (the encoder's chunking formula, compression._encode_blocks):
    chunk i covers sorted positions [i*df//n_sub, (i+1)*df//n_sub)."""
    edges = (np.arange(n_sub + 1, dtype=np.int64) * df) // n_sub
    return np.diff(edges)


def plan_blocks(
    meta_rows: list,
    cfg: EngineConfig,
    qtf: dict[str, float],
    k: int,
    extra_ub: float = 0.0,
    min_threshold: float | None = None,
) -> tuple:
    """Block-max skip planner (driver-side, pure): given undecoded block
    metadata rows (term, field, salt, df, max_weight, top_doc_keys,
    top_weights, range_bounds, range_maxw), return

      (keep, threshold, candidate_doc_keys, keep_ranges)

    - ``keep``: the (term, field, salt) blocks that must be decoded for
      an EXACT top-k;
    - ``threshold``: the admissible lower bound on the true k-th score
      the planner derived (None when the samples can't produce one);
    - ``candidate_doc_keys``: when DOC-level pruning is admissible (see
      below), the sorted doc_key list that provably contains every
      top-k doc — the caller may then restrict the varbyte decode to
      those keys; None otherwise.
    - ``keep_ranges``: {(term, field, salt) -> (n_sub, kept chunk
      indices)} for kept blocks whose decode can drop at least one
      sub-range — ``n_sub`` is the chunk count the block was ENCODED
      with (len of its range_maxw), which the decode needs to map the
      positional indices exactly (see the range-pruning note at the
      keep loop); blocks absent from the dict decode whole.

    Threshold: each block's top-N (doc_key, weight) sample yields partial
    blended scores per doc (a lower bound of the doc's full score, since
    contributions are non-negative); T = k-th largest partial.

    Doc-range-aligned bound: a doc in sub-range i of block B (doc_key in
    [bounds[i], bounds[i+1]]) scores at most B's sub-range max, plus for
    every OTHER (term, field) group the max over that group's sub-range
    triples whose key interval INTERSECTS [bounds[i], bounds[i+1]] (the
    doc's posting in that group, if any, lies inside such a triple), plus
    ``extra_ub`` (e.g. the PageRank blend maximum). B is skippable iff
    that bound is strictly below T for EVERY sub-range: each of its docs
    then provably misses the top-k, so dropping their contributions
    cannot corrupt it (top-k docs appear only in kept blocks, so their
    scores stay exact). Strict inequality keeps tie-on-T blocks. This is
    what makes multi-term skipping bite: the admissible cross-term bound
    uses a term's max within ~1/16th of the doc space — typically its
    bulk high weight — instead of its single global outlier. A row
    without range metadata degrades to one (-inf, +inf, max_weight)
    triple, which reproduces the round-4 global-maxima bound exactly.

    Doc-level candidate pruning (the at-scale complement of block
    skipping): a block with df <= BLOCK_SAMPLE_N is SAMPLE-COMPLETE —
    its top-N sample IS its whole posting list — and a (term, field)
    group all of whose blocks are complete contributes ZERO to any doc
    outside the sampled keys. So a doc appearing in NO block's sample
    scores at most U_out = sum over the INCOMPLETE groups of the max,
    over each group's incomplete blocks, of the block's MINIMUM sampled
    blended weight, + extra_ub (admissible because samples are each
    block's top-N postings by weight and salt assigns a doc's posting
    in a group to exactly one block — an unsampled doc therefore sits
    under some incomplete block's sample minimum, which is far below
    the hot term's global max_weight). When U_out < threshold, every top-k doc is
    provably among the sampled keys, and the decode can drop all other
    postings: computed scores stay exact for candidates (only
    non-candidate rows are dropped, and block skipping already
    guarantees top-k docs live in kept blocks), and a dropped doc's
    true score < threshold <= true k-th, so it cannot displace anyone.
    This is what pays on the rare-term + hot-term bag — the dominant
    shape where block granularity is too coarse (every hot block spans
    the whole doc space) but the candidate set is tiny: decode, Arrow
    transfer, and the bucket shuffle then scale with |candidates|, not
    with the hot term's df.

    Intervals are int64 end-to-end — 60-bit hash keys are not exactly
    representable in float64, and a boundary off by 2^60*eps could
    silently drop a true overlap (inadmissible)."""
    from .compression import BLOCK_SAMPLE_N
    fw = {FIELD_TITLE: cfg.w_title, FIELD_BODY: cfg.w_body}

    def factor(field: str, term: str) -> float:
        return fw.get(field, 0.0) * qtf.get(term, 0.0) * cfg.blend_scale

    # threshold from the per-block top-N samples + per-group blended
    # sub-range triples (lo, hi, max) for the range-aware cross bound
    partials: dict[int, float] = {}
    tri: dict[tuple[str, str], tuple[list, list, list]] = {}
    unsampled_ub: dict[tuple[str, str], float] = {}
    incomplete: set[tuple[str, str]] = set()
    for r in meta_rows:
        f = factor(r["field"], r["term"])
        key = (r["term"], r["field"])
        ub = float(r["max_weight"]) * f
        try:
            df = r["df"]
        except (ValueError, KeyError):
            df = None
        if df is None or int(df) > BLOCK_SAMPLE_N:
            incomplete.add(key)
            # samples are the block's top-N postings BY WEIGHT
            # (compression.py argsort(-weights)[:N]), so a doc NOT in
            # this block's sample weighs at most the sample's minimum —
            # a much tighter unsampled-doc bound than max_weight. Salt
            # partitions a (term, field) group by doc, so an unsampled
            # doc's posting lives in exactly one (necessarily
            # incomplete) block: bound the group by the max over its
            # incomplete blocks' sample minima.
            tw = r["top_weights"] or []
            blk_ub = (
                float(min(tw)) * f if len(tw) >= BLOCK_SAMPLE_N else ub
            )
            if blk_ub > unsampled_ub.get(key, 0.0):
                unsampled_ub[key] = blk_ub
        for dk, w in zip(r["top_doc_keys"] or [], r["top_weights"] or []):
            partials[dk] = partials.get(dk, 0.0) + float(w) * f
        los, his, ms = tri.setdefault(key, ([], [], []))
        rng = _row_ranges(r)
        if rng is not None:
            rb, rm = rng
            los.extend(rb[:-1])
            his.extend(rb[1:])
            ms.extend(float(m) * f for m in rm)
        else:
            los.append(_I64_MIN)
            his.append(_I64_MAX)
            ms.append(ub)
    if len(partials) < k:
        if min_threshold is None:
            keep_all = {
                (r["term"], r["field"], int(r["salt"])) for r in meta_rows
            }
            return keep_all, None, None, {}
        threshold = min_threshold
    else:
        threshold = sorted(partials.values(), reverse=True)[k - 1]
        # an externally supplied EXACT lower bound (the two-phase
        # planner's k-th wave-1 partial score) can only tighten the
        # sample-derived threshold — both are lower bounds on the true
        # k-th score, so max() preserves admissibility
        if min_threshold is not None and min_threshold > threshold:
            threshold = min_threshold

    tri_np = {
        key: (
            np.asarray(los, dtype=np.int64),
            np.asarray(his, dtype=np.int64),
            np.asarray(ms, dtype=np.float64),
        )
        for key, (los, his, ms) in tri.items()
    }
    others_of: dict[tuple[str, str], list] = {
        key: [v for g, v in tri_np.items() if g != key] for key in tri_np
    }

    keep: set[tuple[str, str, int]] = set()
    # RANGE-level pruning (finer than block-level): the per-sub-range
    # bound computed below bounds the TOTAL score of every doc whose
    # posting lies in that sub-range — so a sub-range with bound < T can
    # be dropped from the decode even when its BLOCK is kept (some other
    # sub-range beats T). Exactness argument is the block one, applied
    # per range: a true top-k doc t with a posting in range i of block B
    # has bound(B,i) >= t's true score >= true k-th >= T, so all of t's
    # postings live in kept ranges and its computed score stays exact;
    # a doc with any dropped posting has total score < T <= true k-th
    # and cannot displace anyone. keep_ranges[(term, field, salt)] lists
    # the kept equi-depth chunk indices for kept blocks that shed at
    # least one range (absent = decode the whole block).
    keep_ranges: dict[tuple[str, str, int], tuple[int, list[int]]] = {}
    # float-noise slack: the wave-1 floor and the sample partials are
    # computed with Spark-side association ((fw*w)*qtf)*bs while the
    # bounds here multiply rm*((fw*qtf)*bs) — a few ULPs apart. A true
    # k-th doc whose own sub-range max IS its weight could otherwise
    # fall a hair below an exact floor and be pruned. Relative 1e-9 is
    # ~1e7 ULPs of headroom and costs nothing measurable in pruning.
    thr_eps = threshold - abs(threshold) * 1e-9
    # a union-of-segments frame carries multiple block rows per
    # (term, field, salt); positional chunk indices are only meaningful
    # against the one block they were planned from, so range pruning is
    # disabled for duplicated keys (block-level keep stays correct: it
    # is a set union over rows)
    from collections import Counter as _Counter

    bkey_counts = _Counter(
        (r["term"], r["field"], int(r["salt"])) for r in meta_rows
    )
    for r in meta_rows:
        key = (r["term"], r["field"])
        f = factor(r["field"], r["term"])
        rng = _row_ranges(r)
        if rng is not None:
            rb, rm = rng
            subs = [
                (int(rb[i]), int(rb[i + 1]), float(rm[i]) * f, i)
                for i in range(len(rm))
            ]
        else:
            subs = [(_I64_MIN, _I64_MAX, float(r["max_weight"]) * f, -1)]
        others = others_of[key]
        kept_subs: list[int] = []
        for lo, hi, m, i in subs:
            bound = m + extra_ub
            for los, his, ms in others:
                sel = (his >= lo) & (los <= hi)
                if sel.any():
                    bound += float(ms[sel].max())
            if bound >= thr_eps:
                kept_subs.append(i)
        if kept_subs:
            bkey = (r["term"], r["field"], int(r["salt"]))
            keep.add(bkey)
            if (
                rng is not None
                and len(kept_subs) < len(subs)
                and bkey_counts[bkey] == 1
            ):
                # carry the block's OWN chunk count (len(range_maxw))
                # so the decode maps indices with the n_sub this block
                # was encoded with, never a module constant that may
                # have changed between build and serve
                keep_ranges[bkey] = (len(subs), kept_subs)

    # doc-level candidate pruning: admissible iff any unsampled doc's
    # best case (incomplete groups' maxima + PR mass) provably misses
    # the threshold
    cand: list[int] | None = None
    # .get: a group whose blended factor is 0 (e.g. w_title=0 body-only
    # ranking) lands in `incomplete` with bound 0.0, which the `>` guard
    # above never inserted — its contribution to u_out is rightly zero
    u_out = sum(unsampled_ub.get(g, 0.0) for g in incomplete) + extra_ub
    if u_out < thr_eps:
        cand = sorted(
            {dk for r in meta_rows for dk in (r["top_doc_keys"] or [])}
        )
    return keep, threshold, cand, keep_ranges


def wand_topk_from_shards(
    spark: SparkSession,
    shards: DataFrame,
    doc_map: DataFrame,
    query_terms: list[str],
    cfg: EngineConfig = DEFAULT,
    k: int | None = None,
    n_buckets: int = 16,
    pagerank: DataFrame | None = None,
    kernel="taat",
    dense_keys: bool = False,
    meta_cache: dict | None = None,
    two_phase: bool | str = False,
    pr_max_key: str = _PR_MAX_KEY,
) -> DataFrame:
    """Exact top-k straight from the compressed posting shards: pruned
    shard scan -> varbyte decode (mapInPandas) -> block-max WAND.

    ``two_phase=True`` refines the skip threshold with one extra
    distributed round: decode ONLY the sampled docs' postings (the
    planner's candidate filter over every query-term block), score them
    EXACTLY, and use the k-th best exact score — a lower bound on the
    true k-th result (PageRank mass is omitted and only adds) — as a
    floor for the planner threshold. The single-phase threshold sums
    per-block sample PARTIALS, which miss a doc's contributions from
    blocks where it wasn't sampled; wave 1 restores them, so its floor
    dominates both the old best-block-per-group wave and the sample
    partials. Multi-term bags skip little without it (the admissible
    cross-term bound needs a near-true k-th to bite — measured on the
    Zipf hot bag: threshold 0.46 vs true 0.508 is the difference
    between keeping 46/48 and ~2/3 of that). Costs one extra job per
    query whose decode re-reads the key streams but transfers only
    |samples| rows, so it's opt-in: right for long posting lists at
    scale, wrong for latency-bound tiny corpora. Exactness argument is
    plan_blocks', unchanged: both thresholds are lower bounds on the
    true k-th score. ``two_phase="auto"`` lets the planner decide per
    query: the wave runs only when the single-phase plan would decode
    at least ``cfg.two_phase_auto_min_postings`` postings (the kept
    blocks' summed df, already on the driver) — the serving facade's
    default, so tiny corpora never pay the extra job and long posting
    lists always get the tighter plan. The decision is recorded in
    ``LAST_SKIP_STATS["two_phase"]``. When ``meta_cache`` is supplied the
    wave-1 floor is cached beside the term metadata keyed by (bag, k,
    field/blend weights) — the floor is a deterministic, PR-independent
    function of the shards frame, the bag, and the cfg's scoring
    weights, so a REPEAT query reuses it, plans with the near-oracle
    threshold, and skips the wave's extra job entirely
    (``LAST_SKIP_STATS["floor_cached"]``); invalidation rides the
    existing meta_cache contract (drop the dict when shards change).

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

    cand_keys = None
    q_parts = None
    # block-max skipping BEFORE decode: read ONLY the block metadata
    # columns (parquet column pruning — the varbyte payloads stay on
    # disk), derive an exact threshold from the per-block top-N
    # samples, and decode only blocks whose upper bound can beat it.
    # (term_block_meta degrades to None on pre-metadata shard frames —
    # the planner then decodes everything, as before.)
    from .compression import term_block_meta

    meta = term_block_meta(shards, term_list, cfg, meta_cache)
    if meta is not None:
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
        # exact-floor cache: the wave-1 floor is a pure function of
        # (shards, bag, k) AND the scoring weights the wave multiplies
        # in (w_title/w_body/blend_scale — so those are part of the
        # key: a floor computed under heavier field weights would be an
        # INADMISSIBLE threshold for a lighter cfg sharing the cache).
        # PR-independent (wave scores omit PR mass). A serving node
        # sees the same hot bags over and over; caching the floor
        # beside the term metadata gives repeat queries the near-oracle
        # two-phase plan at single-phase cost (zero extra jobs). The
        # cache dies with meta_cache, which the caller must drop
        # whenever the shards frame changes — exactly the invalidation
        # the floor needs for admissibility.
        floor_key = (
            "\x00floor:" + repr((
                tuple(sorted(qtf_map.items())), k,
                cfg.w_title, cfg.w_body, cfg.blend_scale,
            ))
            if meta_cache is not None
            else None
        )
        cached_floor = (
            meta_cache.get(floor_key) if floor_key is not None else None
        )
        LAST_SKIP_STATS["floor_cached"] = int(cached_floor is not None)
        keep, _thr, cand_keys, keep_ranges = plan_blocks(
            meta, cfg, qtf_map, k, extra_ub, min_threshold=cached_floor
        )
        if cached_floor is not None:
            # the cached floor IS what the wave would recompute — same
            # shards, same bag, same k — so the wave adds nothing
            run_wave = False
        elif two_phase == "auto":
            # decide from the plan itself: the kept blocks' total df IS
            # the decode volume the exact-floor wave can cut, and it is
            # already on the driver — no extra action. Below the
            # threshold the wave's fixed job cost dominates any saving
            # (the measured local regime); above it, skipped posting
            # volume grows with the corpus while the wave cost stays
            # O(|samples| x |groups|). When DOC-level candidate pruning
            # is already admissible, phase 2 scales with |candidates|
            # regardless of kept blocks — the wave would be a strictly
            # wasteful extra decode pass, so skip it.
            run_wave = (
                cand_keys is None
                and _plan_df(meta, keep) >= cfg.two_phase_auto_min_postings
            )
        elif isinstance(two_phase, str):
            # loud guard: "Auto"/"off"/any other string would silently
            # bool() to True — enabling the wave a caller tried to
            # disable is the worst possible misread
            raise ValueError(
                f"two_phase={two_phase!r}: expected True, False, or 'auto'"
            )
        else:
            run_wave = bool(two_phase)
        LAST_SKIP_STATS["two_phase"] = int(run_wave)
        if run_wave and meta:
            # wave 1: exact scores for every SAMPLED doc — decode all
            # query-term blocks restricted to the sample-union keys, so
            # each sampled doc's cross-term score is complete (vs the
            # single-phase partials, which miss a doc's weight in blocks
            # where it wasn't sampled). Arrow transfer and aggregation
            # are O(|samples| * |groups|), never posting-volume.
            sample_keys = sorted(
                {dk for r in meta for dk in (r["top_doc_keys"] or [])}
            )
            from ..functions.smalldf import tiny_df as _tiny

            qdf1 = _tiny(
                spark,
                [(t, qtf_map[t]) for t in term_list],
                "term string, qtf double",
            )
            fw1 = (
                F.when(F.col("field") == FIELD_TITLE, F.lit(cfg.w_title))
                .when(F.col("field") == FIELD_BODY, F.lit(cfg.w_body))
                .otherwise(F.lit(0.0))
            )
            d1 = decode_shards(
                pruned, fields=("weight",), doc_keys=sample_keys
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
                floor = float(rows1[-1]["s"])
                if floor_key is not None:
                    meta_cache[floor_key] = floor
                keep, _thr, cand_keys, keep_ranges = plan_blocks(
                    meta, cfg, qtf_map, k, extra_ub, min_threshold=floor
                )
        LAST_SKIP_STATS["total"] = len(meta)
        LAST_SKIP_STATS["kept"] = len(keep)
        LAST_SKIP_STATS["total_df"] = _plan_df(meta, None)
        LAST_SKIP_STATS["kept_df"] = _plan_df(meta, keep)
        # range-level telemetry: sub-ranges kept vs total, and the
        # DECODED posting volume after range pruning — the number that
        # scales with the corpus (equi-depth chunk counts derived from
        # each block's df, matching the decode's positional filter)
        n_rng = n_rng_kept = rng_df = 0
        for r in meta:
            rngs = _row_ranges(r)
            n_sub = len(rngs[1]) if rngs is not None else 1
            n_rng += n_sub
            bkey = (r["term"], r["field"], int(r["salt"]))
            if bkey not in keep:
                continue
            try:
                df_r = int(r["df"] or 0)
            except (ValueError, KeyError):
                df_r = 0
            sel = keep_ranges.get(bkey)
            if sel is None or rngs is None:
                n_rng_kept += n_sub
                rng_df += df_r
            else:
                n_rng_kept += len(sel[1])
                rng_df += int(_range_counts(df_r, sel[0])[sel[1]].sum())
        LAST_SKIP_STATS["total_ranges"] = n_rng
        LAST_SKIP_STATS["kept_ranges"] = n_rng_kept
        LAST_SKIP_STATS["decoded_df"] = rng_df
        LAST_SKIP_STATS["cand_docs"] = (
            len(cand_keys) if cand_keys is not None else -1
        )
        if len(keep) < len(meta):
            keep_keys = [f"{t}\x01{f}\x01{s}" for t, f, s in sorted(keep)]
            pruned = pruned.filter(
                F.concat_ws(
                    "\x01", "term", "field", F.col("salt").cast("string")
                ).isin(keep_keys)
            )
        # scale-adaptive task sizing (guide §2.2): the planner knows the
        # decode volume, so size the decode stage and the bucket-kernel
        # shuffle from it — tiny queries collapse to 1-2 tasks per stage
        # (per-task scheduling + Python round-trips dominate them), hot
        # queries over long posting lists fan out, from the same rule.
        vol = rng_df
        if cand_keys is not None:
            n_groups = len({(r["term"], r["field"]) for r in meta})
            vol = min(vol, len(cand_keys) * max(n_groups, 1))
        target = max(int(cfg.query_target_postings_per_task), 1)
        q_parts = max(1, min(-(-vol // target), n_buckets))
        # coalesce is narrow (no shuffle) and only ever shrinks: kept
        # blocks spread over scan partitions merge into ~q_parts decode
        # tasks instead of one near-empty Python task per partition
        pruned = pruned.coalesce(int(q_parts))

    # term-bag scoring needs ONLY the precomputed impact weights: skip
    # the tf/positions varbyte decode and their Arrow transfer entirely;
    # when the planner proved doc-level pruning admissible, only the
    # candidate postings survive the decode (everything downstream —
    # Arrow, bucket shuffle, kernel — scales with |candidates|), and
    # kept blocks additionally shed their provably-sub-threshold
    # sub-ranges (range-level pruning — see plan_blocks)
    decoded = decode_shards(
        pruned, fields=("weight",), doc_keys=cand_keys,
        key_ranges=(keep_ranges or None) if meta is not None else None,
    )
    from ..functions.smalldf import tiny_df

    qdf = tiny_df(
        spark,
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
            spark, hits, len(counts), cfg, k, n_buckets, pr_keyed, kernel,
            shuffle_parts=q_parts,
        ).withColumnRenamed("doc_id", "doc_key")
        return (
            doc_map.join(F.broadcast(ranked), "doc_key")
            .select("doc_id", "title_rank", "body_rank", "pagerank", "score")
            # limit(k) is a no-op on the <=k joined rows but turns the
            # final global sort into TakeOrderedAndProject (no range-
            # partitioning sampling pass)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
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
        spark, hits, len(counts), cfg, k, n_buckets, pagerank, kernel,
        shuffle_parts=q_parts,
    )


def build_doc_map(corpus: DataFrame) -> DataFrame:
    """(doc_key, doc_id) dimension for shard-backed queries."""
    from ..functions.hashing import term_hash60_col

    return corpus.select(
        term_hash60_col("doc_id").alias("doc_key"), "doc_id"
    ).distinct()
