"""Engine configuration.

Scoring semantics follow the reference's retrieval pipeline
(/root/reference/retrieval/get_metadata.go:53-69 — field-weighted blend
(0.33*pagerank + 0.38*title + 0.29*body)*100) with BM25 term weighting as
the primary scorer per the north rule; ``tfidf_cosine`` mode reproduces
the reference's normalized tf-idf cosine exactly
(/root/reference/indexer/indexer.go:362, ranking/term_weighting.go:37).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # BM25 parameters (north-rule primary scorer)
    k1: float = 1.2
    b: float = 0.75
    # scorer: "bm25" | "tfidf_cosine" (reference-exact mode)
    scorer: str = "bm25"

    # blend weights, reference get_metadata.go:69: (0.33 PR + 0.38 title + 0.29 body)*100
    w_pagerank: float = 0.33
    w_title: float = 0.38
    w_body: float = 0.29
    blend_scale: float = 100.0

    # top-k (reference main_retrieve.go:99-103)
    top_k: int = 50

    # PageRank (reference cmd/crawl/start_crawl.go:175)
    damping: float = 0.75
    pr_epsilon: float = 1e-8  # reference uses 1e-20; unreachable in float64 at scale
    pr_max_iters: int = 30
    # ranks are tiny next to the corpus; checkpointing every iteration
    # bounds lineage AND feeds the per-iteration convergence check for free
    pr_checkpoint_every: int = 1

    # posting shards
    n_shards: int = 32
    # hot-term salting: terms with df above this fraction of docs split
    # into `n_salts` bounded blocks — weight-QUANTILE buckets (impact-
    # ordered: block maxima decay, so block-max WAND can skip the tail),
    # falling back to doc-hash buckets per group on degenerate tied
    # weights (compression.py build_posting_shards)
    salt_df_threshold: float = 0.10
    n_salts: int = 16

    # stemming on/off (oracle SQL path runs unstemmed)
    stem: bool = True
    remove_stopwords: bool = True

    extra: dict = field(default_factory=dict)


DEFAULT = EngineConfig()
