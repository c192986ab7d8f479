"""User-facing engine facade — the reference's server surface, parity-
shaped (/root/reference/cmd/server/server.go):

  POST /query          -> SearchEngine.query(q)      (server.go:32-52)
  GET /wordlist/{pre}  -> SearchEngine.wordlist(pre) (server.go:54-85)

``query`` returns the reference's result-card fields
(retrieval/util.go:56-92 resultFormat): url-analog (repo/path), title,
score components, top-5 words, top-5 parents/children, snippet.
A user of the reference can run every query they run today through this
class; rank semantics are covered by the oracle tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT, EngineConfig
from .functions.snippets import with_snippets
from .functions.tokenize import parse_query
from .operators.bm25 import search
from .operators.index_build import Index, build_index
from .operators.links import extract_links
from .operators.pagerank import compute_pagerank
from .operators.wand import wand_topk
from .sources.corpus import ingest


@dataclass
class SearchEngine:
    spark: SparkSession
    index: Index
    cfg: EngineConfig = field(default_factory=lambda: DEFAULT)
    pagerank: DataFrame | None = None
    corpus: DataFrame | None = None  # for snippets (content column)
    links: DataFrame | None = None
    # (doc_id, category, rank) from operators.topics.compute_topic_pagerank
    topic_pagerank: DataFrame | None = None
    # compressed-warehouse serving backend (build(with_shards=True)):
    # dense-keyed posting shards + (doc_key, doc_id) map + the per-term
    # block-metadata cache a serving node keeps across queries
    shards: DataFrame | None = None
    doc_map: DataFrame | None = None
    # ONE shared cache: per-term block metadata is pagerank-invariant, so
    # every topic reuses the same term rows; only the cached PR blend
    # maximum is vector-specific (a stale pr_max under another topic's
    # vector would break skip-planner admissibility), so that slot is
    # keyed per topic (pr_max_key=_PR_MAX_KEY + ":" + topic)
    meta_cache: dict = field(default_factory=dict)
    # parquet warehouse root (build(..., warehouse_dir=...)): shards are
    # served from the partitionBy("shard") read-back frame instead of a
    # cached in-memory one — the at-scale layout (partition pruning +
    # column-pruned metadata reads; measured FASTER than the cached
    # frame at sf0.1), and the substrate the LSM maintenance methods
    # (apply_merge / refresh_stats) rewrite with dynamic partition
    # overwrite, I/O bounded by the touched shard partitions
    warehouse_dir: str | None = None
    n_docs: int = 0

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        documents: DataFrame,
        cfg: EngineConfig = DEFAULT,
        with_pagerank: bool = True,
        topics: DataFrame | None = None,
        with_shards: bool = False,
        warehouse_dir: str | None = None,
    ) -> "SearchEngine":
        """One-call build from a raw (repo, path, commit, lang, content)
        frame — the reference's ./bin/crawl analog for a static corpus.
        ``topics`` (doc_id, category) additionally builds the
        topic-sensitive PageRank artifact, enabling query(..., topic=...)
        — the working version of the reference's dead topic-probability
        blend (its computeTopicProbs is a no-op, SURVEY.md §3.1).

        ``warehouse_dir`` (implies with_shards): persist the compressed
        shards as partitionBy("shard") parquet plus the doc_map
        dimension, and SERVE from the read-back frames — queries then
        partition-prune to the query terms' shard directories and
        column-prune the block metadata off disk, and the engine gains
        the LSM maintenance methods (apply_merge / refresh_stats) that
        rewrite only touched partitions in place."""
        corpus = ingest(documents).cache()
        links = extract_links(corpus, cfg).cache()
        idx = build_index(corpus, cfg, links=links)
        pr = (
            compute_pagerank(spark, corpus, links, cfg).cache()
            if with_pagerank
            else None
        )
        tpr = None
        if topics is not None:
            from .operators.topics import compute_topic_pagerank

            tpr = compute_topic_pagerank(spark, corpus, links, topics, cfg).cache()
        shards = doc_map = None
        n_docs = 0
        if with_shards or warehouse_dir is not None:
            # warehouse-resident serving: dense-keyed compressed shards +
            # deferred doc_id hydration (cfg must be bm25 — asserted at
            # query time by the shard paths)
            from .operators.compression import build_doc_dim, build_posting_shards

            n_docs = corpus.count()
            doc_dim = build_doc_dim(corpus).cache()
            built = build_posting_shards(
                idx.postings, n_docs, cfg,
                doc_dim=doc_dim, weight_col="bm25_weight",
            )
            if warehouse_dir is not None:
                shards_path = f"{warehouse_dir}/posting_shards"
                map_path = f"{warehouse_dir}/doc_map"
                # cluster by shard before the partitioned write (guide
                # §6): without this every upstream task writes its own
                # file into every shard directory (tasks x shards tiny
                # files); clustered, each directory holds one
                # well-sized file and a term's pruned scan opens ONE
                # file instead of dozens
                built.repartition("shard").write.mode(
                    "overwrite"
                ).partitionBy("shard").parquet(shards_path)
                doc_dim.select(
                    F.col("doc_idx").alias("doc_key"), "doc_id"
                ).write.mode("overwrite").parquet(map_path)
                # serve from the read-back frames: queries prune to the
                # terms' shard partitions and read only the metadata /
                # requested payload columns; the corpus-sized doc_map
                # stays on disk (it only ever joins the k-row output)
                shards = spark.read.parquet(shards_path)
                doc_map = spark.read.parquet(map_path)
            else:
                shards = built.cache()
                shards.count()
                doc_map = doc_dim.select(
                    F.col("doc_idx").alias("doc_key"), "doc_id"
                ).cache()
                doc_map.count()
            doc_dim.unpersist()
        return cls(
            spark=spark, index=idx, cfg=cfg, pagerank=pr, corpus=corpus,
            links=links, topic_pagerank=tpr, shards=shards, doc_map=doc_map,
            warehouse_dir=warehouse_dir, n_docs=n_docs,
        )

    # ------------------------------------------------------------------
    def _hydration_meta(self) -> DataFrame:
        """doc_meta persisted for serving. The Index holds doc_meta as a
        LAZY frame (build_doc_meta = two aggregations over the tokens
        table), so hydrating against it re-runs that pipeline on EVERY
        query — measured ~0.3 s/query at sf0.1, pure recompute. A
        serving node keeps this index table materialized (the
        reference's forward table lives in its DB); memoized by object
        identity so apply_merge's doc_meta replacement invalidates it.
        """
        from pyspark import StorageLevel

        cached = self.__dict__.get("_meta_persisted")
        if cached is not None:
            if cached is self.index.doc_meta:
                return cached
            cached.unpersist()
        dm = self.index.doc_meta.persist(StorageLevel.MEMORY_AND_DISK)
        self.__dict__["_meta_persisted"] = dm
        return dm

    # ------------------------------------------------------------------
    def query_df(
        self,
        q: str,
        k: int | None = None,
        use_wand: bool = False,
        topic: str | None = None,
        backend: str = "memory",
    ) -> DataFrame:
        """Top-k as a DataFrame (scores + metadata), snippets included
        when the corpus is attached. ``topic`` blends that category's
        PageRank vector instead of the global one (requires a build with
        topics=...). ``backend="shards"`` serves the SAME query surface
        (terms, phrases, PR/topic blend, wand, hydration, snippets) from
        the compressed posting shards — the warehouse-resident path
        (requires build(..., with_shards=True)); results are asserted
        identical to the in-memory backend in test_api."""
        k = k or self.cfg.top_k
        terms, phrases = parse_query(q, self.cfg.remove_stopwords, self.cfg.stem)
        pr = self.pagerank
        if topic is not None:
            if self.topic_pagerank is None:
                raise ValueError("topic= requires a build(..., topics=...)")
            pr = self.topic_pagerank.filter(F.col("category") == topic).select(
                "doc_id", "rank"
            )
        if backend not in ("memory", "shards"):
            raise ValueError(f"unknown backend {backend!r}")
        wandable = use_wand and not phrases and self.cfg.scorer == "bm25"
        hydrated = False
        if backend == "shards":
            if self.shards is None or self.doc_map is None:
                raise ValueError(
                    'backend="shards" requires a build(..., with_shards=True)'
                )
            if wandable:
                from .operators.wand import _PR_MAX_KEY, wand_topk_from_shards

                pr_key = (
                    _PR_MAX_KEY if topic is None else f"{_PR_MAX_KEY}:{topic}"
                )
                topk = wand_topk_from_shards(
                    self.spark, self.shards, self.doc_map, terms, self.cfg,
                    k=k, pagerank=pr, dense_keys=True,
                    meta_cache=self.meta_cache, pr_max_key=pr_key,
                    # planner decides per query whether the exact-floor
                    # wave pays (kept posting volume vs
                    # cfg.two_phase_auto_min_postings)
                    two_phase="auto",
                )
            else:
                from .operators.bm25 import search_from_shards

                topk = search_from_shards(
                    self.spark, self.shards, self.doc_map, q, self.cfg,
                    pagerank=pr, k=k, doc_meta=self._hydration_meta(),
                    skip_key_check=True,  # build() made the pair itself
                    dense_keys=True,  # build() keys by dense doc_idx
                    meta_cache=self.meta_cache,  # sizes the decode stages
                )
                hydrated = True
        elif wandable:
            topk = wand_topk(
                self.spark, self.index, terms, self.cfg, k=k, pagerank=pr
            )
        else:
            topk = search(
                self.spark, self.index, q, self.cfg,
                pagerank=pr, k=k, hydrate=True,
            )
            hydrated = True
        if not hydrated:
            # inner broadcast-left join (see bm25.search hydrate note):
            # a left join here planned SortMergeJoin over all of doc_meta
            topk = F.broadcast(topk).join(self._hydration_meta(), "doc_id")
            # limit(k): no-op on <=k rows, plans TakeOrderedAndProject
            topk = topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if self.corpus is not None:
            # broadcast build = the k-row side, stream = the corpus scan;
            # output follows the streamed side, so restore the total
            # order afterwards (k rows — a trivial sort)
            topk = F.broadcast(topk).join(
                self.corpus.select("doc_id", "content"), "doc_id"
            )
            topk = with_snippets(
                topk, "content", terms, phrases, stem=self.cfg.stem
            ).drop("content")
            topk = topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return topk

    def query(
        self,
        q: str,
        k: int | None = None,
        use_wand: bool = False,
        topic: str | None = None,
        backend: str = "memory",
    ) -> list[dict]:
        """Reference-JSON-shaped result cards (server.go:47-48 encodes
        []Rank_combined, incl. top-5 parents with their anchor terms and
        top-5 children — retrieval/util.go:56-92, get_metadata.go:237-266)."""
        rows = self.query_df(q, k, use_wand, topic=topic, backend=backend).collect()
        family: dict = {}
        if self.links is not None and rows:
            from .operators.incremental import family_top5

            ids = [r["doc_id"] for r in rows]
            # prune the edge list to the k result docs BEFORE aggregating
            # (isin pushes to the links scan; k is tiny) — children need
            # src in ids, parents need dst in ids, both lists complete
            fam_links = self.links.filter(
                F.col("src_doc").isin(ids) | F.col("dst_doc").isin(ids)
            )
            family = {
                r["doc_id"]: r.asDict(recursive=True)
                for r in family_top5(fam_links)
                .filter(F.col("doc_id").isin(ids))
                .collect()
            }
        out = []
        for rank, r in enumerate(rows, 1):
            d = r.asDict(recursive=True)
            fam = family.get(d["doc_id"], {})
            out.append(
                {
                    "rank": rank,
                    "doc_id": d["doc_id"],
                    "url": f"{d.get('repo', '')}/{d.get('path', '')}",
                    "title": d.get("path"),
                    "final_rank": d["score"],
                    "title_rank": d["title_rank"],
                    "body_rank": d["body_rank"],
                    "pagerank": d.get("pagerank", 0.0),
                    "page_size": d.get("page_size"),
                    "mod_date": d.get("commit"),
                    "top_words": d.get("top_words"),
                    "parents": fam.get("parents_anchors") or [],
                    "children": fam.get("children_top5") or [],
                    "snippet": d.get("snippet", ""),
                    "content_sha256": d.get("content_sha256"),
                }
            )
        return out

    # ------------------------------------------------------------------
    # LSM maintenance on the parquet warehouse: both methods compute the
    # touched-partitions-only frame and rewrite JUST those shard
    # directories (dynamic partition overwrite), then re-point serving
    # at the read-back frame and drop the metadata cache (its block rows
    # are stale the moment the shards change).
    # ------------------------------------------------------------------
    def _require_warehouse(self):
        if self.warehouse_dir is None or self.shards is None:
            raise ValueError(
                "LSM maintenance requires a build(..., warehouse_dir=...)"
            )

    def _overwrite_touched(self, frame, expect_shards=()) -> None:
        shards_path = f"{self.warehouse_dir}/posting_shards"
        # the touched frame READS shards_path (Spark refuses to overwrite
        # a path that feeds the writing plan): materialize it first —
        # bounded by the touched partitions, never the index
        frame = frame.localCheckpoint(eager=True)
        (
            # cluster by shard so each rewritten directory gets one
            # well-sized file (same §6 note as the initial build write)
            frame.repartition("shard")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard")
            .parquet(shards_path)
        )
        if expect_shards:
            # dynamic overwrite only rewrites partitions PRESENT in the
            # written data — a touched partition whose merged output is
            # EMPTY (tombstones deleted a shard's only term) would keep
            # serving its stale files forever. Overwrite those leaf
            # directories with an explicit zero-row parquet of the same
            # non-partition schema (<= n_shards bounded collect).
            present = {
                r["shard"]
                for r in frame.select("shard").distinct().collect()
            }
            for sid in sorted(set(expect_shards) - present):
                (
                    self.spark.createDataFrame(
                        [], frame.drop("shard").schema
                    )
                    .write.mode("overwrite")
                    .parquet(f"{shards_path}/shard={sid}")
                )
        self.shards = self.spark.read.parquet(shards_path)
        self.meta_cache.clear()

    def apply_merge(
        self, delta, delete_postings=None, new_doc_map=None,
        new_corpus=None,
    ) -> None:
        """Compact a delta shard segment (built against THIS engine's
        doc_map/doc_dim key space) into the warehouse. I/O is bounded by
        the shard partitions the delta touches; untouched blocks pass
        through undecoded (merge_posting_shards partitions_only).

        ``new_doc_map`` (doc_key, doc_id): dimension rows for docs this
        delta INTRODUCES (from compression.extend_doc_dim) — appended to
        the warehouse doc_map before the merge. Required whenever the
        delta references keys beyond the current dimension: a posting
        whose key the map cannot hydrate would otherwise be silently
        dropped from top-k output after ranking, so that case raises
        loudly instead (checked from the delta's block-metadata samples,
        no payload decode).

        ``new_corpus`` (ingested rows for the SAME new docs): extends
        the engine's card surface — doc_meta (hydration) and the
        snippet corpus — so result cards for merged-in docs don't
        silently vanish at the post-top-k joins. Without it the
        POSTINGS serve correctly but query_df's hydration (inner
        broadcast joins, deliberately: a left join would plan an SMJ
        over the corpus-sized side) drops unknown doc_ids."""
        from .functions.hashing import term_hash60_col
        from .operators.compression import merge_posting_shards

        self._require_warehouse()
        # EXACT per-block maximum doc_key: range_bounds[-1] is the last
        # (largest) key of the key-sorted block. top_doc_keys alone is
        # NOT a max-key witness — it samples the top-32 postings BY
        # WEIGHT, so a >32-posting block can reference keys beyond the
        # dimension whose weights fall below every sampled one, and the
        # guard would silently pass while those ranked rows vanish at
        # the dense-key hydration join. Fall back to the sample only for
        # pre-range-metadata frames (best effort, as before).
        if "range_bounds" in delta.columns:
            key_max = F.coalesce(
                F.element_at("range_bounds", -1),
                F.array_max("top_doc_keys"),
            )
        else:
            key_max = F.array_max("top_doc_keys")
        mx = delta.agg(F.max(key_max).alias("m")).first()["m"]
        if new_doc_map is not None:
            # accept either (doc_key, doc_id) or extend_doc_dim's FULL
            # (doc_id, doc_idx) dim — only rows past the current
            # dimension are appended, so passing the whole extended dim
            # never duplicates existing mappings
            if "doc_idx" in new_doc_map.columns:
                new_doc_map = new_doc_map.select(
                    F.col("doc_idx").alias("doc_key"), "doc_id"
                )
            new_doc_map = new_doc_map.filter(F.col("doc_key") >= self.n_docs)
            n_new = new_doc_map.count()
        else:
            n_new = 0
        # dimension check BEFORE any engine-state mutation: a rejected
        # merge must leave doc_map/doc_meta/corpus untouched (previously
        # the doc_map parquet was durably appended and the card surface
        # extended before this could raise)
        if mx is not None and int(mx) >= self.n_docs + n_new:
            raise ValueError(
                f"delta references doc_key {int(mx)} beyond the warehouse "
                f"dimension (n_docs={self.n_docs + n_new}) — pass the new "
                "docs' dimension rows via new_doc_map= (extend_doc_dim), or "
                "the ranked rows would silently vanish at hydration"
            )
        if new_corpus is not None:
            from .operators.index_build import build_doc_meta, tokenize_fields

            nc = new_corpus.localCheckpoint(eager=True)
            meta_new = build_doc_meta(nc, tokenize_fields(nc, cfg=self.cfg))
            self.index = replace(
                self.index,
                doc_meta=self.index.doc_meta.unionByName(
                    meta_new, allowMissingColumns=True
                ).localCheckpoint(eager=False),
            )
            if self.corpus is not None:
                self.corpus = self.corpus.unionByName(
                    nc.select(*self.corpus.columns)
                ).localCheckpoint(eager=False)
        if new_doc_map is not None:
            map_path = f"{self.warehouse_dir}/doc_map"
            new_doc_map.select("doc_key", "doc_id").write.mode(
                "append"
            ).parquet(map_path)
            self.doc_map = self.spark.read.parquet(map_path)
            self.n_docs += n_new
        # expected touched partitions, same derivation the merge uses —
        # so an emptied partition is still rewritten (see
        # _overwrite_touched)
        ids = {r[0] for r in delta.select("shard").distinct().collect()}
        if delete_postings is not None:
            ids |= {
                r[0]
                for r in delete_postings.select(
                    (term_hash60_col("term") % self.cfg.n_shards).cast("int")
                ).distinct().collect()
            }
        touched = merge_posting_shards(
            self.shards, delta, self.n_docs, self.cfg,
            delete_postings=delete_postings, partitions_only=True,
        )
        self._overwrite_touched(touched, expect_shards=ids)

    def refresh_stats(self, drift_threshold: float = 0.1) -> None:
        """Re-weight the (term, field) groups whose encoded df drifted
        past ``drift_threshold`` against the engine's CURRENT index
        stats — the weight-staleness repair that complements apply_merge
        (which carries stored weights per segment). Touched partitions
        only; orphan postings keep their stored weight."""
        from .operators.compression import key_doc_stats, refresh_shard_stats

        self._require_warehouse()
        doc_dim = self.doc_map.select(
            "doc_id", F.col("doc_key").alias("doc_idx")
        )
        touched = refresh_shard_stats(
            self.shards,
            self.index.term_stats,
            key_doc_stats(self.index.doc_stats, doc_dim),
            self.index.corpus_stats.collect(),
            self.cfg,
            drift_threshold=drift_threshold,
            partitions_only=True,
        )
        self._overwrite_touched(touched)

    # ------------------------------------------------------------------
    def wordlist(self, prefix: str, limit: int = 100) -> list[str]:
        """Vocabulary prefix search — reference GET /wordlist/{pre}
        (IterateInv, database/database.go:414-454): one pruned scan of the
        vocab table instead of O(vocab) point lookups."""
        rows = (
            self.index.vocab.filter(F.col("term").startswith(prefix.lower()))
            .select("term")
            .distinct()
            .orderBy("term")
            .limit(limit)
            .collect()
        )
        return [r["term"] for r in rows]
