"""Pure-pandas/Python scoring oracle for rank-identity tests.

Independent reimplementation of the engine's exact scoring semantics
(SURVEY.md §5.2): same tokenizer/stemmer module (single source of truth
for token forms), but scoring/aggregation written as plain Python dict
loops — no Spark, no shared scoring code — so a Spark-side bug cannot
cancel itself out in the comparison.

Semantics mirrored (reference sites):
  positions over post-stopword stream      parser.go:195-207
  anchor terms -> target doc's title field indexer.go:163-299 (pos sentinel excluded)
  BM25 / tf-idf cosine weighting           SURVEY.md §7 scoring note
  phrase: offset-adjust + intersect + completeness   phrase.go
  blend (w_pr*PR + w_t*title + w_b*body) * 100       get_metadata.go:69
  top-k (score desc, doc_id asc)           main_retrieve.go:94-103 + fixed ties
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from dataclasses import dataclass, field

import pandas as pd

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import doc_id_py
from ..functions.tokenize import parse_query, tokenize_py

_LINK_RE = re.compile(r"@link\{([^}]*)\}")


@dataclass
class OracleIndex:
    # postings[(field, term)] -> {doc_id: (tf, [positions])}
    postings: dict = field(default_factory=dict)
    dl: dict = field(default_factory=dict)  # (field, doc_id) -> length
    n_docs: int = 0
    avgdl: dict = field(default_factory=dict)  # field -> avg dl
    doc_ids: list = field(default_factory=list)
    max_tf: dict = field(default_factory=dict)  # (field, doc_id) -> max tf


def extract_links_py(content: str, cfg: EngineConfig = DEFAULT):
    """[(target, [anchor_terms])] — anchors = up to 3 tokens preceding the
    marker, same tokenize path as indexing."""
    out = []
    segments = _LINK_RE.split(content)
    # split yields [text0, target0, text1, target1, ..., textN]
    for k in range(1, len(segments), 2):
        target = segments[k]
        anchor_src = segments[k - 1]
        toks = tokenize_py(anchor_src, cfg.remove_stopwords, cfg.stem)
        out.append((target, toks[-3:]))
    return out


def build_oracle_index(
    documents: pd.DataFrame, cfg: EngineConfig = DEFAULT
) -> OracleIndex:
    idx = OracleIndex()
    postings: dict = defaultdict(dict)
    dl: Counter = Counter()

    docs = []
    anchor_credit: dict = defaultdict(list)  # doc_id -> [terms]
    known = {}
    for row in documents.itertuples(index=False):
        did = doc_id_py(row.repo, row.path)
        known[f"{row.repo}/{row.path}"] = did
        docs.append((did, row))
    for did, row in docs:
        for target, anchors in extract_links_py(row.content, cfg):
            tgt = known.get(target)
            if tgt is not None:
                anchor_credit[tgt].extend(anchors)

    for did, row in docs:
        fields = {
            "title": tokenize_py(row.path, cfg.remove_stopwords, cfg.stem),
            "body": tokenize_py(row.content, cfg.remove_stopwords, cfg.stem),
        }
        for fname, toks in fields.items():
            dl[(fname, did)] += len(toks)
            for pos, t in enumerate(toks):
                tf, positions = postings[(fname, t)].get(did, (0, []))
                postings[(fname, t)][did] = (tf + 1, positions + [pos])
        for t in anchor_credit.get(did, []):
            tf, positions = postings[("title", t)].get(did, (0, []))
            postings[("title", t)][did] = (tf + 1, positions)  # sentinel excluded
            dl[("title", did)] += 1

    idx.postings = dict(postings)
    idx.dl = dict(dl)
    idx.n_docs = len(docs)
    idx.doc_ids = [d for d, _ in docs]
    for fname in ("title", "body"):
        lens = [v for (f_, _), v in idx.dl.items() if f_ == fname]
        idx.avgdl[fname] = (sum(lens) / len(lens)) if lens else 0.0
    for (fname, _term), dmap in idx.postings.items():
        for did, (tf, _pos) in dmap.items():
            key = (fname, did)
            if tf > idx.max_tf.get(key, 0):
                idx.max_tf[key] = tf
    return idx


def _bm25(idx: OracleIndex, fname: str, term: str, did: str, cfg: EngineConfig):
    entry = idx.postings.get((fname, term), {}).get(did)
    if entry is None:
        return 0.0
    tf, _ = entry
    df = len(idx.postings[(fname, term)])
    idf = math.log(1.0 + (idx.n_docs - df + 0.5) / (df + 0.5))
    dl_ = idx.dl.get((fname, did), 0)
    denom = tf + cfg.k1 * (1 - cfg.b + cfg.b * dl_ / idx.avgdl[fname])
    return idf * tf * (cfg.k1 + 1.0) / denom


def _tfidf_weight(idx: OracleIndex, fname: str, term: str, did: str):
    entry = idx.postings.get((fname, term), {}).get(did)
    if entry is None:
        return 0.0
    tf, _ = entry
    max_tf = idx.max_tf[(fname, did)]
    df = len(idx.postings[(fname, term)])
    return (tf / max_tf) * math.log2(idx.n_docs / df)


def _phrase_docs(idx: OracleIndex, fname: str, phrase: list[str]):
    """{doc_id} containing the exact phrase in field fname."""
    per_term = []
    for i, t in enumerate(phrase):
        docs = idx.postings.get((fname, t), {})
        per_term.append({d: {p - i for p in pos} for d, (tf, pos) in docs.items()})
    if not per_term:
        return set()
    candidates = set(per_term[0])
    for m in per_term[1:]:
        candidates &= set(m)
    out = set()
    for d in candidates:
        inter = per_term[0][d]
        for m in per_term[1:]:
            inter = inter & m[d]
        if inter:
            out.add(d)
    return out


def oracle_search(
    idx: OracleIndex,
    query: str,
    cfg: EngineConfig = DEFAULT,
    pagerank: dict | None = None,
    k: int | None = None,
) -> pd.DataFrame:
    """-> DataFrame(rank, doc_id, score, title_rank, body_rank)."""
    k = k or cfg.top_k
    free_terms, phrases = parse_query(query, cfg.remove_stopwords, cfg.stem)

    scores: dict = defaultdict(lambda: {"title": 0.0, "body": 0.0})

    def contrib(fname, term, did):
        if cfg.scorer == "bm25":
            return _bm25(idx, fname, term, did, cfg)
        return _tfidf_weight(idx, fname, term, did)

    for term in free_terms:  # duplicates accumulate, like the reference
        for fname in ("title", "body"):
            for did in idx.postings.get((fname, term), {}):
                scores[did][fname] += contrib(fname, term, did)

    for phrase in phrases:
        for fname in ("title", "body"):
            for did in _phrase_docs(idx, fname, phrase):
                s = sum(contrib(fname, t, did) for t in phrase)
                scores[did][fname] += s

    if cfg.scorer == "tfidf_cosine" and scores:
        qlen = len(free_terms) + sum(len(p) for p in phrases)
        mags: dict = defaultdict(float)
        for (fname, term), docs in idx.postings.items():
            for did in docs:
                mags[(fname, did)] += _tfidf_weight(idx, fname, term, did) ** 2
        for did, fs in scores.items():
            for fname in ("title", "body"):
                denom = math.sqrt(mags.get((fname, did), 0.0)) * math.sqrt(qlen)
                v = fs[fname] / denom if denom else 0.0
                fs[fname] = 0.0 if math.isnan(v) else v

    rows = []
    for did, fs in scores.items():
        pr = (pagerank or {}).get(did, 0.0)
        score = (
            cfg.w_pagerank * pr + cfg.w_title * fs["title"] + cfg.w_body * fs["body"]
        ) * cfg.blend_scale
        rows.append((did, score, fs["title"], fs["body"]))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pd.DataFrame(
        [(i + 1, *r) for i, r in enumerate(rows)],
        columns=["rank", "doc_id", "score", "title_rank", "body_rank"],
    )


def oracle_pagerank(
    nodes: list[str],
    edges: list[tuple[str, str]],
    damping: float = 0.75,
    epsilon: float = 1e-8,
    max_iters: int = 30,
) -> dict[str, float]:
    """Plain-Python power iteration mirroring ranking/pagerank.go:85-145:
    init 1/n; rank[child] += d*rank[parent]/outdeg; normalize
    (rank + (1-d)) / total; L1 convergence."""
    node_set = set(nodes) | {s for s, _ in edges} | {t for _, t in edges}
    n = len(node_set)
    if n == 0:
        return {}
    edge_set = sorted(set(edges))
    outdeg: Counter = Counter(s for s, _ in edge_set)
    ranks = {d: 1.0 / n for d in node_set}
    for _ in range(max_iters):
        inherited: dict[str, float] = defaultdict(float)
        for s, t in edge_set:
            inherited[t] += damping * ranks[s] / outdeg[s]
        raw = {d: inherited.get(d, 0.0) + (1.0 - damping) for d in node_set}
        total = sum(raw.values())
        new_ranks = {d: v / total for d, v in raw.items()}
        delta = sum(abs(new_ranks[d] - ranks[d]) for d in node_set)
        ranks = new_ranks
        if delta < epsilon:
            break
    return ranks
