"""Unit tests for training-data text ops: python-mirror checks for
minhash/simhash/shingles, language-ID determinism, ANN recall sanity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from spaghettisearch_spark.functions.hashing import term_hash60_py


@pytest.fixture(scope="module")
def toks(spark):
    rows = [
        (1, ["alpha", "beta", "gamma", "alpha"]),
        (2, ["alpha", "beta", "gamma", "delta"]),
        (3, ["zeta", "eta", "theta", "iota"]),
    ]
    data = [
        (i, p, t) for i, ts in rows for p, t in enumerate(ts)
    ]
    return spark.createDataFrame(data, "id int, pos int, term string")


def test_minhash_matches_python(spark, toks):
    from spaghettisearch_spark.operators.textops import minhash_signatures

    got = {
        (r["id"], r["salt"]): r["minhash"]
        for r in minhash_signatures(toks.select("id", "term").distinct(), "id", 4).collect()
    }
    docs = {1: {"alpha", "beta", "gamma"}, 2: {"alpha", "beta", "gamma", "delta"},
            3: {"zeta", "eta", "theta", "iota"}}
    for did, terms in docs.items():
        for s in range(4):
            want = min(term_hash60_py(t, salt=f"s{s}:") for t in terms)
            assert got[(did, s)] == want


def test_simhash_matches_python(spark, toks):
    from spaghettisearch_spark.operators.textops import simhash60

    tf = toks.groupBy("id", "term").agg(F.count("*").cast("int").alias("tf"))
    got = {r["id"]: r["simhash"] for r in simhash60(tf, "id").collect()}
    pdf = tf.toPandas()
    for did in (1, 2, 3):
        sub = pdf[pdf["id"] == did]
        sim = 0
        for bit in range(60):
            acc = 0
            for _, row in sub.iterrows():
                h = term_hash60_py(row["term"])
                acc += row["tf"] if (h >> bit) & 1 else -row["tf"]
            if acc > 0:
                sim |= 1 << bit
        assert got[did] == sim
    # near-dup docs have closer simhash than unrelated ones
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(got[1], got[2]) < ham(got[1], got[3])


def test_lsh_banding_filters(spark):
    """r=2 banded LSH must be a SUBSET of the r=1 any-shared-minhash
    candidates, still find true near-dups, and actually filter."""
    from spaghettisearch_spark.operators.textops import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # docs 0,1: identical sets (jaccard 1). docs 2..19: two families with
    # in-family jaccard 6/18 = 1/3 — r=1 catches ~all of them (S-curve
    # 1-(1-s)^8 ~ 0.96) while r=2 drops most (1-(1-s^2)^4 ~ 0.37).
    rows = []
    for i in range(20):
        if i <= 1:
            terms = [f"w{j}" for j in range(6)] + ["shared01"]
        else:
            terms = [f"w{j}" for j in range(i % 2, 12, 2)] + [
                f"uniq{i}x{k}" for k in range(6)
            ]
        for t in set(terms):
            rows.append((i, t))
    toks = spark.createDataFrame(rows, "id int, term string")
    sigs = minhash_signatures(toks, "id", 8).cache()

    loose = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, band_rows=1).collect()
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, band_rows=2).collect()
    }
    assert banded <= loose
    assert (0, 1) in banded  # jaccard(0,1)=1.0 -> always a candidate
    assert len(banded) < len(loose)
    # max_bucket guard still composes with banding
    capped = lsh_candidate_pairs(sigs, band_rows=2, max_bucket=1).count()
    assert capped == 0


def test_shingles_and_jaccard(spark, toks):
    from spaghettisearch_spark.operators.textops import jaccard_pairs, token_shingles

    sh = token_shingles(toks, "id", 2)
    got = {
        (r["id"], r["shingle"]) for r in sh.collect()
    }
    assert (1, "alpha beta") in got and (1, "gamma alpha") in got
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(sh, 0.1).collect()}
    # docs 1,2 share 'alpha beta','beta gamma' bigrams
    assert (1, 2) in pairs
    assert pairs[(1, 2)] == pytest.approx(2 / (3 + 3 - 2))


def test_connected_components(spark):
    """Min-label propagation: chains collapse, islands stay apart,
    component id = min member (the dedup keep-doc)."""
    from spaghettisearch_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 11), (20, 21), (40, 41), (41, 40)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {3: 3, 5: 3, 9: 3, 11: 3, 20: 20, 21: 20, 40: 40, 41: 40}


def test_redact_pii(spark):
    from spaghettisearch_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk or 10.0.0.1 now"),
            (2, "token deadbeefdeadbeefdeadbeefdeadbeef end"),
            (3, "clean text with no secrets at all"),
        ],
        "id int, text string",
    )
    rows = {r["id"]: r for r in redact_pii(docs, "id", "text").collect()}
    assert rows[1]["redacted"] == "contact <EMAIL> or <IP> now"
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
    assert rows[2]["redacted"] == "token <SECRET> end"
    assert rows[2]["n_hex_secret"] == 1
    assert rows[3]["redacted"] == "clean text with no secrets at all"
    assert rows[3]["n_email"] == rows[3]["n_ipv4"] == rows[3]["n_hex_secret"] == 0


def test_connected_components_long_chain(spark):
    """A 300-node chain has diameter 299: one-hop propagation would need
    299 rounds and silently truncate at max_iters — pointer jumping must
    converge in ~log2 rounds."""
    from spaghettisearch_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    )
    got = connected_components(pairs, max_iters=20).collect()
    assert len(got) == 300
    assert all(r["component"] == 0 for r in got)


def test_connected_components_random_vs_union_find(spark):
    """Seeded random graphs vs a plain union-find mirror."""
    import random

    from spaghettisearch_spark.operators.graph import connected_components

    for seed in (7, 23):
        rng = random.Random(seed)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(25)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(30))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for e in edges for x in e}
        want = {x: find(x) for x in nodes}
        # canonicalize: min member per root
        roots: dict = {}
        for x in sorted(nodes):
            roots.setdefault(want[x], x)
        want = {x: roots[want[x]] for x in nodes}

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert got == want, f"seed {seed}"


def test_connected_components_star_hub(spark):
    """Skewed star graph — one hub, 5000 spokes, the giant-component
    shape where label propagation re-shuffles the full edge list through
    one reducer every round. The large/small-star method rewires the hub
    to parent pointers and converges in a handful of rounds with the
    same (id, component=min) contract."""
    from spaghettisearch_spark.operators import graph as graph_mod
    from spaghettisearch_spark.operators.graph import connected_components_star

    hub = 999_999  # hub is the LARGEST id, so every spoke must re-root
    pairs = spark.createDataFrame(
        [(hub, s) for s in range(5000)], "id_a long, id_b long"
    )
    got = connected_components_star(pairs).collect()
    assert len(got) == 5001
    assert all(r["component"] == 0 for r in got)
    assert graph_mod.LAST_STAR_ROUNDS <= 4, graph_mod.LAST_STAR_ROUNDS


def test_connected_components_star_matches_propagation(spark):
    """Star rewiring == min-label propagation on chains and seeded
    random graphs (same canonical min-id components)."""
    import random

    from spaghettisearch_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(149)], "id_a long, id_b long"
    )
    got = connected_components_star(chain, max_iters=20).collect()
    assert len(got) == 150 and all(r["component"] == 0 for r in got)

    for seed in (7, 23):
        rng = random.Random(seed)
        edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        want = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        got = {
            r["id"]: r["component"]
            for r in connected_components_star(pairs).collect()
        }
        assert got == want, f"seed {seed}"


def test_language_id(spark):
    from spaghettisearch_spark.operators.textops import language_id_scores

    docs = spark.createDataFrame(
        [
            (1, "def foo import sys return None class"),
            (2, "func main package import fmt go defer"),
            (3, "nothing matching here whatsoever"),
        ],
        "id int, text string",
    )
    profiles = {
        "python": ["def", "import", "class", "return", "self"],
        "golang": ["func", "package", "defer", "fmt", "go"],
    }
    got = {r["id"]: r["lang"] for r in language_id_scores(docs, "id", "text", profiles).collect()}
    assert got[1] == "python"
    assert got[2] == "golang"
    assert got[3] in ("golang", "python")  # deterministic tie -> lang asc


def test_quality_stats_mirror(spark):
    from spaghettisearch_spark.operators.textops import quality_stats

    text = "Alpha beta beta GAMMA, delta; the a of!"
    docs = spark.createDataFrame([(1, text)], "id int, text string")
    r = quality_stats(docs, "id", "text").first()
    assert r["n_chars"] == len(text)
    assert r["n_tokens"] == 8  # alpha beta beta gamma delta the a of
    assert r["n_tokens_nostop"] == 5
    assert r["distinct_ratio"] == pytest.approx(7 / 8)


def _clustered_embeddings(spark, n_clusters=10, per_cluster=12, dim=16):
    """Deterministic planted-neighbor fixture: per_cluster perturbed
    copies of each base vector (pairwise cos ~0.99 within a cluster,
    ~random across). The shape real near-dup corpora have, unlike the
    driver's uniform-random embeddings where 'top-10 neighbors' are
    indistinguishable from the bulk."""
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    vid = 0
    for c in range(n_clusters):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + rng.normal(size=dim) * 0.05
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id int, cluster int, embedding array<double>"
    )


def test_ann_recall_vs_exact(spark):
    from spaghettisearch_spark.operators.similarity import (
        ann_topk_bucketed,
        cosine_topk,
    )

    emb = _clustered_embeddings(spark).cache()
    dim = 16
    recalls = []
    for qid in (0, 25, 61, 119):
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        exact = [r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()]
        assert exact[0] == qid  # self is most similar
        approx = [
            r["vec_id"]
            for r in ann_topk_bucketed(
                emb, qv, dim=dim, k=10, n_planes=4, hamming=1
            ).collect()
        ]
        recalls.append(len(set(approx) & set(exact)) / 10)
    # multi-probe recall@10 on clustered data (stronger than r01's >=1)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_recall_vs_exact(spark):
    """IVF with one stride-seed per cluster recovers the exact top-10 on
    clustered data while scanning n_probe/n_cells of the vectors."""
    from spaghettisearch_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _clustered_embeddings(spark).cache()
    recalls = []
    for qid in (0, 25, 61, 119):
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        exact = [r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()]
        approx = [
            r["vec_id"]
            for r in ivf_topk(emb, qv, k=10, n_cells=10, n_probe=2).collect()
        ]
        recalls.append(len(set(approx) & set(exact)) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_lloyd_refined_recall(spark):
    """Two Lloyd passes over the stride seeds pull centroids onto the
    planted clusters: recall@10 gate tightens to >= 0.9 (vs 0.8 for raw
    seeds), and the refined codebook reused across queries stays stable
    (built once, passed in — the at-scale usage)."""
    from spaghettisearch_spark.operators.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
        lloyd_refine,
    )

    emb = _clustered_embeddings(spark).cache()
    codebook = lloyd_refine(emb, ivf_centroids(emb, 10), iters=2)
    assert len(codebook) == 10 and len(codebook[0]) == 16
    recalls = []
    for qid in (0, 25, 61, 119):
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        exact = [r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()]
        approx = [
            r["vec_id"]
            for r in ivf_topk(
                emb, qv, k=10, n_cells=10, n_probe=2, centroids=codebook
            ).collect()
        ]
        recalls.append(len(set(approx) & set(exact)) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_srp_near_dup_pairs_vs_exact(spark):
    """Bucketed near-dup (the default scale path) must reproduce the
    exact all-pairs result on the planted-duplicate fixture."""
    from spaghettisearch_spark.operators.similarity import (
        _dot,
        _norm,
        srp_near_dup_pairs,
    )

    emb = _clustered_embeddings(spark).cache()
    e2 = emb.select("vec_id", F.col("embedding").alias("v"))
    a = e2.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e2.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.9)
        .collect()
    }
    assert len(exact) > 100  # within-cluster pairs exist
    got = {
        (r["id_a"], r["id_b"])
        for r in srp_near_dup_pairs(
            emb, dim=16, threshold=0.9, n_planes=4, hamming=2, n_tables=2
        ).collect()
    }
    assert got == exact


def test_repetition_stats(spark):
    """Gopher-style repetition signals vs hand-computed values, including
    the empty-doc and single-token guards."""
    from spaghettisearch_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # top 3/6; bigrams 5 -> 2 distinct; tri 4 -> 2
            (2, "x y z w"),           # no repetition
            (3, ""),                  # empty: all zero, no slice error
            (4, "solo"),              # single token: ngram fracs zero
            (5, "p p p"),             # top 1.0; bigrams 2 -> 1; tri 1 -> 1
        ],
        "id int, text string",
    )
    got = {
        r["id"]: (
            round(r["top_token_frac"], 6),
            round(r["dup_bigram_frac"], 6),
            round(r["dup_trigram_frac"], 6),
        )
        for r in repetition_stats(docs, "id", "text").collect()
    }
    assert got[1] == (0.5, round(1 - 2 / 5, 6), 0.5)
    assert got[2] == (0.25, 0.0, 0.0)
    assert got[3] == (0.0, 0.0, 0.0)
    assert got[4] == (1.0, 0.0, 0.0)
    assert got[5] == (1.0, 0.5, 0.0)
