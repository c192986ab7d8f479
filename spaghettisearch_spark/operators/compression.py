"""Posting-list compression: delta + varbyte shards.

North-rule requirement: posting-list construction/merge/compression as
grouped DataFrame aggregations with explicit skew handling. The
reference stores postings as JSON blobs per term
(/root/reference/indexer/indexer.go:350-408); we store columnar shards:

    posting_shards(term, field, shard, n_salts_used,
                   df long, max_weight double,
                   doc_idx binary,   -- delta+varbyte over dense doc indexes
                   tfs binary,       -- varbyte
                   positions binary, -- varbyte, per-doc position deltas
                   pos_lens binary)  -- varbyte, positions-per-doc

Layout: ``shard = term_hash60 % n_shards`` — written with
``partitionBy("shard")`` so a query's ``term IN (...)`` prunes to
|terms| shard directories (partition pruning at the scan, the Spark
analog of the reference's per-term point Gets).

Skew: a groupBy(term).collect_list over 10^12 files puts a hot term's
whole posting list through one reducer. Hot terms (df above
``salt_df_threshold`` fraction of docs) are salted into ``n_salts``
sub-groups keyed by doc-hash — each sub-group compresses independently
into its own row (a posting-list *block*, exactly what block-max WAND
wants), so no single task ever materializes an unbounded group. Cold
terms take the single-group path. This is the explicit two-phase
pattern the north rule demands; AQE skew-join handles residual runtime
skew.

Encoding is numpy-vectorized inside applyInPandas (Arrow batches, no
per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT, EngineConfig
from ..functions.hashing import term_hash60_col

# ---------------------------------------------------------------------------
# numpy varbyte codec
# ---------------------------------------------------------------------------

def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a non-negative int64 array (vectorized).

    Little-endian 7-bit groups, high bit set on the LAST byte of each
    value (classic index-compression varbyte).
    """
    if len(values) == 0:
        return b""
    v = np.asarray(values, dtype=np.uint64)
    # byte lengths: number of 7-bit groups
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        mask = tmp > 0
        if not mask.any():
            break
        nbits[mask] += 1
        tmp >>= np.uint64(7)
    nbits[nbits == 0] = 1
    total = int(nbits.sum())
    out = np.zeros(total, dtype=np.uint8)
    # positions of each value's first byte
    starts = np.concatenate(([0], np.cumsum(nbits)[:-1]))
    ends = starts + nbits - 1
    # fill bytes group by group (max 10 groups for 64-bit)
    max_groups = int(nbits.max())
    tmp = v.copy()
    for g in range(max_groups):
        sel = nbits > g
        out[starts[sel] + g] = (tmp[sel] & np.uint64(0x7F)).astype(np.uint8)
        tmp = tmp >> np.uint64(7)
    out[ends] |= 0x80
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes -> int64 array (vectorized)."""
    if not buf:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    terminators = (b & 0x80) != 0
    ends = np.flatnonzero(terminators)
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (b & 0x7F).astype(np.uint64)
    values = np.zeros(len(ends), dtype=np.uint64)
    lengths = ends - starts + 1
    max_len = int(lengths.max())
    for g in range(max_len):
        sel = lengths > g
        values[sel] |= payload[starts[sel] + g] << np.uint64(7 * g)
    return values.astype(np.int64)


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    d = np.diff(np.asarray(sorted_vals, dtype=np.int64), prepend=0)
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas)


# ---------------------------------------------------------------------------
# shard build
# ---------------------------------------------------------------------------

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("field", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("max_weight", T.DoubleType()),
        # block-max metadata: the block's top-N (doc_key, weight) sample,
        # readable without touching the varbyte payloads (parquet column
        # pruning). WAND's skip planner sums these partials per doc to get
        # an exact LOWER bound on the k-th best score, then decodes only
        # blocks whose max_weight-based upper bound can still beat it.
        T.StructField("top_doc_keys", T.ArrayType(T.LongType())),
        T.StructField("top_weights", T.ArrayType(T.DoubleType())),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("weights", T.BinaryType()),
        T.StructField("positions", T.BinaryType()),
        T.StructField("pos_lens", T.BinaryType()),
    ]
)

# per-block sample size for the skip planner's threshold estimate: big
# enough that |blocks_of_rarest_term| * N usually covers k, small enough
# that block metadata stays a few hundred bytes
BLOCK_SAMPLE_N = 8


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, field, salt) posting group -> one compressed block row.

    ``doc_key`` is whatever integer key the caller chose: the dense
    doc_idx from build_doc_dim (pipeline path — collision-free, tiny
    deltas) or the 60-bit md5 prefix (test path). Keys are delta+varbyte
    packed in sorted order; positions are per-doc delta streams with a
    parallel lengths stream.
    """
    pdf = pdf.sort_values("doc_key").reset_index(drop=True)
    term = pdf["term"].iat[0]
    field = pdf["field"].iat[0]
    shard = int(pdf["shard"].iat[0])
    salt = int(pdf["salt"].iat[0])
    keys = pdf["doc_key"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    weights = pdf["weight"].to_numpy(dtype=np.float64)
    pos_lists = pdf["positions"].tolist()
    pos_lens = np.array([len(p) for p in pos_lists], dtype=np.int64)
    if pos_lens.sum():
        flat = np.concatenate(
            [np.diff(np.asarray(p, dtype=np.int64), prepend=0) for p in pos_lists if len(p)]
        )
    else:
        flat = np.zeros(0, dtype=np.int64)
    top = np.argsort(-weights, kind="stable")[:BLOCK_SAMPLE_N]
    return pd.DataFrame(
        [
            {
                "term": term,
                "field": field,
                "shard": shard,
                "salt": salt,
                "df": int(len(pdf)),
                "max_weight": float(weights.max()) if len(weights) else 0.0,
                "top_doc_keys": [int(keys[i]) for i in top],
                "top_weights": [float(weights[i]) for i in top],
                "doc_ids": vb_encode(delta_encode(keys)),
                "tfs": vb_encode(tfs),
                "weights": weights.astype(">f8").tobytes(),
                "positions": vb_encode(flat),
                "pos_lens": vb_encode(pos_lens),
            }
        ]
    )


def build_posting_shards(
    postings: DataFrame,
    n_docs: int,
    cfg: EngineConfig = DEFAULT,
    term_stats: DataFrame | None = None,
    doc_dim: DataFrame | None = None,
    weight_col: str = "weight",
) -> DataFrame:
    """postings(term, field, doc_id, tf, positions, weight) -> compressed
    block rows, one per (term, field, salt).

    ``weight_col`` names the score column baked into the blocks. Index
    postings carry BOTH ``weight`` (normTF*idf, the reference's tf-idf
    mode) and ``bm25_weight``; WAND scoring expects the latter, so every
    query-path caller must pass ``weight_col="bm25_weight"`` (or remap
    beforehand) — sharding the tf-idf column silently produces a
    differently-ranked top-k.

    Two-phase skew handling: hot terms (df > salt_df_threshold * n_docs)
    get ``salt = doc_key % n_salts`` so each block is bounded; cold terms
    use salt 0. The applyInPandas groups are therefore all small, and the
    shuffle key (term, field, salt) spreads hot terms over n_salts tasks.

    ``doc_dim`` (doc_id, doc_idx) — when given, blocks key docs by the
    DENSE index (collision-free at any corpus size, and dense deltas
    varbyte-compress to ~1 byte each vs ~8 for 60-bit hash deltas). The
    default 60-bit-hash keying needs no dimension table and is fine for
    tests; the build pipeline always passes doc_dim.
    """
    if weight_col != "weight":
        postings = postings.withColumn("weight", F.col(weight_col))
    if term_stats is None:
        term_stats = postings.groupBy("term", "field").agg(
            F.count("*").cast("long").alias("df")
        )
    threshold = max(int(cfg.salt_df_threshold * n_docs), 1)
    hot = term_stats.filter(F.col("df") > threshold).select(
        "term", "field", F.lit(True).alias("is_hot")
    )

    if "doc_key" in postings.columns:
        pass  # caller pre-keyed (merge path re-encoding decoded blocks)
    elif doc_dim is not None:
        postings = postings.join(
            doc_dim.select("doc_id", F.col("doc_idx").alias("doc_key")), "doc_id"
        )
    else:
        postings = postings.withColumn("doc_key", term_hash60_col("doc_id"))
    keyed = (
        postings
        .withColumn("shard", (term_hash60_col("term") % cfg.n_shards).cast("int"))
        .join(F.broadcast(hot), ["term", "field"], "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot").isNotNull(),
                (F.pmod(F.col("doc_key"), F.lit(cfg.n_salts))).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .select("term", "field", "shard", "salt", "doc_key", "tf", "positions", "weight")
    )
    return keyed.groupBy("term", "field", "salt").applyInPandas(
        _encode_group, SHARD_SCHEMA
    )


# ---------------------------------------------------------------------------
# decode path (proves round-trip; also feeds WAND)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("field", T.StringType()),
        T.StructField("doc_key", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


def decode_shards(
    shards: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """posting_shards -> one row per (term, field, doc_key) — the
    round-trip inverse of build_posting_shards (modulo doc_id -> 60-bit
    doc_key projection). ``passthrough`` names extra non-payload columns
    to replicate onto every decoded row (e.g. a segment tag the merge
    adds before a single union-then-decode stage); they must not collide
    with the decoded column names."""
    extra = list(passthrough)
    out_cols = ["term", "field", "doc_key", "tf", "weight", "positions"] + extra
    schema = T.StructType(
        list(DECODED_SCHEMA.fields) + [shards.schema[c] for c in extra]
    )

    def _decode(batch_iter):
        for pdf in batch_iter:
            out = []
            for row in pdf.itertuples(index=False):
                keys = delta_decode(vb_decode(row.doc_ids))
                tfs = vb_decode(row.tfs)
                weights = np.frombuffer(row.weights, dtype=">f8").astype(np.float64)
                pos_lens = vb_decode(row.pos_lens)
                flat = vb_decode(row.positions)
                extras = tuple(getattr(row, c) for c in extra)
                offs = np.concatenate(([0], np.cumsum(pos_lens)))
                for i in range(len(keys)):
                    deltas = flat[offs[i]:offs[i + 1]]
                    out.append(
                        (
                            row.term,
                            row.field,
                            int(keys[i]),
                            int(tfs[i]),
                            float(weights[i]),
                            np.cumsum(deltas).astype(np.int32).tolist(),
                        )
                        + extras
                    )
            yield pd.DataFrame(out, columns=out_cols)

    # only the payload columns cross Arrow — block metadata (salt,
    # max_weight, the per-block top-N samples) is planner-side and must
    # not ride the decode transfer
    need = ["term", "field", "doc_ids", "tfs", "weights", "pos_lens", "positions"]
    return shards.select(*(need + extra)).mapInPandas(_decode, schema)


def build_doc_dim(corpus: DataFrame) -> DataFrame:
    """(doc_id, doc_idx) — dense, deterministic document index.

    Range-partition by doc_id + sort within partitions gives a global
    order; ``zipWithIndex`` assigns contiguous ids with one extra job to
    count per-partition offsets (no single-reducer window — this scales
    to any corpus size, unlike ``row_number() OVER (ORDER BY ...)``).
    One of the two deliberate RDD uses in the engine (the other is none).
    """
    spark = corpus.sparkSession
    n_parts = max(corpus.rdd.getNumPartitions(), 8)
    ids = (
        corpus.select("doc_id")
        .distinct()
        .repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    rdd = ids.rdd.map(lambda r: r[0]).zipWithIndex()
    return spark.createDataFrame(rdd, "doc_id string, doc_idx long")


# ---------------------------------------------------------------------------
# LSM-style delta merge (north-rule "posting-list ... merge")
# ---------------------------------------------------------------------------

def merge_posting_shards(
    base: DataFrame,
    delta: DataFrame,
    n_docs: int,
    cfg: EngineConfig = DEFAULT,
    delete_postings: DataFrame | None = None,
    partitions_only: bool = False,
) -> DataFrame:
    """Merge a delta shard set into a base shard set, decoding ONLY the
    touched (term, field) groups.

    ``partitions_only=True`` returns ONLY the rows belonging to shard
    partitions the delta touches (merged + their pass-through rows) —
    the frame to write with dynamic partition overwrite
    (``spark.sql.sources.partitionOverwriteMode=dynamic`` over the
    ``partitionBy("shard")`` layout), so compaction I/O is bounded by
    |touched shard partitions| regardless of index size. The default
    returns the complete merged index (in-memory serving / tests).

    The reference merges per-term posting JSON under a writer lock
    (indexer.go:350-408 read-modify-write); here the merge is a plan:

    - touched groups = (term, field) present in ``delta`` or in
      ``delete_postings`` (term, field, doc_key — the exact old postings
      of deleted/changed docs, known from the warehouse's postings_raw).
      Everything else passes through UNTOUCHED — the varbyte payloads
      are never decoded, so merge cost scales with the delta, not the
      index (the LSM compaction property; at 10^12 files the base is
      ~all of the index and the delta is one crawl batch).
    - touched groups are decoded (base + delta), upserted (a doc_key
      present in both sides takes the delta's row), tombstones dropped,
      then re-encoded by the same block builder — so salt
      classification is re-derived from the merged df (a term that
      crossed the hot threshold gets salted now, not at the next full
      rebuild).

    Weight semantics (the standard LSM trade): stored impact weights are
    carried as-is per segment; global-stats drift (df/avgdl/N move as
    docs arrive) is NOT retrofitted onto untouched blocks — the periodic
    full pipeline rebuild refreshes them. Exactness on postings (doc
    sets, tf, positions) is total; tests build both sides against the
    same stats and assert merged == rebuilt-from-scratch.

    Both sides must use the same doc_key mode (same doc_dim, or both
    60-bit hash keys). Pass MATERIALIZED segments (cached or read from
    storage): the plan references each side more than once (touched-set
    derivation, pass-through anti-join, decode), and Spark does not
    dedupe common subplans — an unmaterialized side gets recomputed per
    reference.
    """
    touched = delta.select("term", "field").distinct()
    if delete_postings is not None:
        touched = touched.unionByName(
            delete_postings.select("term", "field").distinct()
        ).distinct()

    if partitions_only:
        # bounded collect: <= cfg.n_shards distinct partition ids
        ids = sorted(
            {r[0] for r in delta.select("shard").distinct().collect()}
            | (
                {
                    r[0]
                    for r in delete_postings.select(
                        (term_hash60_col("term") % cfg.n_shards).cast("int")
                    ).distinct().collect()
                }
                if delete_postings is not None
                else set()
            )
        )
        base = base.filter(F.col("shard").isin(ids))

    untouched = base.join(touched, ["term", "field"], "left_anti")
    touched_base = base.join(touched, ["term", "field"], "left_semi")

    # single decode stage over both sides (src tag rides the decode),
    # then ONE aggregation does the upsert: delta (src=1) wins on
    # (term, field, doc_key); group size <= 2
    sides = touched_base.withColumn("src", F.lit(0)).unionByName(
        delta.withColumn("src", F.lit(1))
    )
    rows = decode_shards(sides, passthrough=("src",))
    merged = rows.groupBy("term", "field", "doc_key").agg(
        F.max_by(F.struct("tf", "weight", "positions"), F.col("src")).alias("p"),
        F.max("src").alias("max_src"),
    )
    if delete_postings is not None:
        # tombstones kill rows whose LATEST version is the base's
        # (max_src=0) — a delta re-adding the same (term, field,
        # doc_key) supersedes its own tombstone
        merged = (
            merged.join(
                delete_postings.select("term", "field", "doc_key")
                .distinct()
                .withColumn("tomb", F.lit(True)),
                ["term", "field", "doc_key"],
                "left",
            )
            .filter(
                ~(F.coalesce("tomb", F.lit(False)) & (F.col("max_src") == 0))
            )
            .drop("tomb")
        )
    merged = merged.select(
        "term", "field", "doc_key",
        F.col("p.tf").alias("tf"),
        F.col("p.weight").alias("weight"),
        F.col("p.positions").alias("positions"),
    )
    reencoded = build_posting_shards(merged, n_docs, cfg)
    return untouched.unionByName(reencoded)


def extend_doc_dim(doc_dim: DataFrame, new_corpus: DataFrame) -> DataFrame:
    """Append-only doc_idx assignment: docs not yet in ``doc_dim`` get
    contiguous indexes starting past the current max (in doc_id order
    among themselves). Existing mappings are never re-derived — required
    for merge_posting_shards with dense keys, where base blocks bake the
    old indexes in.

    Tie-break caveat this creates: doc_idx order now equals doc_id
    string order only WITHIN an ingest segment, so the dense-key WAND
    tie-break (score desc, doc_idx asc) ranks exact score ties by
    segment age first. The periodic full rebuild re-derives a globally
    sorted dim and restores string-order ties."""
    spark = doc_dim.sparkSession
    row = doc_dim.agg(F.max("doc_idx")).first()
    start = int(row[0]) + 1 if row[0] is not None else 0
    fresh = (
        new_corpus.select("doc_id")
        .distinct()
        .join(doc_dim.select("doc_id"), "doc_id", "left_anti")
        .repartitionByRange(max(new_corpus.rdd.getNumPartitions(), 8), "doc_id")
        .sortWithinPartitions("doc_id")
    )
    rdd = fresh.rdd.map(lambda r: r[0]).zipWithIndex().map(
        lambda kv: (kv[0], kv[1] + start)
    )
    new_part = spark.createDataFrame(rdd, "doc_id string, doc_idx long")
    return doc_dim.unionByName(new_part)
