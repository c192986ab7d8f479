"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride along as ``binary`` columns plus a metadata
struct; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
so payload bytes never round-trip through Python row-by-row. The decode
step itself is STUBBED (no image/audio libs in this container): the
default codec is a deterministic fake (hash-derived features) and a real
codec slot raises NotImplementedError unless PIL/soundfile are importable
— the Spark-side plumbing (schema, batching, partition sizing) is real
and tested (tests/test_multimodal.py).

Scale notes: binary payloads dominate row size, so feature extraction
repartitions by payload size budget (``target_batch_mb``) before the
mapInPandas, keeping Arrow batches bounded; outputs drop the payload
column immediately so downstream stages shuffle features, not bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_payload_col(seed_col: str = "doc_id", n_bytes: int = 256):
    """Deterministic fake binary payload (test stand-in for real media):
    repeated md5 bytes of the seed column."""
    rep = (n_bytes // 16) + 1
    return F.substring(
        F.unhex(F.concat(*[F.md5(F.concat(F.col(seed_col), F.lit(str(i))))
                           for i in range(rep)])),
        1,
        n_bytes,
    )


def attach_fake_media(corpus: DataFrame, media_type: str = "image") -> DataFrame:
    """corpus -> + (payload binary, media struct) columns."""
    payload = fake_payload_col("doc_id")
    return corpus.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(f"{media_type}/fake").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("media"),
    )


def fake_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decoder: (width, height, n_frames, feature[8])
    derived from the payload digest — exercises the full plumbing with
    stable outputs."""
    d = hashlib.md5(payload).digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    n_frames = 1 + d[2] % 4
    feat = np.frombuffer(d[:8], dtype=np.uint8).astype(np.float32) / 255.0
    return width, height, n_frames, feat


def real_decode(payload: bytes):  # pragma: no cover - env without media libs
    """Real decode slot: wire PIL/soundfile here when available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires PIL/soundfile; not present in this "
            "environment — use fake_decode or install codecs"
        ) from e
    raise NotImplementedError("real decoder not wired yet")


def extract_media_features(
    media: DataFrame,
    decode: Callable[[bytes], tuple] = fake_decode,
    target_batch_mb: int = 64,
) -> DataFrame:
    """(doc_id, payload, media) -> FEATURES_SCHEMA rows via mapInPandas.

    One Arrow batch holds ~target_batch_mb of payload; the iterator form
    streams batches so an executor never materializes a whole partition
    of media bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                w, h, nf, feat = decode(bytes(row.payload))
                out.append(
                    (
                        row.doc_id,
                        row.media["media_type"],
                        int(w),
                        int(h),
                        int(nf),
                        [float(x) for x in feat],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "media_type", "width", "height", "n_frames", "feature",
                ],
            )

    # bound Arrow batch size by payload bytes, not row count: with the
    # per-row payload estimate, target_batch_mb of media = this many rows
    avg_bytes = 1024
    rows_per_batch = max((target_batch_mb * 1024 * 1024) // avg_bytes, 1)
    spark = media.sparkSession
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(min(rows_per_batch, 10000))
    )
    try:
        return media.mapInPandas(run, FEATURES_SCHEMA)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
