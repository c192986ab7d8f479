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
chunks each incoming Arrow batch by payload-byte budget
(``target_batch_mb``) inside the mapInPandas iterator, bounding the
decode working set; outputs drop the payload column immediately so
downstream stages shuffle features, not bytes.
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
    target_batch_mb: float = 64,
    emit_batch_bytes: bool = False,
) -> DataFrame:
    """(doc_id, payload, media) -> FEATURES_SCHEMA rows via mapInPandas.

    Payload-size bounding happens INSIDE the iterator: each incoming
    Arrow batch is split into chunks whose summed payload bytes stay
    under ``target_batch_mb``, and the decode working set + emitted
    frame are per-chunk. (A previous version set
    spark.sql.execution.arrow.maxRecordsPerBatch around the lazy
    mapInPandas and restored it in a finally — the conf was back to its
    old value before any job ran, so the bound was a no-op; it was also
    racy across concurrent queries on the shared session conf.)

    ``emit_batch_bytes=True`` appends a ``batch_bytes`` column carrying
    each output row's chunk payload total — test/observability hook.
    """
    budget = int(target_batch_mb * 1024 * 1024)
    out_cols = ["doc_id", "media_type", "width", "height", "n_frames", "feature"]
    schema = FEATURES_SCHEMA
    if emit_batch_bytes:
        schema = T.StructType(
            FEATURES_SCHEMA.fields + [T.StructField("batch_bytes", T.LongType())]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["payload"].map(len).to_numpy()
            # chunk boundaries: greedy fill up to `budget` payload bytes
            # (a single row larger than the budget gets its own chunk)
            start, acc = 0, 0
            bounds = []
            for i, s in enumerate(sizes):
                if acc and acc + s > budget:
                    bounds.append((start, i))
                    start, acc = i, 0
                acc += int(s)
            bounds.append((start, len(sizes)))
            for lo, hi in bounds:
                if lo == hi:
                    continue
                chunk = pdf.iloc[lo:hi]
                out = []
                for row in chunk.itertuples(index=False):
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
                frame = pd.DataFrame(out, columns=out_cols)
                if emit_batch_bytes:
                    frame["batch_bytes"] = int(sizes[lo:hi].sum())
                yield frame

    return media.mapInPandas(run, schema)
