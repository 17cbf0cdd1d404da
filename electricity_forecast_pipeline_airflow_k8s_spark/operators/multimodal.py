"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json extension).

The Spark-side plumbing is real and tested -- schema, partitioning, Arrow
batch shapes, mapInPandas signatures; only the codec step is stubbed
(this container ships no image/audio libraries). ``decode_fn`` is the
dependency-injection point: pass a real PIL/libav decoder on a cluster
that has one; the default deterministic fake lets every downstream stage
(feature extract, resize bookkeeping, frame sampling) run end-to-end.

Scale notes: binary payloads ride the normal columnar path (Parquet binary
+ Arrow to pandas); mapInPandas streams record batches so one task never
holds more than spark.sql.execution.arrow.maxRecordsPerBatch payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def sniff_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap native-expression metadata: byte length + magic-number sniff
    (no decode, stays in codegen). Real formats: PNG/JPEG/RIFF prefixes."""
    head = F.hex(F.substring(F.col(content_col), 1, 4))
    return df.withColumns(
        {
            "n_bytes": F.octet_length(content_col),
            "magic_hex": head,
            "sniffed_mime": F.when(head.startswith("89504E47"), "image/png")
            .when(head.startswith("FFD8FF"), "image/jpeg")
            .when(head.startswith("52494646"), "audio/wav")
            .otherwise("application/octet-stream"),
        }
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in decoder: derives a stable (w, h, c) and an
    8-dim feature vector from the byte content. Replace with a real codec
    via the decode_fn parameter. sha256 (not sha1) so an independent SQL
    engine can recompute every derived column for oracle checks."""
    digest = hashlib.sha256(content).digest()
    w = 16 + digest[0] % 64
    h = 16 + digest[1] % 64
    c = 1 + digest[2] % 3
    feats = np.frombuffer(digest[4:12], dtype=np.uint8).astype(np.float64) / 255.0
    return w, h, c, feats


def decode_and_featurize(
    df: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int, np.ndarray]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas decode + feature-extraction stage. With ``strict=True``
    and no decoder, raises NotImplementedError (the honest production
    posture when codecs are missing); otherwise uses the deterministic
    fake so plumbing stays testable."""
    if decode_fn is None:
        if strict:
            raise NotImplementedError(
                "no media codec available in this environment; pass decode_fn"
            )
        decode_fn = _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                w, h, c, feats = decode_fn(content)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(content),
                        "sha256": hashlib.sha256(content).hexdigest(),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(run, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit one row per
    sampled offset (the real system would decode at timestamps; the
    offsets/batching/explode shape is identical). Native expressions only."""
    n = F.octet_length(content_col)
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    # sha256 (not sha1): an independent SQL engine can recompute the frame
    # digests for oracle checks (DuckDB ships sha256 but not sha1)
    return df.select(
        F.col(id_col),
        n.alias("n_bytes"),
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    ).withColumn(
        "frame_sha256",
        F.sha2(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("byte_offset").cast("string"),
            ),
            256,
        ),
    )
