"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schemas, Arrow batch shapes,
partitioning, UDF signatures — while the actual codec work is stubbed
(this container has no image/audio libraries): ``decode_media`` uses a
deterministic fake decoder unless a real one is injected.  Swapping in
PIL/librosa/ffmpeg touches ONLY ``_fake_decode`` below; every plan stays
identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "duration_ms int, feature array<float>"
)

FEATURE_DIM = 16


def synthetic_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table (binary payload derived from id)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (
                    4 + i % 5
                )
                rows.append(
                    (i, kind, payload, {"src": f"synthetic/{kind}/{i}"})
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "data", "meta"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def media_from_ids(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from an id column: the binary
    payload is the ASCII HEX sha256 of ``media:{id}`` repeated
    ``4 + id % 5`` times.

    Same plumbing as :func:`synthetic_media` (real ``binary`` column,
    Arrow batches, ``MEDIA_SCHEMA``), different payload derivation: raw
    digest bytes would force the oracle to hash a BLOB, which DuckDB's
    ``sha256`` cannot — hex-ASCII payload bytes make the whole
    generate→decode chain replicable by ANY engine with a string sha256,
    which is what buys the ``media_decode`` driver entry its full twin.
    The decode path itself stays byte-generic (``_fake_decode`` hashes
    whatever bytes arrive)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                kind = kinds[i % 3]
                hx = hashlib.sha256(f"media:{i}".encode()).hexdigest()
                payload = (hx * (4 + i % 5)).encode("ascii")
                rows.append(
                    (i, kind, payload, {"src": f"synthetic/{kind}/{i}"})
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "data", "meta"]
            )

    return ids.select(F.col(id_col)).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(kind: str, data: bytes) -> tuple[int, int, int, int, list[float]]:
    """Deterministic stand-in for a real codec.

    A real implementation raises ``NotImplementedError`` until the codec
    library is available; the fake keeps shapes realistic so every
    downstream plan/test is exercised.
    """
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192 if kind != "audio" else 0
    height = 64 + h[1] % 192 if kind != "audio" else 0
    n_frames = 1 if kind == "image" else 1 + h[2] % 120
    duration = 0 if kind == "image" else 250 + int.from_bytes(h[3:5], "big") % 60000
    feat = [
        (int.from_bytes(h[(4 + 2 * j) : (6 + 2 * j)], "big") / 65535.0)
        for j in range(FEATURE_DIM)
    ]
    return width, height, n_frames, duration, feat


def real_decode(kind: str, data: bytes):  # pragma: no cover - stub
    """Real codec hook. Not available in this environment."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this container; "
        "inject via decode_media(..., decoder=...)"
    )


def decode_media(media: DataFrame, decoder=None) -> DataFrame:
    """Batched decode/feature-extract over ``mapInPandas``.

    Binary stays opaque through Arrow; one Python roundtrip total.  The
    partitioning contract: upstream should repartition by a size-aware key
    so one huge video doesn't skew a task — callers own that choice.
    """
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                w, h, nf, dur, feat = decode(kind, bytes(data))
                rows.append((int(mid), kind, w, h, nf, dur, feat))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "n_frames", "duration_ms", "feature",
                ],
            )

    return media.select("media_id", "kind", "data").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def sample_frames(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indexes JVM-side
    (the decode of individual frames would be another mapInPandas)."""
    vids = decoded.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
