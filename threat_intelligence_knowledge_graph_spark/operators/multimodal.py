"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets are carried as ``binary`` columns with a typed
metadata map; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``. The real codecs (PIL/ffmpeg)
are not in this container, so the decode step is STUBBED: with
``fake=True`` (default) a deterministic synthetic decoder parses our own
16-byte header; with ``fake=False`` the operator raises
``NotImplementedError`` unless the real library imports. The Spark-side
plumbing — schema, partitioning, batch shape, UDF signatures — is real
and tested either way.

Payload layout (synthetic): ``b"TIKG" + kind(1) + width(u16) + height(u16)
+ n_frames(u16) + reserved(5)`` then pseudo-pixel bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ASSETS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

_KIND_CODE = {"image": 1, "audio": 2, "video": 3}
_CODE_KIND = {v: k for k, v in _KIND_CODE.items()}


def _make_payload(asset_id: int, kind: str) -> bytes:
    rng = np.random.RandomState(asset_id % (2**31))
    w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
    frames = int(rng.randint(1, 30)) if kind == "video" else 1
    header = b"TIKG" + struct.pack("<BHHH5x", _KIND_CODE[kind], w, h, frames)
    body = rng.randint(0, 256, size=min(w * h, 512), dtype=np.int32).astype(np.uint8)
    return header + body.tobytes()


def synth_assets(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic asset table, generated on executors."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                rows.append(
                    {
                        "asset_id": i,
                        "kind": kind,
                        "payload": _make_payload(i, kind),
                        "meta": {"source": f"synth://{i}", "codec": "tikg-fake"},
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    parts = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, ASSETS_SCHEMA)


def pack_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Pack a payload per id with ARITHMETIC dims (width = 8 + id%56,
    height = 8 + (id·7)%56, frames = 1 + id%29 for video) — the
    SQL-predictable twin of ``synth_assets``'s RNG dims, so the full
    pack → binary column → Arrow → decode round trip is verifiable
    against an analytic oracle (driver entry ``multimodal_decode``)."""
    kinds = ["image", "audio", "video"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[id_col]:
                i = int(raw)
                kind = kinds[i % 3]
                w, h = 8 + i % 56, 8 + (i * 7) % 56
                frames = 1 + i % 29 if kind == "video" else 1
                header = b"TIKG" + struct.pack("<BHHH5x", _KIND_CODE[kind], w, h, frames)
                body = (np.arange(min(w * h, 512), dtype=np.int64) * 31 + i) % 256
                rows.append(
                    {
                        "asset_id": i,
                        "kind": kind,
                        "payload": header + body.astype(np.uint8).tobytes(),
                        "meta": {"source": f"synth://{i}", "codec": "tikg-fake"},
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return ids.select(F.col(id_col)).mapInPandas(gen, ASSETS_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_header(payload: bytes) -> tuple[int, int, int, int]:
    if payload[:4] != b"TIKG":
        raise ValueError("not a TIKG synthetic payload")
    code, w, h, frames = struct.unpack("<BHHH", payload[4:11])
    return code, w, h, frames


def decode_assets(assets: DataFrame, fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract kernel.

    ``fake=True``: deterministic synthetic decode (header parse + byte
    histogram features). ``fake=False``: requires a real codec library —
    raises ``NotImplementedError`` in this container (stub gate).
    """
    if not fake:
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real decode needs PIL/ffmpeg, absent in this environment; "
                "use fake=True for the deterministic synthetic decoder"
            ) from e

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"].values, pdf["payload"].values):
                code, w, h, frames = _decode_header(bytes(payload))
                body = np.frombuffer(bytes(payload)[16:], dtype=np.uint8)
                hist, _ = np.histogram(body, bins=feature_dim, range=(0, 256))
                feats = (hist / max(len(body), 1)).astype(np.float32)
                rows.append(
                    {
                        "asset_id": int(asset_id),
                        "kind": _CODE_KIND[code],
                        "width": int(w),
                        "height": int(h),
                        "n_frames": int(frames),
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "width", "height", "n_frames", "features"],
            )

    return assets.select("asset_id", "payload").mapInPandas(kernel, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for video assets: one row per sampled frame
    index — pure expressions (sequence + explode), no kernel needed."""
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def resize_plan(decoded: DataFrame, target: int = 32) -> DataFrame:
    """Resize metadata computation (aspect-preserving target dims) —
    expression-only; actual pixel resampling belongs to the stubbed codec."""
    scale = F.least(
        F.lit(target) / F.col("width"), F.lit(target) / F.col("height")
    )
    return decoded.select(
        "asset_id",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias("out_width"),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias("out_height"),
    )
