"""Multimodal-column operators over the shardpack record schema.

Images/audio/video are opaque BINARY entries tagged with a MIME
content_type (draft.md:185-195).  The Spark-side plumbing — schemas,
entry explosion, Arrow-batched decode UDFs — is real and tested; the
actual pixel/sample decoding is STUBBED deterministically because no
image/audio libraries exist in this environment (grep for
`_DECODE_STUBBED`).  Swapping the stub for PIL/libav keeps every
signature and partition shape identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Pixel/sample decoding (resize, frame extraction) still needs PIL/libav
# and stays stubbed; header parsing below is REAL (pure Python).
_DECODE_STUBBED = True


def parse_image_dims(b: bytes) -> tuple[int | None, int | None]:
    """True (width, height) from PNG IHDR / JPEG SOFn / GIF headers.

    Pure-Python parsing of the public container formats — no image
    library required, deterministic, and oracle-checkable.  Returns
    (None, None) for unknown or truncated containers.
    """
    b = bytes(b)
    # PNG: 8-byte signature, then the IHDR chunk (len + 'IHDR' + w + h, BE)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")
    # JPEG: walk segments from SOI until a SOFn frame header
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        n = len(b)
        while i + 9 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return w, h
            if seglen < 2:
                break
            i += 2 + seglen
        return None, None
    # GIF: logical screen descriptor right after the version tag (LE)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")
    return None, None


def _self_pickle_by_value() -> None:
    """mapInPandas closures from this module must travel by value so
    executors need no importable copy of shardpack_spark (see
    format.datasource._pickle_by_value)."""
    import sys

    from pyspark import cloudpickle

    try:
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass

# magic-number sniffing is real logic, not stubbed
_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
]


def explode_entries(df: DataFrame) -> DataFrame:
    """One row per file entry: (key, metadata, file_name, content_type,
    encoding, size, data)."""
    return df.select(
        "key",
        "metadata",
        F.explode("entries").alias("e"),
    ).select("key", "metadata", "e.file_name", "e.content_type", "e.encoding", "e.size", "e.data")


def decode_text_entries(df: DataFrame) -> DataFrame:
    """text/* entries -> utf-8 string column."""
    return (
        explode_entries(df)
        .filter(F.col("content_type").startswith("text/"))
        .withColumn("text", F.decode("data", "utf-8"))
        .drop("data")
    )


def decode_json_entries(df: DataFrame, schema=None) -> DataFrame:
    """application/json entries -> parsed column (map by default)."""
    target = schema or "map<string,string>"
    return (
        explode_entries(df)
        .filter(F.col("content_type") == "application/json")
        .withColumn("json", F.from_json(F.decode("data", "utf-8"), target))
        .drop("data")
    )


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("file_name", StringType()),
        StructField("sniffed_format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched image metadata extraction over image/* entries.

    Magic sniffing, byte stats, and width/height are all REAL: dimensions
    come from parse_image_dims (PNG IHDR / JPEG SOFn / GIF headers, pure
    Python).  Only pixel decoding (resize etc.) remains behind
    _DECODE_STUBBED.  The mapInPandas batch shape is exactly what a
    PIL-based pixel decoder would use.
    """
    _self_pickle_by_value()
    imgs = explode_entries(df).filter(F.col("content_type").startswith("image/")).select(
        "key", "file_name", "data"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = [bytes(b) for b in pdf["data"]]

            def sniff(b: bytes) -> str:
                for magic, name in _MAGIC:
                    if b[: len(magic)] == magic:
                        return name
                return "unknown"

            dims = [parse_image_dims(b) for b in datas]
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "file_name": pdf["file_name"],
                    "sniffed_format": [sniff(b) for b in datas],
                    "n_bytes": [len(b) for b in datas],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return imgs.mapInPandas(decode, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling requires a real media decoder — explicitly
    unimplemented here; the call site and signature are the contract."""
    raise NotImplementedError(
        "video decoding unavailable in this environment (_DECODE_STUBBED); "
        "plug a pyav/ffmpeg mapInPandas decoder with this same signature"
    )
