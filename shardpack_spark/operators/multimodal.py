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

_DECODE_STUBBED = True  # real decoders unavailable in this container


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
    """Arrow-batched image 'decode' over image/* entries.

    Magic sniffing and byte stats are real; width/height are a
    deterministic stand-in (derived from content bytes) because no image
    codec ships in this container (_DECODE_STUBBED).  The mapInPandas
    batch shape is exactly what a PIL-based decoder would use.
    """
    _self_pickle_by_value()
    imgs = explode_entries(df).filter(F.col("content_type").startswith("image/")).select(
        "key", "file_name", "data"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = pdf["data"]

            def sniff(b: bytes) -> str:
                for magic, name in _MAGIC:
                    if bytes(b[: len(magic)]) == magic:
                        return name
                return "unknown"

            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "file_name": pdf["file_name"],
                    "sniffed_format": [sniff(bytes(b)) for b in datas],
                    "n_bytes": [len(b) for b in datas],
                    # deterministic fake dimensions (NOT real decode)
                    "width": [(len(b) % 640) + 1 for b in datas],
                    "height": [((b[-1] if len(b) else 0) % 480) + 1 for b in datas],
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
