"""Multimodal-column operators over the shardpack record schema.

Images/audio/video are opaque BINARY entries tagged with a MIME
content_type (draft.md:185-195).  Container-level parsing is REAL pure
Python: image dimensions (PNG IHDR / JPEG SOFn / GIF), AVI demuxing and
frame sampling (RIFF chunk walk — MJPEG frames come out as standalone
JPEGs).  Pixel decoding is REAL wheel-free for the spec's first-class
image types (draft.md:185-190): `operators.imagecodec` decodes PNG,
baseline + progressive JPEG, and GIF in pure Python/numpy, so
`resize_images` produces true PNG thumbnails with no image library
installed.  PIL, when importable, extends coverage to other containers
(and `decoder='auto'` prefers its C decoders for bulk throughput);
payloads neither path decodes degrade to deterministic tagged marker
bytes per record (never a job abort).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# module-LEVEL import, never inside executor-run function bodies: the
# reference must be captured in pickled globals so by-value registration
# ships it — a runtime `from shardpack_spark...` inside a UDF body dies
# with ModuleNotFoundError on vanilla executors that can't import the
# package (caught by the /verify vanilla-session simulation)
from shardpack_spark.operators import imagecodec

# Pixel decoding is real (pure Python) for PNG + baseline/progressive
# JPEG + GIF via operators.imagecodec; formats beyond those still need
# PIL/libav and degrade to tagged marker bytes without it.
_DECODE_STUBBED = False


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
    format.datasource._pickle_by_value).  format.msgpack is registered
    too: decode_msgpack_entries closes over its unpackb."""
    import sys

    from pyspark import cloudpickle

    from shardpack_spark.format import msgpack as msgpack_mod
    from shardpack_spark.operators import imagecodec as imagecodec_mod

    for mod in (msgpack_mod, imagecodec_mod, sys.modules[__name__]):
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass


def _check_decoder(decoder: str) -> None:
    if decoder not in ("pure", "auto"):
        raise ValueError(f"decoder must be 'pure' or 'auto', got {decoder!r}")


def _decode_pixels(data: bytes, decoder: str, pil_image):
    """(pixel array, decode_path) for one payload, or (None, None) when
    undecodable.  ``decoder='pure'`` runs the wheel-free codec first
    (bit-identical results everywhere); ``'auto'`` prefers PIL's C
    decoders when importable (bulk-throughput deployments — identical
    to 'pure' on a PIL-less cluster).  ``decode_path`` ('pure'/'pil')
    is the same telemetry vocabulary the perceptual signatures carry,
    so ``perceptual.decode_path_rollup`` covers these ops too."""
    import io

    import numpy as np

    def pure():
        return imagecodec.decode_image(data)

    def pil():
        if pil_image is None:
            raise ValueError("PIL not importable")
        im = pil_image.open(io.BytesIO(data))
        # preserve band count so feature semantics (channels, luma stats)
        # match the pure decoder: grayscale stays 1-channel instead of
        # being force-converted to RGB; only modes outside the pure
        # decoder's output space (palette, bilevel, CMYK...) convert
        if im.mode == "P":
            im = im.convert("RGBA" if "transparency" in im.info else "RGB")
        elif im.mode == "1":
            im = im.convert("L")
        elif im.mode not in ("L", "LA", "RGB", "RGBA", "I;16"):
            im = im.convert("RGB")
        return np.asarray(im)

    order = ((pil, "pil"), (pure, "pure")) if decoder == "auto" else (
        (pure, "pure"), (pil, "pil"))
    for fn, path in order:
        try:
            return fn(), path
        except Exception:
            continue
    return None, None


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
    Python).  Pixel-level statistics live in ``image_pixel_features``
    (full decode, costlier); this pass stays header-only so a corpus-wide
    inventory never decompresses a pixel.
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


PIXEL_FEATURE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("file_name", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("mean_luma", DoubleType()),
        StructField("std_luma", DoubleType()),
        StructField("entropy_bits", DoubleType()),
        StructField("extreme_frac", DoubleType()),
        StructField("decode_path", StringType()),
    ]
)


def image_pixel_features(df: DataFrame, decoder: str = "pure") -> DataFrame:
    """REAL pixel statistics over image/* entries (PNG / baseline +
    progressive JPEG / GIF via the pure-Python ``operators.imagecodec``;
    PIL extends coverage when importable — ``decoder='auto'`` prefers
    PIL's C decoders for bulk throughput, ``'pure'`` (default) keeps
    results bit-identical on every cluster; undecodable payloads yield
    no row rather than aborting the corpus job).

    Per image: true (height, width, channels) from decoded pixels,
    mean/std of BT.601 luma, the 256-bin luma histogram's Shannon
    entropy in bits (near-0 = blank/synthetic, ~8 = dense natural
    content), and the fraction of pixels at the extremes (<=2 or >=253 —
    the over/under-exposure + letterboxing signal).  The standard
    image-quality cuts a multimodal curation pipeline filters on, as
    codegen-free numpy per batch.

    Undecodable or over-budget payloads emit a decode_path='surrogate'
    row with null pixel statistics (width/height from the header parse
    when readable) instead of vanishing: ``decode_path_rollup`` over
    this output then reports the true surrogate fraction — a dropped
    row would hide exactly the degradation the telemetry alerts on."""
    _check_decoder(decoder)
    _self_pickle_by_value()
    imgs = explode_entries(df).filter(
        F.col("content_type").startswith("image/")
    ).select("key", "file_name", "data")

    def stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        try:
            from PIL import Image
        except ImportError:
            Image = None

        for pdf in batches:
            rows = []
            for key, fname, data in zip(pdf["key"], pdf["file_name"], pdf["data"]):
                data = bytes(data)
                arr, dpath = _decode_pixels(data, decoder, Image)
                if arr is None:
                    w, h = parse_image_dims(data)
                    rows.append(
                        {
                            "key": key,
                            "file_name": fname,
                            "width": w,
                            "height": h,
                            "channels": None,
                            "mean_luma": None,
                            "std_luma": None,
                            "entropy_bits": None,
                            "extreme_frac": None,
                            "decode_path": "surrogate",
                        }
                    )
                    continue
                channels = 1 if arr.ndim == 2 else arr.shape[2]
                luma = imagecodec.to_gray(arr)
                if str(arr.dtype) == "uint16":
                    luma = luma / 257.0
                h, w = luma.shape
                q = np.clip(np.round(luma), 0, 255).astype(np.int64)
                hist = np.bincount(q.ravel(), minlength=256).astype(np.float64)
                p = hist / hist.sum()
                nz = p[p > 0]
                rows.append(
                    {
                        "key": key,
                        "file_name": fname,
                        "width": w,
                        "height": h,
                        "channels": channels,
                        "mean_luma": float(luma.mean()),
                        "std_luma": float(luma.std()),
                        "entropy_bits": float(-(nz * np.log2(nz)).sum()),
                        "extreme_frac": float(((q <= 2) | (q >= 253)).mean()),
                        "decode_path": dpath,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "file_name", "width", "height", "channels",
                    "mean_luma", "std_luma", "entropy_bits", "extreme_frac",
                    "decode_path",
                ],
            )

    return imgs.mapInPandas(stats_batch, PIXEL_FEATURE_SCHEMA)


def _resize_pixels(
    data: bytes, width: int, height: int, decoder: str = "pure"
) -> tuple[bytes, str]:
    """Pixel-level resize -> (payload bytes, decode_path).  REAL
    wheel-free for PNG, baseline + progressive JPEG, and GIF:
    `operators.imagecodec` decodes pixels in pure Python/numpy, bilinear
    resampling runs in float64, and the thumbnail re-encodes as PNG
    (lossless, self-describing — output payloads always start with the
    PNG signature).  With ``decoder='pure'`` (default) the pure path
    runs FIRST so outputs are bit-identical on every cluster; ``'auto'``
    prefers PIL's C decoders when importable.  Payloads neither path
    decodes return a deterministic tagged marker (target dims + a digest
    of the source bytes) — per-record degradation, never a job abort,
    and clearly non-image so it can't be mistaken for a real thumbnail.
    ``decode_path`` is 'pure'/'pil' for real thumbnails and 'surrogate'
    for marker bytes — the perceptual telemetry vocabulary, so
    ``perceptual.decode_path_rollup`` covers resize output too."""
    import hashlib

    def pure() -> bytes:
        arr = imagecodec.decode_image(data)
        if str(arr.dtype) == "uint16":
            arr = arr / 257.0  # 16-bit channels -> 8-bit thumbnail range
        return imagecodec.encode_png(imagecodec.resize_array(arr, width, height))

    def pil() -> bytes:  # pragma: no cover - PIL absent in this environment
        import io

        from PIL import Image  # noqa: PLC0415

        im = Image.open(io.BytesIO(data))
        out = io.BytesIO()
        # always PNG, whatever the source format: the docstring contract
        # ("output payloads start with the PNG signature") must hold on
        # PIL-equipped clusters under decoder='auto' too
        thumb = im.resize((width, height))
        # catch-all: any mode PNG can't encode (F, LAB, HSV, CMYK...)
        # converts rather than raising into the surrogate path — palette
        # included, since a resized palette image has interpolated pixels
        if thumb.mode not in ("1", "L", "LA", "RGB", "RGBA", "I;16"):
            thumb = thumb.convert("RGB")
        thumb.save(out, format="PNG")
        return out.getvalue()

    order = ((pil, "pil"), (pure, "pure")) if decoder == "auto" else (
        (pure, "pure"), (pil, "pil"))
    errors = []
    for fn, path in order:
        try:
            return fn(), path
        except ImportError:
            errors.append("no-wheel")
        except Exception:
            errors.append("decode")
    digest = hashlib.sha256(data).hexdigest()[:16].encode()
    if "no-wheel" in errors:  # a wheel MIGHT have decoded it
        return b"STUB-RESIZE:%dx%d:" % (width, height) + digest, "surrogate"
    # one corrupt/undecodable image must not abort a corpus-wide job:
    # per-record error marker, same tagged-bytes contract as the stub
    return b"DECODE-ERROR:%dx%d:" % (width, height) + digest, "surrogate"


RESIZED_SCHEMA = (
    "key string, file_name string, content_type string, "
    "src_width int, src_height int, width int, height int, data binary, "
    "decode_path string"
)


def resize_images(
    df: DataFrame, width: int, height: int, decoder: str = "pure"
) -> DataFrame:
    """Thumbnail/resize pass over image/* entries (shardpack row input).

    The Spark-side plumbing is real and scale-shaped: explode to one row
    per image entry, Arrow-batched mapInPandas, binary in / binary out,
    source dims from the pure-Python header parsers.  ``decoder='auto'``
    prefers PIL's C decoders when importable (bulk throughput);
    ``'pure'`` (default) keeps thumbnails bit-identical on every
    cluster.  Output rows: (key, file_name, content_type, src_width,
    src_height, width, height, data, decode_path) — decode_path
    ('pure'/'pil'/'surrogate') feeds ``perceptual.decode_path_rollup``,
    the corpus-level alert on silently-degraded thumbnails."""
    _check_decoder(decoder)
    _self_pickle_by_value()
    imgs = explode_entries(df).filter(
        F.col("content_type").startswith("image/")
    ).select("key", "file_name", "content_type", "data")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = [bytes(b) for b in pdf["data"]]
            dims = [parse_image_dims(b) for b in datas]
            resized = [_resize_pixels(b, width, height, decoder) for b in datas]
            out = [o for o, _ in resized]
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "file_name": pdf["file_name"],
                    # thumbnails re-encode as PNG; marker bytes keep the
                    # source type so a consumer can see what failed
                    "content_type": [
                        "image/png" if o[:8] == b"\x89PNG\r\n\x1a\n" else ct
                        for o, ct in zip(out, pdf["content_type"])
                    ],
                    "src_width": [w for w, _ in dims],
                    "src_height": [h for _, h in dims],
                    "width": [width] * len(datas),
                    "height": [height] * len(datas),
                    "data": out,
                    "decode_path": [pth for _, pth in resized],
                }
            )

    return imgs.mapInPandas(do_resize, RESIZED_SCHEMA)


def parse_avi(b: bytes) -> dict:
    """Parse an AVI (RIFF) container: header info + per-frame byte ranges.

    Pure structure walking of the public RIFF format — no media library.
    Returns {"width", "height", "total_frames", "us_per_frame",
    "frames": [(stream, bytes), ...]} where each frame entry is a video
    chunk ('##dc'/'##db' FOURCC) payload — for MJPEG AVIs that payload
    is a standalone JPEG, so sampled frames feed parse_image_dims /
    image_features directly.  Raises ValueError on a non-AVI container.
    """
    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) container")
    info = {"width": None, "height": None, "total_frames": None, "us_per_frame": None}
    frames: list[tuple[int, bytes]] = []

    def walk(lo: int, hi: int) -> None:
        i = lo
        while i + 8 <= hi:
            fourcc = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            body_lo, body_hi = i + 8, min(i + 8 + size, hi)
            if fourcc == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-type tag
            elif fourcc == b"avih" and size >= 40:
                info["us_per_frame"] = int.from_bytes(b[body_lo : body_lo + 4], "little")
                info["total_frames"] = int.from_bytes(b[body_lo + 16 : body_lo + 20], "little")
                info["width"] = int.from_bytes(b[body_lo + 32 : body_lo + 36], "little")
                info["height"] = int.from_bytes(b[body_lo + 36 : body_lo + 40], "little")
            elif (
                len(fourcc) == 4
                and fourcc[:2].isdigit()
                and fourcc[2:4] in (b"dc", b"db")
            ):
                frames.append((int(fourcc[:2]), b[body_lo:body_hi]))
            i = body_hi + (size & 1)  # chunks are word-aligned

    walk(12, len(b))
    info["frames"] = frames
    return info


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("file_name", StringType()),
        StructField("frame_index", LongType()),
        StructField("total_frames", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("frame_data", BinaryType()),
    ]
)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Every n-th video frame from video/* entries, Arrow-batched.

    REAL for AVI containers: frames come out of the RIFF 'movi' chunk
    walk (parse_avi) — an MJPEG AVI yields standalone JPEGs that compose
    with image_features for per-frame decoding.  Non-AVI containers
    (mp4/mkv need a real demuxer) surface as zero rows rather than an
    error, mirroring image_features' unknown-format behavior.

    Scale shape: one input row fans out to ceil(frames/every_n) output
    rows inside the executor batch — no shuffle; downstream per-frame
    work repartitions if a single video's frames should spread.
    """
    _self_pickle_by_value()
    vids = explode_entries(df).filter(F.col("content_type").startswith("video/")).select(
        "key", "file_name", "data"
    )
    step = max(1, int(every_n))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in VIDEO_FRAME_SCHEMA.fields}
            for key, fname, data in zip(pdf["key"], pdf["file_name"], pdf["data"]):
                try:
                    avi = parse_avi(bytes(data))
                except ValueError:
                    continue
                video_frames = [fb for stream, fb in avi["frames"] if stream == 0]
                for idx in range(0, len(video_frames), step):
                    rows["key"].append(key)
                    rows["file_name"].append(fname)
                    rows["frame_index"].append(idx)
                    rows["total_frames"].append(len(video_frames))
                    rows["width"].append(avi["width"])
                    rows["height"].append(avi["height"])
                    rows["frame_data"].append(video_frames[idx])
            yield pd.DataFrame(rows)

    return vids.mapInPandas(decode, VIDEO_FRAME_SCHEMA)


def parse_wav_header(b: bytes) -> dict:
    """Parse a WAV (RIFF/WAVE) header: sample rate, channels, bit depth,
    sample count, duration — pure Python, deterministic, no audio libs.

    Walks RIFF chunks for 'fmt ' and 'data' (ignores others: LIST, fact,
    cue).  Raises ValueError on anything that is not a PCM-style WAV.
    Only sample DECODING (resample, spectrogram) would need an audio
    library; header analytics at corpus scale need exactly this.
    """
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if cid == b"fmt " and clen >= 16:
            fmt = struct.unpack_from("<HHIIHH", b, body)
        elif cid == b"data":
            data_len = min(clen, len(b) - body)
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, sample_rate, _, block_align, bits = fmt
    if channels == 0 or block_align == 0 or sample_rate == 0:
        raise ValueError("degenerate fmt chunk")
    n_samples = data_len // block_align
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_s": n_samples / sample_rate,
    }


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("file_name", StringType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched WAV header analytics over audio/* entries — the
    audio leg of the multimodal triad (image_features / audio_features /
    sample_video_frames), same mapInPandas batch shape throughout.
    Non-WAV or corrupt payloads are dropped (count them upstream via
    sniffing if needed)."""
    _self_pickle_by_value()
    auds = explode_entries(df).filter(F.col("content_type").startswith("audio/")).select(
        "key", "file_name", "data"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in AUDIO_FEATURE_SCHEMA.fields}
            for key, fname, data in zip(pdf["key"], pdf["file_name"], pdf["data"]):
                try:
                    h = parse_wav_header(bytes(data))
                except ValueError:
                    continue
                rows["key"].append(key)
                rows["file_name"].append(fname)
                for k, v in h.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return auds.mapInPandas(decode, AUDIO_FEATURE_SCHEMA)


NPY_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("file_name", StringType()),
        StructField("member", StringType()),
        StructField("dtype", StringType()),
        StructField("shape", ArrayType(LongType())),
        StructField("values", ArrayType(DoubleType())),
    ]
)


def decode_npy_entries(df: DataFrame) -> DataFrame:
    """application/x-npy / x-npz entries -> typed tensor rows.

    The spec recommends shipping tensors as ``application/x-npy`` /
    ``x-npz`` entries (draft.md:185-195); this is the REAL decode — the
    public .npy container format via ``numpy.load`` (``allow_pickle``
    stays False: object arrays are code execution, not data).  One output
    row per array: npz archives yield one row per member with ``member``
    set; plain npy rows have ``member`` NULL.  Numeric arrays arrive as
    float64 ``values`` in C order with the original ``dtype``/``shape``
    preserved; non-numeric arrays keep their metadata with NULL values.
    Arrow-batched mapInPandas — the same shape as every other decoder
    here, linear in payload bytes.
    """
    _self_pickle_by_value()
    tensors = explode_entries(df).filter(
        F.col("content_type").isin("application/x-npy", "application/x-npz")
    ).select("key", "file_name", "content_type", "data")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        for pdf in batches:
            rows = []
            for key, fname, ctype, data in zip(
                pdf["key"], pdf["file_name"], pdf["content_type"], pdf["data"]
            ):
                buf = io.BytesIO(bytes(data))
                if ctype == "application/x-npz":
                    with np.load(buf, allow_pickle=False) as npz:
                        arrays = [(m, npz[m]) for m in sorted(npz.files)]
                else:
                    arrays = [(None, np.load(buf, allow_pickle=False))]
                for member, arr in arrays:
                    numeric = arr.dtype.kind in "biuf"
                    rows.append(
                        {
                            "key": key,
                            "file_name": fname,
                            "member": member,
                            "dtype": str(arr.dtype),
                            "shape": list(arr.shape),
                            "values": (
                                arr.astype("float64").ravel(order="C").tolist()
                                if numeric
                                else None
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["key", "file_name", "member", "dtype", "shape", "values"]
            )

    return tensors.mapInPandas(decode, NPY_SCHEMA)


MSGPACK_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("file_name", StringType()),
        StructField("json", StringType()),
    ]
)


def decode_msgpack_entries(df: DataFrame) -> DataFrame:
    """application/msgpack entries -> canonical JSON string column.

    The spec's second recommended metadata encoding (draft.md:92-94,
    :185-195), decoded by the pure-Python codec in ``format.msgpack``
    (no msgpack library in this environment).  The object is re-emitted
    as deterministic JSON (sorted keys; bin values base64) so downstream
    extraction is the exact same ``from_json`` path the JSON entries use.
    """
    _self_pickle_by_value()
    packed = explode_entries(df).filter(
        F.col("content_type") == "application/msgpack"
    ).select("key", "file_name", "data")

    from shardpack_spark.format.msgpack import unpackb

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import base64
        import json

        def default(o):
            if isinstance(o, (bytes, bytearray)):
                return base64.b64encode(bytes(o)).decode("ascii")
            raise TypeError(type(o).__name__)

        def norm_keys(o):
            # msgpack maps allow bytes/int/bool/nil keys; json.dumps
            # accepts only str (and can't sort mixed types).  Stringify
            # deterministically: bytes -> base64 (same as bin values),
            # everything else -> its JSON literal.  Distinct msgpack keys
            # can collide post-conversion (1 vs "1"); last one wins,
            # deterministic because msgpack maps preserve wire order.
            if isinstance(o, dict):
                return {
                    (
                        k
                        if isinstance(k, str)
                        else default(k)
                        if isinstance(k, (bytes, bytearray))
                        else json.dumps(k)
                    ): norm_keys(v)
                    for k, v in o.items()
                }
            if isinstance(o, list):
                return [norm_keys(v) for v in o]
            return o

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "file_name": pdf["file_name"],
                    "json": [
                        json.dumps(
                            norm_keys(unpackb(bytes(b))), sort_keys=True, default=default
                        )
                        for b in pdf["data"]
                    ],
                }
            )

    return packed.mapInPandas(decode, MSGPACK_SCHEMA)
