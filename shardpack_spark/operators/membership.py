"""Distributed Bloom-filter membership for join-free "seen before" checks.

URL-level dedup against a multi-billion-row history table is the classic
use: a semi-join shuffles the full probe side, while a Bloom filter of
the history is a few hundred MB broadcast once, then a vectorized
bit-test per row — no shuffle, no join, bounded false-positive rate and
zero false negatives (candidates can be exact-checked afterwards against
only the filter's hits).

Build plan shape: the two base hashes (xxhash64 with different seeds)
are computed JVM-side; each partition folds its rows into a local numpy
bitmap inside mapInPandas; the driver ORs the per-partition bitmaps —
data crosses the wire only as num_partitions fixed-size bitmaps, never
as rows.  The k probe positions use standard double hashing
(h1 + i*h2, Kirsch–Mitzenmacher), so adding hash functions costs no
extra string hashing.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BloomFilter:
    """Immutable bitmap + parameters; picklable, broadcast-friendly."""

    def __init__(self, bits: np.ndarray, n_hashes: int, seed: int):
        self.bits = bits  # uint8 array, little-endian bit order
        self.n_hashes = n_hashes
        self.seed = seed

    @property
    def m(self) -> int:
        return len(self.bits) * 8

    def positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing — vectorized."""
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (
            h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None]
        ) % np.uint64(self.m)

    def might_contain_np(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self.positions(h1, h2)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return ((self.bits[byte_idx] & bit) != 0).all(axis=1)


def _hash_cols(col: Column, seed: int) -> tuple[Column, Column]:
    return (
        F.xxhash64(col, F.lit(seed)),
        F.xxhash64(col, F.lit(seed + 0x9E3779B9)),
    )


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int,
    fpp: float = 0.01,
    seed: int = 42,
) -> BloomFilter:
    """One scan -> a BloomFilter sized for (expected_items, fpp).

    m = -n ln(p) / (ln 2)^2 bits, k = (m/n) ln 2 — the textbook optimum.
    """
    if expected_items < 1:
        raise ValueError(f"expected_items must be >= 1, got {expected_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m_bits = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m_bits = (m_bits + 7) // 8 * 8
    k = max(1, round(m_bits / expected_items * math.log(2)))
    n_bytes = m_bits // 8

    h1c, h2c = _hash_cols(F.col(col), seed)
    hashes = df.select(h1c.alias("h1"), h2c.alias("h2"))

    def to_bitmap(batches):
        import pandas as pd

        bits = np.zeros(n_bytes, dtype=np.uint8)
        i = np.arange(k, dtype=np.uint64)
        for b in batches:
            h1 = b["h1"].to_numpy().astype(np.uint64)
            h2 = b["h2"].to_numpy().astype(np.uint64)
            pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
            flat = pos.ravel()
            np.bitwise_or.at(bits, (flat >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (flat & np.uint64(7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    def or_merge(batches):
        import pandas as pd

        acc = np.zeros(n_bytes, dtype=np.uint8)
        for b in batches:
            for buf in b["bits"]:
                acc |= np.frombuffer(buf, dtype=np.uint8)
        yield pd.DataFrame({"bits": [acc.tobytes()]})

    # two-level merge: a 1000-task scan would otherwise ship 1000 bitmaps
    # (each m/8 bytes — ~150 MB at a billion items / 1% fpp) straight to
    # the driver.  One distributed OR-reduce stage first caps the collect
    # at 16 bitmaps regardless of scan parallelism.
    bitmaps = hashes.mapInPandas(to_bitmap, "bits binary")
    parts = bitmaps.repartition(16).mapInPandas(or_merge, "bits binary").collect()
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for r in parts:
        merged |= np.frombuffer(r["bits"], dtype=np.uint8)
    return BloomFilter(merged, k, seed)


def might_contain(df: DataFrame, col: str, bloom: BloomFilter) -> DataFrame:
    """df + boolean ``might_contain`` column — vectorized bit tests over a
    task-broadcast bitmap; no shuffle, no join."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.pandas.functions import pandas_udf

    globals().setdefault("pd", pd)

    @pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        out = bloom.might_contain_np(
            h1.to_numpy().astype(np.uint64), h2.to_numpy().astype(np.uint64)
        )
        return pd.Series(out)

    h1c, h2c = _hash_cols(F.col(col), bloom.seed)
    return df.withColumn("might_contain", probe(h1c, h2c))
