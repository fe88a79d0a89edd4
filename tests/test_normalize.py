"""Text normalization + compression-ratio signals.

clean_text is pinned row-for-row against a pure-Python reference that
applies the identical fold tables; compression signals against direct
zlib at the same level.
"""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators.normalize import (
    clean_text,
    compression_signals,
    python_clean_text,
)
from shardpack_spark.tables import load_table

MESSY = [
    (0, "Café  “déjà vu”  —  naïve\tœuvre…"),
    (1, "ʼplain ascii stays put (mostly)"),
    (2, "ctrl\x00chars\x1fand\x0bweird\x7fbytes"),
    (3, "ßtraße  ĳsberg  Łódź  Ħello  þorn"),
    (4, "zero​width‌joiners﻿gone"),
    (5, "  leading and trailing   \n\n spaces \t "),
    (6, ""),
    (7, "ÀÁÂÃÄÅ àáâãäå ÈÉÊË èéêë Ìí Òó Ùú Ýý Ññ Çç"),
]


@pytest.fixture(scope="module")
def messy_df(spark):
    return spark.createDataFrame(MESSY, "doc_id long, text string")


def test_clean_text_matches_python_reference(spark, messy_df):
    got = {
        r["doc_id"]: r["clean"] for r in clean_text(messy_df).collect()
    }
    for i, s in MESSY:
        assert got[i] == python_clean_text(s), (i, s, got[i])


def test_clean_text_idempotent(spark, messy_df):
    once = clean_text(messy_df).select("doc_id", F.col("clean").alias("text"))
    twice = {r["doc_id"]: r["clean"] for r in clean_text(once).collect()}
    first = {r["doc_id"]: r["clean"] for r in clean_text(messy_df).collect()}
    assert twice == first


def test_clean_text_specific_folds(spark, messy_df):
    got = {r["doc_id"]: r["clean"] for r in clean_text(messy_df).collect()}
    assert got[0] == 'Cafe "deja vu" - naive oeuvre...'
    assert got[2] == "ctrlcharsandweirdbytes"
    assert got[3] == "sstrasse ijsberg Lodz Hello thorn"
    assert got[4] == "zerowidthjoinersgone"
    assert got[5] == "leading and trailing spaces"
    assert got[6] == ""


def test_clean_text_on_documents_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    rows = clean_text(docs).select("doc_id", "text", "clean").collect()
    assert len(rows) == 50
    for r in rows:
        assert r["clean"] == python_clean_text(r["text"])


def test_compression_signals_match_zlib(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    got = {
        r["doc_id"]: (r["raw_bytes"], r["zlib_bytes"], r["compression_ratio"])
        for r in compression_signals(docs).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        raw = r["text"].encode("utf-8")
        gz = zlib.compress(raw, 6)
        exp_ratio = len(gz) / len(raw) if raw else None
        assert got[r["doc_id"]] == (len(raw), len(gz), pytest.approx(exp_ratio))


def test_compression_signals_empty_text_null_ratio(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    got = {r["doc_id"]: r["compression_ratio"] for r in compression_signals(df).collect()}
    assert got == {1: None, 2: None}


def test_repetitive_text_compresses_far_better_than_noise(spark):
    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(5000))
    boiler = "click here to subscribe " * 200
    df = spark.createDataFrame(
        [(1, noise), (2, boiler)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["compression_ratio"] for r in compression_signals(df).collect()}
    assert got[1] > 0.7
    assert got[2] < 0.1


def test_clean_text_hypothesis_fuzz(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # build one batch of random unicode docs, run ONE Spark job for the
    # whole sample (per-example Spark jobs would be 100x slower)
    samples = []

    @settings(
        max_examples=200,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.text(
            alphabet=st.characters(
                min_codepoint=0,
                max_codepoint=0x2100,
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            max_size=80,
        )
    )
    def collect(s):
        samples.append(s)

    collect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["clean"] for r in clean_text(df).collect()}
    for i, s in enumerate(samples):
        assert got[i] == python_clean_text(s), repr(s)
