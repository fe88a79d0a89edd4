"""Adversarial-corpus fuzz of the oracle gate: selected text-family
queries must hash-match DuckDB on SYNTHETIC documents tables, not just
the driver's word-soup corpus.

Each case writes a documents.parquet with the driver schema into a tmp
dir and runs the REAL driver comparison (run_declared_query) over it.
Text stays inside the driver data envelope (printable ASCII + newline +
tab — TESTDATA documents are ASCII word soup), because the queries'
canonicalization contract is defined against that envelope; unicode
robustness for the underlying string ops is covered by the dedicated
clean_text / html_to_text fuzzes.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'

from shardpack_spark.oracle import run_declared_query

QUERIES = [
    "q02_shardpack_roundtrip",
    "q29_fuzzy_dedup",
    "q28_exact_dedup",
    "q30d_sampling",
    "q31_text_stats",
    "q32_doc_features",
    "q33_tfidf",
    "q34_lang_id",
    "q36_simhash",
    "q37_dedup_clusters",
    "q39_metadata_only_scan",
    "q40_multimodal_text_decode",
    "q41_image_features",
    "q53_shardpack_point_lookup",
    "q43_contamination",
    "q59_pii_redaction",
    "q60_repetition",
    "q62_curation_scores",
]

_EDGE_TEXTS = [
    "...!!!???",  # punctuation only
    "word",  # single token
    "a\n\n\nb\n",  # newline runs
    'quotes "double" and \'single\' and back\\slash',
    "regex specials .*+?[](){}|^$ stay data",
    "tabs\tbetween\ttokens and  double  spaces",
    "the the the the the the the the",  # stopword flood
    "x" * 500,  # one long word
    "1 22 333 4444 55555 mixed 99 numbers",
    "the quick brown fox jumps over the lazy dog",  # en markers
    "der die das und ist",  # de markers
]


def _mk_corpus(rng) -> list[tuple]:
    import string

    alphabet = string.ascii_letters + string.digits + " .,!?;:'\"-\n\t"
    rows = []
    texts = list(_EDGE_TEXTS)
    for i in range(30):
        n = rng.randrange(1, 120)
        t = "".join(rng.choice(alphabet) for _ in range(n))
        if not t.strip():
            t = t + "x"
        texts.append(t)
    for i, t in enumerate(texts):
        rows.append(
            (
                i,
                t,
                rng.choice(["en", "de", "fr", "zh"]),
                f"src{i % 4}",
                len(t),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [7, 2026])
@pytest.mark.parametrize("name", QUERIES)
def test_oracle_matches_on_adversarial_corpus(spark, tmp_path, name, seed):
    import random

    import duckdb

    d = str(tmp_path / f"corpus_{seed}")
    os.makedirs(d, exist_ok=True)
    # the comparison harness registers a view per driver table: symlink
    # the sf0.001 files for tables these queries never touch
    from shardpack_spark.tables import TABLE_NAMES

    base_sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLE_NAMES:
        if t != "documents":
            os.symlink(os.path.join(base_sf, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    rows = _mk_corpus(random.Random(seed))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT parquet)")
    con.close()

    r = run_declared_query(spark, name, d)
    assert r is not None
    assert r.columns_match, f"{name}: {r.spark_cols} vs {r.oracle_cols}"
    assert r.spark_rows == r.oracle_rows, f"{name}: {r.spark_rows} vs {r.oracle_rows}"
    assert r.hash_match, f"{name} diverged on seed {seed}: {r.diff_sample}"
