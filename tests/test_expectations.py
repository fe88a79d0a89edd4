"""Data-quality expectations: every rule kind checked against DuckDB
SQL recomputation over the driver tables, plus quarantine invariants."""

from __future__ import annotations

import os

import duckdb
import pytest

from shardpack_spark.operators.expectations import (
    check,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    quarantine,
    satisfies,
    unique,
)
from shardpack_spark.tables import load_table


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("documents", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def test_row_local_rules_match_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rules = [
        not_null("text"),
        in_range("n_chars", lo=1, hi=5000),
        in_set("lang", ["en", "de", "fr"]),
        matches("source", "[a-z_]+"),
        satisfies("n_chars >= length(text) / 2", name="chars_vs_len"),
    ]
    rep = check(docs, rules)
    got = {r["rule"]: r["violations"] for r in rep["rules"]}

    con = _duck(sf_dir)
    want = con.execute(
        """
        SELECT
          SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
          SUM(CASE WHEN n_chars IS NOT NULL AND NOT (n_chars BETWEEN 1 AND 5000) THEN 1 ELSE 0 END),
          SUM(CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','de','fr') THEN 1 ELSE 0 END),
          SUM(CASE WHEN source IS NOT NULL AND NOT regexp_full_match(source, '[a-z_]+') THEN 1 ELSE 0 END),
          SUM(CASE WHEN NOT coalesce(n_chars >= length(text) / 2, FALSE) THEN 1 ELSE 0 END),
          COUNT(*)
        FROM documents
        """
    ).fetchone()
    assert rep["total_rows"] == want[5]
    assert got["not_null(text)"] == want[0]
    assert got["in_range(n_chars)"] == want[1]
    assert got["in_set(lang)"] == want[2]
    assert got["matches(source)"] == want[3]
    assert got["satisfies(chars_vs_len)"] == want[4]


def test_unique_rule_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # doc_id is a real key; text has duplicates by construction
    rep = check(docs, [unique("doc_id"), unique("text")])
    got = {r["rule"]: r["violations"] for r in rep["rules"]}

    con = _duck(sf_dir)
    dup_text = con.execute(
        "SELECT COUNT(text) - COUNT(DISTINCT text) FROM documents"
    ).fetchone()[0]
    assert got["unique(doc_id)"] == 0
    assert got["unique(text)"] == dup_text
    assert rep["rules"][0]["passed"] is True


def test_foreign_key_rule(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rep = check(orders, [foreign_key("o_custkey", customer, "c_custkey")])
    con = _duck(sf_dir)
    want = con.execute(
        """
        SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        """
    ).fetchone()[0]
    assert rep["rules"][0]["violations"] == want

    # break referential integrity on a subset of the reference
    small = customer.where("c_custkey % 2 = 0")
    rep2 = check(orders, [foreign_key("o_custkey", small, "c_custkey")])
    want2 = con.execute(
        """
        SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
          SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 2 = 0)
        """
    ).fetchone()[0]
    assert rep2["rules"][0]["violations"] == want2 > 0
    assert rep2["passed"] is False


def test_soft_threshold(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hard = check(docs, [in_set("lang", ["en"])])
    assert hard["passed"] is False
    frac = hard["rules"][0]["violation_fraction"]
    soft = check(docs, [in_set("lang", ["en"], max_violation_fraction=frac + 0.01)])
    assert soft["passed"] is True


def test_quarantine_partitions_rows_with_reasons(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rules = [in_range("n_chars", lo=100), in_set("lang", ["en", "de"])]
    clean, dirty = quarantine(docs, rules)

    n_clean, n_dirty, n_all = clean.count(), dirty.count(), docs.count()
    assert n_clean + n_dirty == n_all
    # satisfies() counts rows FAILING the predicate, and in_range/in_set
    # pass NULLs — so the clean condition with NULL-passing coalesce
    # must fail on exactly the quarantined rows
    assert n_dirty == check(docs, [satisfies(
        "coalesce(n_chars >= 100, TRUE) AND coalesce(lang IN ('en','de'), TRUE)",
        name="clean",
    )])["rules"][0]["violations"]

    # every quarantined row names only rules it actually breaks
    for row in dirty.limit(50).collect():
        reasons = set(row["_violated"])
        assert reasons
        if "in_range(n_chars)" in reasons:
            assert row["n_chars"] < 100
        if "in_set(lang)" in reasons:
            assert row["lang"] not in ("en", "de")

    # clean rows keep the original schema
    assert clean.columns == docs.columns


def test_quarantine_rejects_non_row_local(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="row-local"):
        quarantine(docs, [unique("doc_id")])


def test_single_scan_plan(spark, sf_dir):
    """The combined rule aggregation reads the source exactly once, even
    with row-local rules and multiple uniqueness (count-distinct) rules
    mixed — Spark plans multi-distinct via one Expand over one scan."""
    import re

    from pyspark.sql import functions as F

    from shardpack_spark.operators.expectations import _violation_expr

    docs = load_table(spark, sf_dir, "documents")
    rules = [not_null("text"), in_range("n_chars", lo=1), unique("doc_id"), unique("text")]
    aggs = [F.count(F.lit(1)).alias("t")]
    for i, r in enumerate(rules):
        if r.kind == "unique":
            c = r.params["columns"][0]
            aggs.append((F.count(c) - F.count_distinct(c)).alias(f"v{i}"))
        else:
            aggs.append(F.sum(_violation_expr(r)).alias(f"v{i}"))
    plan = docs.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_edge_cases(spark):
    # empty input: nothing violates, no division-by-zero
    empty = spark.range(0).selectExpr("id AS x")
    rep = check(empty, [not_null("x")])
    assert rep["passed"] is True and rep["total_rows"] == 0
    # zero rules: trivially passing report, all rows clean, stable schema
    three = spark.range(3)
    assert check(three, [])["passed"] is True
    clean, dirty = quarantine(three, [])
    assert clean.count() == 3 and dirty.count() == 0
    assert dict(dirty.dtypes)["_violated"] == "array<string>"


def test_unique_multicolumn_null_fields_never_collide(spark):
    """Multi-column unique must not fold NULL fields away: ("a", NULL,
    "b") and ("a", "b", NULL) are DIFFERENT keys (a concat_ws-style key
    would collide them), and any key containing NULL never violates
    (compose with not_null), matching the single-column contract."""
    from shardpack_spark.operators.expectations import check, unique

    df = spark.createDataFrame(
        [
            ("a", None, "b"),
            ("a", "b", None),   # distinct from the row above
            ("x", "y", "z"),
            ("x", "y", "z"),    # one true duplicate pair
            ("x", "y", None),   # null-key rows never violate...
            ("x", "y", None),   # ...even when repeated
        ],
        "c1 string, c2 string, c3 string",
    )
    rep = check(df, [unique("c1", "c2", "c3")])
    (rule,) = rep["rules"]
    assert rule["violations"] == 1 and not rule["passed"]
