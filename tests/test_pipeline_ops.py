"""Behavior tests for the pipeline operators added in round 2: PII
redaction, repetition signals, mixture sampling, k-means + SemDeDup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators import clustering, pii, sampling, text
from shardpack_spark.tables import load_table


def test_pii_redaction_is_complete(spark):
    """After redact(), no family pattern matches anything."""
    df = spark.createDataFrame(
        [
            (0, "mail bob@x.io and jo.ann+1@sub.example.org end"),
            (1, "ip 10.0.0.1 card 4111-1111-1111-1111 ssn 987-65-4321"),
            (2, "phone 555-867-5309 plain text"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    out = pii.pii_scan(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_email"] == 2
    assert by_id[1]["n_credit_card"] == 1 and by_id[1]["n_ssn"] == 1
    assert by_id[1]["n_ipv4"] == 1
    assert by_id[2]["n_phone"] == 1
    assert by_id[3]["redacted"] == "nothing here"
    red = spark.createDataFrame(
        [(r["doc_id"], r["redacted"]) for r in out], "doc_id long, text string"
    )
    again = pii.pii_scan(red).collect()
    for r in again:
        for fam in pii.PII_PATTERNS:
            assert r[f"n_{fam}"] == 0, (r["doc_id"], fam, r)


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [(0, "a a a a"), (1, "w x y z"), (2, "a b a b a b")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.repetition_signals(df).collect()}
    # doc0: 4 words 1 distinct; bigrams: 'a a' x3 -> 3/3; trigrams 'a a a' x2 -> 2/2
    assert math.isclose(rows[0]["dup_word_frac"], 0.75)
    assert math.isclose(rows[0]["top_bigram_frac"], 1.0)
    assert math.isclose(rows[0]["dup_trigram_frac"], 1.0)
    # doc1: all distinct, no repeated grams
    assert rows[1]["dup_word_frac"] == 0.0
    assert math.isclose(rows[1]["top_bigram_frac"], 1.0 / 3.0)
    assert rows[1]["dup_trigram_frac"] == 0.0
    # doc2: bigrams a b,b a,a b,b a,a b -> top 3/5; trigrams all dup (2+2)/4
    assert math.isclose(rows[2]["top_bigram_frac"], 3.0 / 5.0)
    assert math.isclose(rows[2]["dup_trigram_frac"], 1.0)


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.9, "zh": 0.1}
    s1 = sampling.mixture_sample(docs, "lang", rates, "doc_id", seed=7, default_rate=0.5)
    got = {r["lang"]: r["cnt"] for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    tot = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for lang, n in tot.items():
        rate = rates.get(lang, 0.5)
        frac = got.get(lang, 0) / n
        assert abs(frac - rate) < 0.35, (lang, frac, rate)
    # deterministic under repartitioning
    s2 = sampling.mixture_sample(
        docs.repartition(13), "lang", rates, "doc_id", seed=7, default_rate=0.5
    )
    assert sorted(r["doc_id"] for r in s1.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in s2.select("doc_id").collect()
    )


def test_kmeans_deterministic_and_converging(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a1 = {r["vec_id"]: r["cluster"] for r in clustering.kmeans_assign(emb, k=4, n_iter=2).collect()}
    a2 = {
        r["vec_id"]: r["cluster"]
        for r in clustering.kmeans_assign(emb.repartition(17), k=4, n_iter=2).collect()
    }
    assert a1 == a2, "assignment must be partitioning-independent"
    assert len(set(a1.values())) >= 2


def test_semantic_dedup_drop_rule_matches_bruteforce(spark, sf_dir):
    """Every dropped row must have a smaller-id same-cluster partner with
    cosine >= t, and every kept row must not (verified in numpy)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    t = 0.35
    out = clustering.semantic_dedup(emb, threshold=t, k=4, n_iter=2).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    clus = {r["vec_id"]: r["cluster"] for r in out}
    for r in out:
        vid = r["vec_id"]
        partners = [
            o for o in vecs
            if o < vid and clus[o] == clus[vid]
            and float(
                vecs[o] @ vecs[vid] / (np.linalg.norm(vecs[o]) * np.linalg.norm(vecs[vid]))
            ) >= t
        ]
        assert r["kept"] == (not partners), (vid, r["kept"], partners[:3])


def test_bloom_filter_no_false_negatives_bounded_fpp(spark):
    from shardpack_spark.operators import membership

    members = spark.range(0, 5000).select(
        F.concat(F.lit("url/"), F.col("id").cast("string")).alias("u")
    )
    bloom = membership.build_bloom(members, "u", expected_items=5000, fpp=0.01)
    # every member must hit
    hits = membership.might_contain(members, "u", bloom).filter("might_contain")
    assert hits.count() == 5000
    # non-members: fpp within 5x of nominal
    others = spark.range(100000, 120000).select(
        F.concat(F.lit("url/"), F.col("id").cast("string")).alias("u")
    )
    fp = membership.might_contain(others, "u", bloom).filter("might_contain").count()
    assert fp / 20000 < 0.05, fp


def test_canonical_url_rules(spark):
    from shardpack_spark.operators import urls

    cases = [
        ("https://WWW.Ex.COM:443/a/b?utm_source=x&q=1#frag", "https://www.ex.com/a/b?q=1"),
        ("http://h.io:80/", "http://h.io"),
        ("http://h.io:8080/p", "http://h.io:8080/p"),
        ("https://a.b.c.org/path?x=1&utm_campaign=z&y=2", "https://a.b.c.org/path?x=1&y=2"),
        ("https://e.com/?utm_source=a", "https://e.com"),
        ("https://user@e.com/p", "https://e.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(urls.canonical_url(F.col("url"))).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)
    doms = [r[0] for r in df.select(urls.registered_domain(F.col("url"))).collect()]
    assert doms[0] == "ex.com" and doms[3] == "c.org"


def test_gopher_quality_filter_rules(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over a lazy dog and runs far away home now"),
            (1, "spam spam spam spam spam spam spam spam spam spam spam the end x y"),
            (2, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.gopher_quality_filter(docs).collect()}
    assert rows[0]["keep"] and rows[0]["reasons"] == ""
    assert not rows[1]["keep"] and "dup_words" in rows[1]["reasons"]
    assert not rows[2]["keep"] and "too_few_words" in rows[2]["reasons"]


def test_canonical_url_idempotent(spark):
    """canonical_url is a fixpoint: canon(canon(u)) == canon(u), over a
    structured corpus of messy URLs (one Spark job, not per-example)."""
    from itertools import product

    from shardpack_spark.operators import urls

    hosts = ["Ex.COM", "a.b.ORG:443", "h.io:80", "h.io:8080", "u@x.NET"]
    paths = ["", "/", "/p/q", "/p/"]
    queries = ["", "?utm_source=f", "?x=1", "?utm_a=1&x=2", "?x=1&ref=z&y=3"]
    frags = ["", "#top"]
    cases = [
        f"{s}://{h}{p}{q}{f}"
        for s, h, p, q, f in product(["https", "HTTP"], hosts, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    once = df.select(urls.canonical_url(F.col("url")).alias("c1"))
    twice = once.select("c1", urls.canonical_url(F.col("c1")).alias("c2"))
    bad = [(r["c1"], r["c2"]) for r in twice.collect() if r["c1"] != r["c2"]]
    assert not bad, bad[:5]


def test_weighted_sample_proportional_and_deterministic(spark):
    # 200 'heavy' rows at weight 9 vs 200 'light' at weight 1: across
    # seeds, heavy inclusion should dominate roughly in weight proportion
    rows = [(i, "heavy" if i < 200 else "light", 9.0 if i < 200 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, grp string, w double")
    heavy_frac = []
    for seed in range(5):
        s = sampling.weighted_sample_n(df, "k", "w", 80, seed=seed)
        assert s.count() == 80
        heavy_frac.append(s.filter(F.col("grp") == "heavy").count() / 80)
    avg = sum(heavy_frac) / len(heavy_frac)
    assert 0.65 < avg <= 1.0, heavy_frac  # 9:1 weights -> heavy dominates
    # deterministic under repartitioning
    a = sorted(r["k"] for r in sampling.weighted_sample_n(df, "k", "w", 80, seed=1).collect())
    b = sorted(
        r["k"]
        for r in sampling.weighted_sample_n(df.repartition(17), "k", "w", 80, seed=1).collect()
    )
    assert a == b


def test_weighted_sample_excludes_nonpositive_and_plans_topk(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -2.0), (4, None), (5, 5.0)], "k long, w double"
    )
    got = {r["k"] for r in sampling.weighted_sample_n(df, "k", "w", 10, seed=0).collect()}
    assert got == {1, 5}
    plan = sampling.weighted_sample_n(df, "k", "w", 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hash_split_partitions_data_and_is_append_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = sampling.hash_split(docs, "doc_id", fr, seed=3)
    n = docs.count()
    got = {r["split"]: r["cnt"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sum(got.values()) == n  # disjoint + exhaustive
    for name, f in fr.items():
        assert abs(got.get(name, 0) / n - f) < 0.08, (name, got)
    # append stability: splitting HALF the corpus assigns the same labels
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = {r["doc_id"]: r["split"] for r in sampling.hash_split(half, "doc_id", fr, seed=3).collect()}
    full = {r["doc_id"]: r["split"] for r in split.collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_hash_split_validation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(df, "k", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="negative"):
        sampling.hash_split(df, "k", {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        sampling.hash_split(df, "k", {})


def test_line_dedup_matches_python_reference(spark, sf_dir):
    """line_dedup == a pure-Python reimplementation over the same docs,
    doc for doc (order-preserving reassembly, doc-frequency threshold,
    short-line exemption)."""
    docs = load_table(spark, sf_dir, "documents").limit(120).select("doc_id", "text")
    # inject cross-document boilerplate so the drop list is non-trivial
    boiler = "Subscribe to our newsletter today!"
    docs = docs.withColumn(
        "text",
        F.concat(
            F.lit(boiler + "\n"),
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("\n\n" + boiler)).otherwise(
                F.lit("")
            ),
        ),
    )
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}

    max_df, min_chars = 1, 5
    from collections import Counter

    df_count = Counter()
    for t in rows.values():
        seen = set()
        for ln in t.split("\n"):
            n = ln.strip().lower()
            if len(n) >= min_chars:
                seen.add(n)
        df_count.update(seen)
    drop = {n for n, c in df_count.items() if c > max_df}

    expected = {}
    for did, t in rows.items():
        lines = t.split("\n")
        kept = [
            ln
            for ln in lines
            if len(ln.strip().lower()) < min_chars or ln.strip().lower() not in drop
        ]
        expected[did] = ("\n".join(kept), len(lines), len(kept))

    out = text.line_dedup(docs, max_doc_freq=max_df, min_line_chars=min_chars)
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"]) for r in out.collect()
    }
    assert got == expected
    # the injected boilerplate is gone from every doc
    assert all(boiler not in t for t, _, _ in got.values())


def test_line_dedup_all_lines_dropped(spark):
    """A doc made entirely of corpus-common lines survives as empty text."""
    docs = spark.createDataFrame(
        [(1, "common line one\ncommon line two"), (2, "common line one\ncommon line two")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.line_dedup(docs).collect()}
    assert out[1]["text"] == "" and out[1]["n_kept"] == 0 and out[1]["n_lines"] == 2


def test_paragraph_dedup_unit(spark):
    """sep='\\n\\n' dedups paragraph blocks, leaving intra-paragraph
    newlines alone."""
    boiler = "About us: we are a great company.\nContact: a@b.c"
    docs = spark.createDataFrame(
        [
            (1, f"unique one\nstill unique\n\n{boiler}"),
            (2, f"{boiler}\n\nother content here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in text.line_dedup(docs, sep="\n\n", min_line_chars=5).collect()
    }
    assert out[1]["text"] == "unique one\nstill unique"
    assert out[2]["text"] == "other content here"
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1


def test_split_sentences_matches_python(spark, sf_dir):
    """Regex sentence splitter == a Python re reference, doc for doc."""
    import re

    docs = (
        load_table(spark, sf_dir, "documents")
        .limit(80)
        .select(
            "doc_id",
            # synthetic docs carry no sentence punctuation — graft some on
            F.concat(
                F.lit("First sentence. Second one! Third? "), F.col("text")
            ).alias("text"),
        )
    )
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    expected = []
    for did, t in rows.items():
        for i, s in enumerate(re.split(r"(?<=[.!?])\s+", t)):
            s = s.strip()
            if len(s) >= 1:
                expected.append((did, i, s))
    got = [
        (r["doc_id"], r["sent_idx"], r["sentence"])
        for r in text.split_sentences(docs).collect()
    ]
    assert sorted(got) == sorted(expected)
    assert len(got) > len(rows)  # multi-sentence docs actually split


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_line_dedup_property_fuzz(spark):
    """Hypothesis fuzz: line_dedup over arbitrary small corpora always
    matches the pure-Python reference (one Spark job over a batch of
    generated corpora keeps runtime sane)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.text(alphabet="ab X.\n", min_size=0, max_size=12).map(
        lambda s: s.replace("\n", " ")
    )
    doc = st.lists(line, min_size=0, max_size=6).map("\n".join)
    corpus = st.lists(doc, min_size=1, max_size=6)

    collected = []

    @settings(max_examples=25, deadline=None)
    @given(corpus)
    def gather(docs):
        collected.append(docs)

    gather()

    for ci, docs in enumerate(collected[:12]):
        max_df, min_chars = 1, 3
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
        )
        got = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
            for r in text.line_dedup(
                df, max_doc_freq=max_df, min_line_chars=min_chars
            ).collect()
        }
        dfreq = Counter()
        for t in docs:
            seen = {
                ln.strip().lower()
                for ln in t.split("\n")
                if len(ln.strip().lower()) >= min_chars
            }
            dfreq.update(seen)
        drop = {n for n, c in dfreq.items() if c > max_df}
        for i, t in enumerate(docs):
            lines = t.split("\n")
            kept = [
                ln
                for ln in lines
                if len(ln.strip().lower()) < min_chars
                or ln.strip().lower() not in drop
            ]
            assert got[i] == ("\n".join(kept), len(lines), len(kept)), (ci, i)


def test_cap_per_group_quota_and_determinism(spark, sf_dir):
    from shardpack_spark.operators.sampling import cap_per_group
    from shardpack_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "source", 30, "doc_id")
    sizes = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    orig = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, n0 in orig.items():
        assert sizes[src] == min(n0, 30)

    # deterministic under repartitioning: identical survivor sets
    a = {r["doc_id"] for r in capped.collect()}
    b = {
        r["doc_id"]
        for r in cap_per_group(docs.repartition(13), "source", 30, "doc_id").collect()
    }
    assert a == b

    # priority mode keeps the top-n by the score column within each group
    pri = cap_per_group(docs, "source", 5, "doc_id", priority_col="n_chars")
    rows = pri.select("source", "n_chars").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    exp_rows = docs.select("source", "n_chars").collect()
    exp_by_src = {}
    for r in exp_rows:
        exp_by_src.setdefault(r["source"], []).append(r["n_chars"])
    for src, vals in by_src.items():
        assert len(vals) <= 5
        top5 = sorted(exp_by_src[src], reverse=True)[:5]
        assert sorted(vals, reverse=True) == top5

    with pytest.raises(ValueError, match="n must be"):
        cap_per_group(docs, "source", 0, "doc_id")


def test_c4_line_and_document_filters(spark):
    from shardpack_spark.operators.text import c4_clean_lines, c4_document_filter

    rows = [
        # kept: enough terminal-punctuated 3+-word lines
        (1, "The cat sat down.\nA dog barked loudly!\nBirds fly south now.\n"
            "Rain fell all day.\nThe sun came out."),
        (2, "no punctuation here\nshort.\ncontains javascript code.\nReal sentence is here."),
        (3, "Broken { code } document.\nIt has five words here.\nMore text lives here.\n"
            "Another full sentence here.\nAnd one more ending."),
        (4, "lorem ipsum dolor sit amet.\nFive more words are here.\nAnd again more words here.\n"
            "Sentences keep on coming now.\nFinal line ends properly."),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = {r["id"]: r for r in c4_clean_lines(df).collect()}
    # doc 2: 'no punctuation here' dropped (no terminal punct), 'short.'
    # dropped (<3 words), javascript line dropped, last line kept
    assert cleaned[2]["n_lines"] == 4 and cleaned[2]["n_kept_lines"] == 1
    assert cleaned[2]["clean_text"] == "Real sentence is here."
    assert cleaned[1]["n_kept_lines"] == 5
    assert cleaned[5]["n_kept_lines"] == 0 and cleaned[5]["clean_text"] == ""

    gated = {r["id"]: r for r in c4_document_filter(c4_clean_lines(df)).collect()}
    assert gated[1]["keep"] is True and gated[1]["reasons"] == ""
    assert gated[2]["keep"] is False and "too_few_sentences" in gated[2]["reasons"]
    assert gated[3]["keep"] is False and "curly_brace" in gated[3]["reasons"]
    assert gated[4]["keep"] is False and "bad_phrase_0" in gated[4]["reasons"]
    assert gated[5]["keep"] is False


def test_html_to_text_hand_cases(spark):
    """HTML extraction: block drops, tag strips, entity decode order,
    whitespace canonicalization — each pinned on a hand-built document."""
    cases = [
        # script/style bodies vanish even when they contain markup
        (
            '<script>var s = "<p>fake</p>";</script><p>real</p>',
            "real",
        ),
        ('<style>p { color: red; }</style>hello', "hello"),
        # block closers become newlines, inline tags become spaces
        ("<p>one</p><p>two</p>", "one\ntwo"),
        ("a<br>b", "a\nb"),
        ("<b>bold</b> and <i>italic</i>", "bold and italic"),
        # entities decode AFTER stripping: '&lt;p&gt;' stays literal text
        ("&lt;p&gt; &amp; &quot;q&quot; &#39;s&#39;&nbsp;!", "<p> & \"q\" 's' !"),
        # attributes don't confuse the stripper
        ('<a href="x.html" title="a > b?">link</a>', "link"),
        # whitespace runs collapse; blank-line runs collapse to one break
        ("<p>a</p>\n\n\n<p>b</p>", "a\nb"),
        ("  spaced\tout  ", "spaced out"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html string"
    )
    got = {
        r["i"]: r["xt"]
        for r in df.select("i", text.html_to_text(F.col("html")).alias("xt")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_html_to_text_cross_engine_fuzz(spark):
    """Property check of the Java-regex ∩ RE2 claim: Spark's html_to_text
    and DuckDB's html_extract_sql replay must extract IDENTICAL text on
    random token-soup markup (nesting, unclosed tags, quotes holding '>',
    entities, stray angle brackets)."""
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    tokens = st.sampled_from(
        [
            "<p>", "</p>", "<div class=\"x>y\">", "</div>", "<br>",
            "<script>", "</script>", "<style>", "</style>",
            "<a href='u>v' title=\"a > b\">", "</a>", "<h2>", "</h2>",
            "<b>", "</b>", "<li>", "</li>", "<table>", "</table>", "<tr>", "</tr>",
            "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;",
            "text", "word soup", "5 > 3", "x<y", "q&a", "'", '"',
            "<", ">", "&", " ", "\t", "\n", "café", "<>",
        ]
    )
    samples = []

    @settings(
        max_examples=200,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(tokens, max_size=30).map("".join))
    def collect(s):
        samples.append(s)

    collect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, html string"
    )
    spark_got = {
        r["i"]: r["xt"]
        for r in df.select("i", text.html_to_text(F.col("html")).alias("xt")).collect()
    }
    pdf = pd.DataFrame({"i": range(len(samples)), "html": samples})
    con = duckdb.connect()
    con.register("t", pdf)
    duck_got = dict(
        con.execute(f"SELECT i, {text.html_extract_sql('html')} FROM t").fetchall()
    )
    for i, s in enumerate(samples):
        assert spark_got[i] == duck_got[i], f"diverged on {s!r}: spark={spark_got[i]!r} duckdb={duck_got[i]!r}"


def test_asof_null_event_times_never_match(spark):
    """NULL event times neither match nor serve as matches (pandas
    merge_asof refuses them; we keep the left row unmatched): a null-ts
    right row must not be carried into later probes by the ascending
    pass, and a null-ts left row must not pick up the smallest-ts right
    row in the descending pass.  Non-null subset must equal pandas
    merge_asof exactly."""
    import pandas as pd

    from shardpack_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, "l1"), (1, 20.0, "l2"), (1, None, "lnull"), (2, 5.0, "l3")],
        "k long, ts double, lv string",
    )
    right = spark.createDataFrame(
        [(1, None, "POISON"), (1, 8.0, "r8"), (1, 15.0, "r15"), (2, 9.0, "r9")],
        "k long, ts double, rv string",
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            (r["k"], r["ts"]): r["rv"]
            for r in asof_join(
                left, right, "ts", "ts", "k", "k", direction=direction
            ).collect()
        }
        # null-ts probes never match, in any direction
        assert got[(1, None)] is None, direction
        # the null-ts right row is never a match for anyone
        assert "POISON" not in got.values(), direction
        # non-null subset == pandas merge_asof on null-dropped frames
        lp = pd.DataFrame({"k": [1, 1, 2], "ts": [10.0, 20.0, 5.0]}).sort_values("ts")
        rp = pd.DataFrame(
            {"k": [1, 1, 2], "ts": [8.0, 15.0, 9.0], "rv": ["r8", "r15", "r9"]}
        ).sort_values("ts")
        want = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
        for _, row in want.iterrows():
            exp = row["rv"] if isinstance(row["rv"], str) else None
            assert got[(row["k"], row["ts"])] == exp, (direction, row["ts"])
