"""Round-9 optimization pin: the SQL-string expression twins must stay
bit-identical to the Column-API originals they replaced.

The optimization round rebuilt several higher-order fold expressions as
single parsed SQL strings (one py4j round trip instead of dozens) on the
claim that the parsed tree matches the Column build node for node.  The
originals are kept in the modules; these tests evaluate BOTH forms over
the same data and require exact equality, so a future edit to either
twin that silently diverges the values fails here first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shardpack_spark.operators import dedup, similarity, text


def test_oph_densify_twins_bit_identical(spark):
    # per-bin minima with NULL holes, as (bin -> min) maps like the OPH
    # aggregation produces; include a single-bin doc (max densification
    # borrowing) and a full map (no borrowing)
    n_bins = 8
    rows = [
        (1, {0: 11, 3: -7, 7: 5}),
        (2, {4: 123456789}),
        (3, {b: (b * 7919) - 4000 for b in range(n_bins)}),
    ]
    df = spark.createDataFrame(rows, "sid INT, m MAP<INT, BIGINT>")
    sparse = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda j: F.element_at(F.col("m"), j.cast("int")),
    )
    col_out = {
        r["sid"]: r["sig"]
        for r in df.select(
            "sid", dedup._oph_densify(sparse, n_bins).alias("sig")
        ).collect()
    }
    sql_out = {
        r["sid"]: r["sig"]
        for r in df.select(
            "sid", F.expr(dedup._oph_densify_sql("m", n_bins)).alias("sig")
        ).collect()
    }
    assert col_out == sql_out
    assert all(len(sig) == n_bins and None not in sig for sig in sql_out.values())


def test_cosine_twins_bit_identical(spark):
    rows = [
        (1, [0.1, -0.25, 3.5], [1.0, 2.0, -0.5]),
        (2, [1e-8, 7.75, -2.125], [-0.3, 0.0, 9.5]),
        (3, [5.0, 5.0, 5.0], [5.0, 5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    col_cos = (
        similarity._dot(F.col("a"), F.col("b"))
        / (similarity._norm(F.col("a")) * similarity._norm(F.col("b")))
    )
    got_col = {r["id"]: r["c"] for r in df.select("id", col_cos.alias("c")).collect()}
    got_sql = {
        r["id"]: r["c"]
        for r in df.select(
            "id", F.expr(similarity._cosine_sql("a", "b")).alias("c")
        ).collect()
    }
    assert got_col == got_sql  # exact float equality: same fold, same order


def test_query_literal_twin_bit_identical(spark):
    # repr() round-trips every IEEE double exactly; the SQL literal parse
    # must reproduce F.lit(float(x)) bit for bit, including "ugly" values
    vec = [0.1, -1.0 / 3.0, 2**-40, 123456.789012345, -0.0]
    df = spark.range(1)
    got_col = df.select(
        F.array(*[F.lit(float(x)) for x in vec]).alias("q")
    ).head()["q"]
    got_sql = df.select(F.expr(similarity._query_arr_sql(vec)).alias("q")).head()["q"]
    assert [x.hex() for x in got_col] == [x.hex() for x in got_sql]


def test_sig_estimate_twin_bit_identical(spark):
    rows = [
        (1, [1, 2, 3, 4], [1, 9, 3, 8]),
        (2, [7, 7, 7, 7], [7, 7, 7, 7]),
        (3, [1, 2, 3, 4], [5, 6, 7, 8]),
    ]
    df = spark.createDataFrame(rows, "id INT, __sa ARRAY<BIGINT>, __sb ARRAY<BIGINT>")
    agree = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    got_col = {
        r["id"]: r["e"]
        for r in df.select("id", (agree / F.size("__sa")).alias("e")).collect()
    }
    got_sql = {
        r["id"]: r["e"]
        for r in df.select("id", F.expr(dedup._sig_estimate_sql()).alias("e")).collect()
    }
    assert got_col == got_sql


def test_marker_count_twin_bit_identical(spark):
    words = ["the", "and", "it's"]  # quote exercises SQL escaping
    rows = [(1, ["the", "the", "and", "xx"]), (2, ["it's", "nope"]), (3, [])]
    df = spark.createDataFrame(rows, "id INT, toks ARRAY<STRING>")
    got_col = {
        r["id"]: r["n"]
        for r in df.select(
            "id", text._marker_count(F.col("toks"), words).alias("n")
        ).collect()
    }
    got_sql = {
        r["id"]: r["n"]
        for r in df.select(
            "id", F.expr(text._marker_count_sql("toks", words)).alias("n")
        ).collect()
    }
    assert got_col == got_sql == {1: 3, 2: 1, 3: 0}


def test_oph_pipeline_sql_twin_row_identical(spark, sf_dir):
    """The two-statement SQL composition of the OPH pipeline (profile ->
    banded candidates -> fused prefilter+verify) must reproduce the
    operator chain row for row — it is what q29's oph variant and the
    bench's LSH path now execute."""
    from shardpack_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.char_shingles(docs, k=5, hashed=True)

    # operator chain (library surface, unchanged)
    prof_ops = dedup.minhash_oph_profiles(sh, n_bins=64, seed=42).persist()
    cand = dedup.minhash_lsh_candidates(
        prof_ops.select("sid", "sig"), bands=16, rows_per_band=4
    )
    ops_rows = sorted(
        tuple(r)
        for r in dedup.verify_candidates_with_profiles(
            cand, prof_ops, threshold=0.8, min_estimate=0.6
        ).collect()
    )

    # SQL composition
    sh.createOrReplaceTempView("__twin_shingles")
    prof_sql = spark.sql(dedup.oph_profile_sql("__twin_shingles", n_bins=64, seed=42))
    prof_sql.createOrReplaceTempView("__twin_prof")
    sql_rows = sorted(
        tuple(r)
        for r in spark.sql(
            dedup.oph_verify_sql(
                "__twin_prof", bands=16, rows_per_band=4,
                threshold=0.8, min_estimate=0.6,
            )
        ).collect()
    )

    prof_ops.unpersist()
    assert ops_rows == sql_rows
    assert len(sql_rows) > 0  # non-vacuous at the oracle scale factors


def test_shingles_sql_twin_row_identical(spark, sf_dir):
    """shingles_sql must reproduce char_shingles(hashed=True) row for row
    (same row-local array_distinct + explode + xxhash64), with and
    without the round-robin REPARTITION hint (partitioning cannot change
    the multiset of rows)."""
    from shardpack_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ops_rows = sorted(
        tuple(r) for r in dedup.char_shingles(docs, k=5, hashed=True).collect()
    )
    docs.createOrReplaceTempView("__twin_docs")
    plain = sorted(
        tuple(r) for r in spark.sql(dedup.shingles_sql("__twin_docs", k=5)).collect()
    )
    spread = sorted(
        tuple(r)
        for r in spark.sql(
            dedup.shingles_sql("__twin_docs", k=5, repartition=8)
        ).collect()
    )
    assert ops_rows == plain == spread
    assert len(plain) > 0


def test_oph_profile_from_docs_sql_twin_row_identical(spark, sf_dir):
    """The fully-folded docs -> shingles -> profile statement (what the
    bench's LSH path now parses) must reproduce the two-step
    shingle-view composition bit for bit: same signatures, same shingle
    sets (order-canonicalized — collect_list order inside one row is not
    a contract), same counts."""
    from shardpack_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.char_shingles(docs, k=5, hashed=True)
    sh.createOrReplaceTempView("__twin_shingles2")
    two_step = {
        r["sid"]: (tuple(r["sig"]), tuple(sorted(r["shset"])), r["n"])
        for r in spark.sql(
            dedup.oph_profile_sql("__twin_shingles2", n_bins=64, seed=42)
        ).collect()
    }
    docs.createOrReplaceTempView("__twin_docs2")
    folded = {
        r["sid"]: (tuple(r["sig"]), tuple(sorted(r["shset"])), r["n"])
        for r in spark.sql(
            dedup.oph_profile_from_docs_sql(
                "__twin_docs2", k=5, n_bins=64, seed=42, repartition=8
            )
        ).collect()
    }
    assert two_step == folded
    assert len(folded) > 0


def test_fuzzy_dedup_lsh_matches_operator_chain(spark, sf_dir):
    """bench.py's q29 path (fully-folded SQL, round4d as selectExpr) must
    reproduce the operator-chain oph pipeline + Column round4d row for
    row — the certification that the bench times the same computation
    q29's oracle certifies.  The comparand is built DIRECTLY from the
    operator chain (minhash_oph_profiles -> minhash_lsh_candidates ->
    verify_candidates_with_profiles), not from _lsh_pairs — which is
    itself the two-statement SQL form since r9 — so this stays a true
    end-to-end operator-chain anchor."""
    from shardpack_spark.queries.canon import round4d
    from shardpack_spark.queries.llm import _shingles, fuzzy_dedup_lsh

    prof = dedup.minhash_oph_profiles(
        _shingles(spark, sf_dir), n_bins=64, seed=42
    ).persist()
    cand = dedup.minhash_lsh_candidates(
        prof.select("sid", "sig"), bands=16, rows_per_band=4
    )
    chain = sorted(
        tuple(r)
        for r in dedup.verify_candidates_with_profiles(
            cand, prof, threshold=0.8, min_estimate=0.6
        )
        .select("sid_a", "sid_b", round4d(F.col("jac")).alias("jac"))
        .collect()
    )
    spark.catalog.clearCache()
    folded = sorted(tuple(r) for r in fuzzy_dedup_lsh(spark, sf_dir).collect())
    spark.catalog.clearCache()
    assert chain == folded
    assert len(folded) > 0
