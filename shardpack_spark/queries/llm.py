"""LLM-data-pipeline declared checks (Q28-Q31 + extensions Q32-Q39).

Operators live in shardpack_spark.operators.{dedup,similarity,text}; this
module binds them to the driver tables and pairs each with DuckDB oracle
SQL where the semantics are SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shardpack_spark.operators import dedup, similarity, text
from shardpack_spark.queries import register
from shardpack_spark.queries.canon import round4d
from shardpack_spark.tables import load_table

# --- Q28 exact dedup --------------------------------------------------------

@register(
    "q28_exact_dedup",
    oracle="""
    SELECT sha256(text) AS text_hash, MIN(doc_id) AS survivor_id, COUNT(*) AS dup_cnt
    FROM documents GROUP BY 1
    """,
)
def q28_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: content hash, surviving doc, multiplicity (Q28)."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


# --- Q29 fuzzy dedup --------------------------------------------------------

_JACCARD_ORACLE = """
    WITH sh AS (
      SELECT DISTINCT sid, shingle FROM (
        SELECT doc_id AS sid, substring(text, i, 5) AS shingle
        FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-4)) AS i
              FROM documents WHERE length(text) >= 5)
      )
    ), sizes AS (
      SELECT sid, COUNT(*) AS n FROM sh GROUP BY sid
    ), inter AS (
      SELECT a.sid AS sid_a, b.sid AS sid_b, COUNT(*) AS ic
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY 1, 2
    )
    SELECT i.sid_a, i.sid_b,
           FLOOR(CAST(i.ic AS DOUBLE) / (na.n + nb.n - i.ic) * 10000.0 + 0.5) / 10000.0 AS jac
    FROM inter i
    JOIN sizes na ON na.sid = i.sid_a
    JOIN sizes nb ON nb.sid = i.sid_b
    WHERE CAST(i.ic AS DOUBLE) / (na.n + nb.n - i.ic) >= 0.8
"""


@register("q29_jaccard_exact", oracle=_JACCARD_ORACLE)
def q29_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with exact 5-gram Jaccard >= 0.8 (Q29 oracle mode)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.char_shingles(docs, k=5)
    pairs = dedup.jaccard_pairs_exact(sh, threshold=0.8)
    return pairs.select("sid_a", "sid_b", round4d(F.col("jac")).alias("jac"))


@register(
    "q29b_minhash_lsh",
    oracle=_JACCARD_ORACLE,
    doc="MinHash-LSH candidates verified with exact Jaccard — the 100 TB "
    "scale path; must reproduce the exact-pair result (recall check).",
)
def q29b_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed fuzzy dedup: signatures -> banded candidates -> exact
    Jaccard verification restricted to candidates (Q29 scale mode)."""
    docs = load_table(spark, sf_dir, "documents")
    # shingles and signatures are each consumed by 2+ downstream joins;
    # Spark re-executes common subplans per reference, so persist them
    # (at 100 TB the signature table is written to storage once instead)
    sh = dedup.char_shingles(docs, k=5).persist()
    sigs = dedup.minhash_signatures(sh, n_hashes=64, seed=42).persist()
    cand = dedup.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    # signature prefilter kills the false-positive bulk from dense buckets
    # before the (comparatively expensive) exact shingle intersection
    cand = dedup.filter_candidates_by_signature(cand, sigs, min_estimate=0.6)
    pairs = dedup.jaccard_pairs_exact(sh, threshold=0.8, candidates=cand)
    return pairs.select("sid_a", "sid_b", round4d(F.col("jac")).alias("jac"))


# --- Q30 similarity search --------------------------------------------------

_COS = (
    "LIST_REDUCE(LIST_TRANSFORM(e.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), (a, b) -> a + b)"
    " / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))"
    " * SQRT(LIST_REDUCE(LIST_TRANSFORM(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)))"
)


@register(
    "q30_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, {_COS} AS cos
      FROM embeddings e, q WHERE e.vec_id <> 0
    )
    SELECT vec_id, FLOOR(cos * 10000.0 + 0.5) / 10000.0 AS cosine
    FROM scored ORDER BY cos DESC, vec_id LIMIT 5
    """,
)
def q30_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 to vec_id=0 (Q30)."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    topk = similarity.cosine_topk(emb, query, k=5, exclude_ids=[0])
    return topk.select("vec_id", round4d(F.col("cosine")).alias("cosine"))


@register("q30b_ann_ivf", oracle=None,
          doc="IVF-bucketed approximate top-k; recall vs brute force checked in pytest.")
def q30b_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    centroids = (
        emb.filter(F.col("vec_id") % 50 == 7)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    topk = similarity.ivf_topk(emb.filter(F.col("vec_id") != 0), query, centroids, k=5, nprobe=3)
    return topk.select("vec_id", round4d(F.col("cosine")).alias("cosine"))


@register("q30c_ann_rp_lsh", oracle=None,
          doc="Random-hyperplane LSH ANN; recall vs brute force checked in pytest.")
def q30c_ann_rp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    topk = similarity.rp_lsh_topk(emb.filter(F.col("vec_id") != 0), query, k=5)
    return topk.select("vec_id", round4d(F.col("cosine")).alias("cosine"))


@register(
    "q38_embedding_near_dup",
    oracle=f"""
    SELECT e.vec_id AS id_a, b.vec_id AS id_b,
           FLOOR(
             LIST_REDUCE(LIST_TRANSFORM(e.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (a, c) -> a + c)
             / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, c) -> a + c))
                * SQRT(LIST_REDUCE(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, c) -> a + c)))
             * 10000.0 + 0.5) / 10000.0 AS cosine
    FROM embeddings e JOIN embeddings b
      ON e.label = b.label AND e.vec_id < b.vec_id
    WHERE LIST_REDUCE(LIST_TRANSFORM(e.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (a, c) -> a + c)
          / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, c) -> a + c))
             * SQRT(LIST_REDUCE(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, c) -> a + c))) >= 0.4
    """,
)
def q38_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs blocked by label (Q38).

    Threshold 0.4 fits the synthetic data (max within-label cosine ~0.47);
    the operator itself takes any threshold.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dup_pairs(emb, threshold=0.4, block_col="label")
    return pairs.select("id_a", "id_b", round4d(F.col("cosine")).alias("cosine"))


# --- Q31-Q35 text analysis --------------------------------------------------

@register(
    "q31_text_stats",
    oracle=r"""
    SELECT lang, COUNT(*) AS doc_cnt,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           FLOOR(CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
                 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def q31_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc count, char volume, mean token count (Q31)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.sum("n_chars").alias("sum_chars"),
        round4d(F.sum(toks).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


@register(
    "q32_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens
    FROM documents
    """,
)
def q32_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per doc (Q32)."""
    return text.token_counts(load_table(spark, sf_dir, "documents"))


_STOP_SQL = " + ".join(
    rf"len(regexp_extract_all(text, '\b{w}\b'))" for w in text._STOPWORDS
)

@register(
    "q33_quality_scores",
    oracle=rf"""
    WITH feat AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
             len(regexp_extract_all(text, '[.,!?;:]')) AS punct_cnt,
             len(regexp_extract_all(text, '[A-Za-z]')) AS alpha_cnt,
             {_STOP_SQL} AS stop_cnt
      FROM documents
    )
    SELECT doc_id, n_chars, ws_tokens,
           FLOOR(CAST(punct_cnt AS DOUBLE) / n_chars * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
           FLOOR(CAST(alpha_cnt AS DOUBLE) / n_chars * 10000.0 + 0.5) / 10000.0 AS alpha_ratio,
           FLOOR((0.4 * (CAST(alpha_cnt AS DOUBLE) / n_chars)
                  + 0.4 * LEAST(CAST(stop_cnt AS DOUBLE) / ws_tokens * 2, 1.0)
                  - 0.2 * (CAST(punct_cnt AS DOUBLE) / n_chars)) * 10000.0 + 0.5) / 10000.0 AS quality
    FROM feat
    """,
)
def q33_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features + composite score per doc (Q33)."""
    return text.quality_scores(load_table(spark, sf_dir, "documents"))


def _lang_score_sql(lang: str) -> str:
    return " + ".join(
        rf"len(regexp_extract_all(lower(text), '\b{w}\b'))" for w in text.LANG_MARKERS[lang]
    )

_LANGS = sorted(text.LANG_MARKERS)
_SCORES_SQL = ",\n           ".join(
    f"CAST({_lang_score_sql(lang)} AS INT) AS score_{lang}" for lang in _LANGS
)
_PRED_SQL = "CASE " + " ".join(
    f"WHEN score_{lang} = g THEN '{lang}'" for lang in _LANGS
) + " END"

@register(
    "q34_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
           {_SCORES_SQL}
      FROM documents
    ), g AS (
      SELECT *, GREATEST({", ".join("score_" + lang for lang in _LANGS)}) AS g FROM s
    )
    SELECT doc_id, {", ".join("score_" + lang for lang in _LANGS)}, {_PRED_SQL} AS pred_lang
    FROM g
    """,
)
def q34_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-keyword language ID with deterministic tie-break (Q34)."""
    return text.lang_scores(load_table(spark, sf_dir, "documents"))


@register(
    "q35_fingerprint",
    oracle="""
    SELECT doc_id,
           LIST_REDUCE(LIST_TRANSFORM(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                       (a, c) -> (a * 31 + c) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def q35_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (Q35)."""
    return text.fingerprints(load_table(spark, sf_dir, "documents"))


# --- simhash (rows-only: xxhash64 has no DuckDB equivalent) -----------------

@register("q36_simhash", oracle=None,
          doc="64-bit SimHash per doc; bit-vote property tested in pytest.")
def q36_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load_table(spark, sf_dir, "documents"))


@register("q37_simhash_near_dup", oracle=None,
          doc="SimHash banding near-dup pairs (Hamming <= 3); property-tested in pytest.")
def q37_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = dedup.simhash(load_table(spark, sf_dir, "documents"))
    return dedup.simhash_near_pairs(sim, bands=4)
