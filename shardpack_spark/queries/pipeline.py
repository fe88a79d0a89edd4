"""Training-data pipeline declared checks: PII redaction, repetition
signals, and semantic dedup (k-means + SemDeDup).

Operators live in shardpack_spark.operators.{pii,text,clustering}; this
module binds them to the driver tables with DuckDB oracle SQL.  The
k-means oracle is a generated CTE chain that replays Lloyd's algorithm
iteration by iteration — possible because the operator's determinism
contract (md5 init, decimal-exact centroid sums, sequential fold
distances) makes the algorithm a pure function of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shardpack_spark.operators import clustering, pii, text
from shardpack_spark.queries import register
from shardpack_spark.queries.canon import round4d
from shardpack_spark.tables import load_table

# --- Q59 PII redaction ------------------------------------------------------

# The synthetic documents carry no real PII, so the query plants
# deterministic PII strings keyed on doc_id — identically in Spark and in
# the oracle — and then detects/redacts them.  This keeps the check
# meaningful: every family's pattern must fire and every replacement must
# byte-match.
_PII_SNIPPETS = [
    " contact alice.smith@example.com now",
    " server at 192.168.1.10 port",
    " ssn 123-45-6789 on file",
    " card 4111 1111 1111 1111 charged",
    " call 555-123-4567 today",
    "",
    "",
]

_AUG_SQL = "text || CASE doc_id % 7 " + " ".join(
    f"WHEN {i} THEN '{s}'" for i, s in enumerate(_PII_SNIPPETS) if s
) + " ELSE '' END"

_REDACT_SQL = "aug"
for _fam, _pat in pii.PII_PATTERNS.items():
    _REDACT_SQL = f"regexp_replace({_REDACT_SQL}, '{_pat}', '[{_fam.upper()}]', 'g')"

_COUNTS_SQL = ", ".join(
    f"CAST(len(regexp_extract_all(aug, '{p}')) AS INT) AS n_{f}"
    for f, p in pii.PII_PATTERNS.items()
)


@register(
    "q59_pii_redaction",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
    SELECT doc_id, {_COUNTS_SQL}, {_REDACT_SQL} AS redacted
    FROM aug
    """,
    doc="PII detection + redaction (email, credit card, SSN, IPv4, "
    "phone) over deterministically planted PII — per-family counts and "
    "the redacted text both byte-checked.",
)
def q59_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan (Q59): plant one PII string per doc_id%7 family, then
    count and redact with the shared Java/RE2-compatible patterns.  Pure
    codegen regexes — one fused scan stage, no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.element_at(
            F.array(*[F.lit(s) for s in _PII_SNIPPETS]),
            (F.col("doc_id") % 7 + 1).cast("int"),
        ),
    )
    return pii.pii_scan(docs.select("doc_id", aug.alias("text")))


# --- Q60 repetition signals -------------------------------------------------

@register(
    "q60_repetition",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9_]+'),
                         t -> length(t) > 0) AS tk
      FROM documents
    ), words AS (
      SELECT doc_id, tk, len(tk) AS n_words, len(list_distinct(tk)) AS n_distinct
      FROM base WHERE len(tk) > 0
    ), bi AS (
      SELECT doc_id, FLOOR(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) * 10000.0 + 0.5) / 10000.0
               AS top_bigram_frac
      FROM (
        SELECT doc_id, g, COUNT(*) AS cnt FROM (
          SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
          FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
                FROM words WHERE len(tk) >= 2)
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    ), tri AS (
      SELECT doc_id,
             FLOOR(CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / SUM(cnt)
                   * 10000.0 + 0.5) / 10000.0 AS dup_trigram_frac
      FROM (
        SELECT doc_id, g, COUNT(*) AS cnt FROM (
          SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS g
          FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i
                FROM words WHERE len(tk) >= 3)
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    )
    SELECT w.doc_id, CAST(w.n_words AS INT) AS n_words,
           FLOOR((1.0 - CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE))
                 * 10000.0 + 0.5) / 10000.0 AS dup_word_frac,
           bi.top_bigram_frac, tri.dup_trigram_frac
    FROM words w
    LEFT JOIN bi ON w.doc_id = bi.doc_id
    LEFT JOIN tri ON w.doc_id = tri.doc_id
    """,
    doc="Gopher-style repetition signals: duplicate-word fraction, "
    "top-bigram fraction, duplicated-trigram fraction per document.",
)
def q60_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (Q60) — the machine-generated-text rejects of a
    quality pipeline, hash-checked against an all-SQL reimplementation."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.repetition_signals(docs)
    return out.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        round4d(F.col("dup_word_frac")).alias("dup_word_frac"),
        round4d(F.col("top_bigram_frac")).alias("top_bigram_frac"),
        round4d(F.col("dup_trigram_frac")).alias("dup_trigram_frac"),
    )


# --- Q61 k-means + SemDeDup -------------------------------------------------

_KM_K, _KM_ITER, _KM_SEED, _SEM_T = 8, 3, 42, 0.4


def _kmeans_ctes(k: int, n_iter: int, seed: int) -> str:
    """DuckDB CTE chain replaying Lloyd's algorithm step for step."""
    sql = f"""
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
cent0 AS (
  SELECT CAST(rn - 1 AS INT) AS cid, v AS c FROM (
    SELECT vec_id, v, row_number() OVER (
      ORDER BY md5(CAST(vec_id AS VARCHAR) || '|{seed}'), vec_id) AS rn
    FROM emb) WHERE rn <= {k}
)"""
    for i in range(1, n_iter + 1):
        sql += f""",
assign{i} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(list_transform(e.v, (x, i) -> (x - c.c[i]) * (x - c.c[i])), (a, b) -> a + b), c.cid
           ) AS rn
    FROM emb e CROSS JOIN cent{i - 1} c
  ) WHERE rn = 1
)"""
        if i < n_iter:
            sql += f""",
cent{i} AS (
  SELECT cid, list(cd ORDER BY pos) AS c FROM (
    SELECT cid, pos, CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cd
    FROM (SELECT cid, UNNEST(v) AS val, generate_subscripts(v, 1) AS pos FROM assign{i})
    GROUP BY cid, pos
  ) GROUP BY cid
)"""
    return sql


@register(
    "q61_kmeans_semdedup",
    oracle=f"""
    WITH {_kmeans_ctes(_KM_K, _KM_ITER, _KM_SEED)},
    dups AS (
      SELECT DISTINCT b.vec_id FROM assign{_KM_ITER} a JOIN assign{_KM_ITER} b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(a.v, (x, i) -> x * b.v[i]), (p, q) -> p + q)
            / (SQRT(list_reduce(list_transform(a.v, x -> x * x), (p, q) -> p + q))
               * SQRT(list_reduce(list_transform(b.v, x -> x * x), (p, q) -> p + q)))
            >= {_SEM_T}
    )
    SELECT a.vec_id, a.cid AS cluster, (d.vec_id IS NULL) AS kept
    FROM assign{_KM_ITER} a LEFT JOIN dups d ON a.vec_id = d.vec_id
    """,
    doc=f"Lloyd's k-means (k={_KM_K}, {_KM_ITER} assignment steps, "
    "deterministic md5 init + decimal-exact centroid means) feeding "
    "SemDeDup within-cluster cosine dedup — the full iterative "
    "algorithm hash-checked against a generated SQL replay.",
)
def q61_kmeans_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (Q61): cluster the embedding space with
    deterministic k-means, then drop rows whose same-cluster cosine to a
    smaller id reaches the threshold (SemDeDup, Abbas et al. 2023)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.semantic_dedup(
        emb, threshold=_SEM_T, k=_KM_K, n_iter=_KM_ITER, seed=_KM_SEED
    )
