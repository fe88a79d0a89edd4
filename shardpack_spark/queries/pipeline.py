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

from shardpack_spark.operators import clustering, pii, text, urls
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


# Synthetic per-doc URL exercising every canonicalization rule: mixed-case
# host, default port, tracking params in leading and trailing position,
# fragment.  Identical expression on both sides.
_URL_SQL = (
    "'https://' || source || '.Example.COM'"
    " || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END"
    " || '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)"
    " || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&x=1'"
    "         ELSE '?x=1&utm_campaign=a' END"
    " || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END"
)

_CANON_SQL = f"""
      SELECT doc_id, aug, url,
             lower(regexp_extract(url, '{urls.SCHEME_PAT}', 1)) AS scheme,
             lower(regexp_extract(url, '{urls.HOSTPORT_PAT}', 1)) AS hostport,
             regexp_replace(regexp_extract(url, '{urls.PATH_PAT}', 1), '^/$', '')
               AS path,
             list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                         p -> p <> '' AND NOT regexp_matches(p, '{urls.TRACKING_PARAM_PAT}'))
               AS params
      FROM aug
"""


@register(
    "q59_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, {_AUG_SQL} AS aug, {_URL_SQL} AS url FROM documents
    ), parts AS ({_CANON_SQL}
    ), canon AS (
      SELECT doc_id, aug,
             scheme || '://' ||
             CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                  ELSE hostport END ||
             path ||
             CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
                  ELSE '' END AS canon_url,
             regexp_replace(hostport, ':[0-9]+$', '') AS host
      FROM parts
    )
    SELECT doc_id, {_COUNTS_SQL}, {_REDACT_SQL} AS redacted,
           canon_url, host,
           regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
    FROM canon
    """,
    doc="Web-document hygiene: PII detection + redaction (email, credit "
    "card, SSN, IPv4, phone) over deterministically planted PII, plus "
    "URL canonicalization (case, default port, tracking params, "
    "fragment) — counts, redacted text, and canonical URL byte-checked.",
)
def q59_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-document hygiene (Q59): plant one PII string per doc_id%7
    family and a synthetic messy URL per doc, then count/redact PII and
    canonicalize the URL with the shared Java/RE2-compatible patterns.
    Pure codegen — one fused scan stage, no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.element_at(
            F.array(*[F.lit(s) for s in _PII_SNIPPETS]),
            (F.col("doc_id") % 7 + 1).cast("int"),
        ),
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/"), F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed&x=1"))
        .otherwise(F.lit("?x=1&utm_campaign=a")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    counts = pii.pii_counts(aug)
    return docs.select(
        "doc_id",
        *[c.alias(f"n_{fam}") for fam, c in counts.items()],
        pii.redact(aug).alias("redacted"),
        urls.canonical_url(url).alias("canon_url"),
        urls.url_host(url).alias("host"),
        urls.registered_domain(url).alias("domain"),
    )


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
    , sig AS (
      SELECT w.doc_id, w.n_words,
             1.0 - CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE)
               AS dup_word_frac,
             bi.top_bigram_frac, tri.dup_trigram_frac,
             CAST(list_reduce(list_transform(w.tk, t -> length(t)), (a, b) -> a + b)
                  AS DOUBLE) / CAST(w.n_words AS DOUBLE) AS mean_word_len,
             len(list_intersect(w.tk,
                 ['the', 'a', 'of', 'and', 'to', 'in', 'is'])) > 0 AS has_stop
      FROM words w
      LEFT JOIN bi ON w.doc_id = bi.doc_id
      LEFT JOIN tri ON w.doc_id = tri.doc_id
    ), verdict AS (
      SELECT doc_id, n_words, dup_word_frac, top_bigram_frac, dup_trigram_frac,
             mean_word_len,
             COALESCE(array_to_string(list_sort(list_filter([
               CASE WHEN dup_word_frac > 0.6 THEN 'dup_words' END,
               CASE WHEN COALESCE(dup_trigram_frac, 0.0) > 0.8 THEN 'dup_trigrams' END,
               CASE WHEN NOT has_stop THEN 'no_stopwords' END,
               CASE WHEN COALESCE(top_bigram_frac, 0.0) > 0.5 THEN 'top_bigram' END,
               CASE WHEN n_words < 10 THEN 'too_few_words' END,
               CASE WHEN n_words > 100000 THEN 'too_many_words' END,
               CASE WHEN mean_word_len < 2.0 OR mean_word_len > 12.0
                    THEN 'word_len_out_of_range' END
             ], x -> x IS NOT NULL)), ','), '') AS reasons
      FROM sig
    )
    SELECT doc_id, CAST(n_words AS INT) AS n_words,
           FLOOR(dup_word_frac * 10000.0 + 0.5) / 10000.0 AS dup_word_frac,
           FLOOR(top_bigram_frac * 10000.0 + 0.5) / 10000.0 AS top_bigram_frac,
           FLOOR(dup_trigram_frac * 10000.0 + 0.5) / 10000.0 AS dup_trigram_frac,
           FLOOR(mean_word_len * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
           reasons, reasons = '' AS keep
    FROM verdict
    """,
    doc="Gopher-style repetition signals (duplicate-word / top-bigram / "
    "duplicated-trigram fractions) plus the full quality-rule verdict "
    "(keep + violated-rule reasons) per document.",
)
def q60_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals + Gopher quality verdict (Q60) — the
    machine-generated-text rejects of a quality pipeline, hash-checked
    against an all-SQL reimplementation including the reason strings."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.gopher_quality_filter(docs)
    return out.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        round4d(F.col("dup_word_frac")).alias("dup_word_frac"),
        round4d(F.col("top_bigram_frac")).alias("top_bigram_frac"),
        round4d(F.col("dup_trigram_frac")).alias("dup_trigram_frac"),
        round4d(F.col("mean_word_len")).alias("mean_word_len"),
        "reasons",
        "keep",
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


_DSIR_ORACLE = r"""
    WITH words AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         w -> length(w) > 0) AS ws
      FROM documents
    ),
    grams AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS ngram
      FROM words, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 2
    ),
    tf AS (SELECT doc_id, ngram, COUNT(*) AS tf FROM grams GROUP BY 1, 2),
    raw_counts AS (SELECT ngram, SUM(tf) AS cr FROM tf GROUP BY 1),
    tgt_counts AS (
      SELECT ngram, SUM(tf) AS ct
      FROM tf JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1
    ),
    tot AS (SELECT SUM(cr) AS nr, COUNT(*) AS v FROM raw_counts),
    ttot AS (SELECT COALESCE(SUM(ct), 0) AS nt FROM tgt_counts),
    ratios AS (
      SELECT r.ngram,
             FLOOR(LN(CAST((COALESCE(t.ct, 0) + 1) * (tot.nr + tot.v) AS DOUBLE)
                      / CAST((r.cr + 1) * (ttot.nt + tot.v) AS DOUBLE))
                   * 10000.0 + 0.5) / 10000.0 AS logr
      FROM raw_counts r LEFT JOIN tgt_counts t USING (ngram), tot, ttot
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS i1,
           CAST(NULL AS BIGINT) AS i2,
           CAST(NULL AS BIGINT) AS i3,
           FLOOR(SUM(tf.tf * ratios.logr) * 10000.0 + 0.5) / 10000.0 AS score,
           '' AS tags,
           CAST(NULL AS BOOLEAN) AS keep
    FROM tf JOIN ratios USING (ngram)
    GROUP BY 1
"""

_C4_ORACLE = r"""
    WITH lines AS (
      SELECT doc_id, regexp_split_to_array(text, '\n') AS ls FROM documents
    ),
    cleaned AS (
      SELECT doc_id,
             len(ls) AS n_lines,
             list_filter(ls, ln ->
               regexp_matches(trim(ln), '[.!?"]$')
               AND len(list_filter(regexp_split_to_array(trim(ln), '\s+'),
                                   w -> length(w) > 0)) >= 3
               AND NOT contains(lower(ln), 'javascript')) AS kept
      FROM lines
    ),
    doc AS (
      SELECT doc_id, n_lines, len(kept) AS n_kept_lines,
             COALESCE(array_to_string(kept, chr(10)), '') AS clean_text
      FROM cleaned
    ),
    gated AS (
      SELECT doc_id, n_lines, n_kept_lines,
             len(list_filter(regexp_split_to_array(clean_text, '[.!?]'),
                             s -> trim(s) <> '')) AS n_sentences,
             contains(lower(clean_text), 'lorem ipsum') AS bad0,
             contains(clean_text, '{') AS curly
      FROM doc
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS i1,
           CAST(n_kept_lines AS BIGINT) AS i2,
           CAST(n_sentences AS BIGINT) AS i3,
           CAST(NULL AS DOUBLE) AS score,
           -- COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
           -- concat_ws is '' — a clean doc (no violations) must read ''
           -- in both engines (divergence found by the adversarial-corpus
           -- fuzz; driver word-soup docs always fail the sentence gate,
           -- so tags was never empty there)
           COALESCE(array_to_string(list_filter([
             CASE WHEN bad0 THEN 'bad_phrase_0' END,
             CASE WHEN curly THEN 'curly_brace' END,
             CASE WHEN n_sentences < 5 THEN 'too_few_sentences' END
           ], x -> x IS NOT NULL), ','), '') AS tags,
           (NOT bad0 AND NOT curly AND n_sentences >= 5) AS keep
    FROM gated
"""


_KL_ORACLE = r"""
    WITH words AS (
      SELECT source AS grp,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                w -> w <> '')) AS w
      FROM documents
    ), gw AS (
      SELECT grp, w, COUNT(*) AS cgw FROM words GROUP BY 1, 2
    ), cw AS (
      SELECT w, SUM(cgw) AS cw FROM gw GROUP BY 1
    ), gtot AS (
      SELECT grp, SUM(cgw) AS ng FROM gw GROUP BY 1
    ), consts AS (
      SELECT COUNT(*) AS v, SUM(cw) AS nc FROM cw
    ), terms AS (
      SELECT gw.grp, gtot.ng,
             CAST(FLOOR(
               ((gw.cgw + 1) / (gtot.ng + consts.v))
                 * ln(((gw.cgw + 1) / (gtot.ng + consts.v))
                      / ((cw.cw + 1) / (consts.nc + consts.v)))
                 * 1e8 + 0.5) AS BIGINT) AS contrib
      FROM gw JOIN cw USING (w) JOIN gtot USING (grp), consts
    )
    SELECT CAST(NULL AS BIGINT) AS doc_id,
           CAST(MAX(ng) AS BIGINT) AS i1,
           CAST(NULL AS BIGINT) AS i2,
           CAST(NULL AS BIGINT) AS i3,
           FLOOR(CAST(SUM(contrib) AS DOUBLE) / 100.0 + 0.5) / 1000000.0 AS score,
           grp AS tags,
           CAST(NULL AS BOOLEAN) AS keep
    FROM terms
    GROUP BY grp
"""


@register(
    "q62_curation_scores",
    oracle=f"""
    SELECT 'dsir' AS variant, * FROM ({_DSIR_ORACLE})
    UNION ALL
    SELECT 'c4' AS variant, * FROM ({_C4_ORACLE})
    UNION ALL
    SELECT 'kl' AS variant, * FROM ({_KL_ORACLE})
    """,
    doc="Two corpus-curation scorers in one tagged result: DSIR "
    "importance scoring (Xie et al. 2023 — bigram Laplace LLR model "
    "fit, tf-weighted per-doc sums) and C4 cleaning heuristics "
    "(Raffel et al. 2020 §2.2 — line filters + document gates); both "
    "pipelines are replayed end-to-end in the DuckDB oracle.",
)
def q62_curation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores + C4 cleaning verdicts (Q62).

    Column harmonization for the variant union: i1/i2/i3 carry the
    integer signals (dsir: n_grams/—/—; c4: n_lines/n_kept_lines/
    n_sentences), ``score`` the DSIR log-likelihood-ratio sum, ``tags``
    the C4 violation reasons, ``keep`` the C4 verdict.

    DSIR determinism: each per-ngram ratio is rounded to the 1e-4 grid
    BEFORE the per-doc sum, so the sum lands exactly on that grid and
    cross-engine libm/summation-order noise (~1e-12) cannot flip the
    final rounding — the mean's divisor would re-introduce .5-boundary
    ties (use operators/selection.dsir_scores for the length-normalized
    mean and dsir_resample for Gumbel-top-k selection; the noise hash
    has no cross-engine oracle).
    """
    from shardpack_spark.operators import selection

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    # grams serves BOTH the per-doc tf sums and (via raw_grams) the raw
    # side of the ratio model: one tokenize pass + persist of the
    # (id, ngram, tf) table instead of three independent corpus
    # tokenizations (the ratio operator persists its own counts, so the
    # whole DSIR leg scans the corpus once for raw + once for target)
    grams = selection.word_ngrams(docs, n=2).persist()
    ratios = selection.ngram_log_ratios(docs, target, n=2, raw_grams=grams)
    dsir = (
        grams.join(ratios, "ngram")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.sum("tf").alias("i1"),
            F.lit(None).cast("bigint").alias("i2"),
            F.lit(None).cast("bigint").alias("i3"),
            (F.floor(F.sum(F.col("tf") * F.col("logr")) * 10000.0 + F.lit(0.5)) / 10000.0).alias("score"),
            F.lit("").alias("tags"),
            F.lit(None).cast("boolean").alias("keep"),
        )
    )
    # both C4 passes are row-local projections: carry the line stats
    # through the document gate and skip the self-join (2 scans -> 1)
    cleaned = text.c4_clean_lines(docs)
    gated = text.c4_document_filter(cleaned, carry=("n_lines", "n_kept_lines"))
    c4 = gated.select(
        F.col("id").alias("doc_id"),
        F.col("n_lines").cast("bigint").alias("i1"),
        F.col("n_kept_lines").cast("bigint").alias("i2"),
        F.col("n_sentences").cast("bigint").alias("i3"),
        F.lit(None).cast("double").alias("score"),
        F.col("reasons").alias("tags"),
        "keep",
    )

    kl = selection.source_kl_divergence(docs).select(
        F.lit(None).cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("i1"),
        F.lit(None).cast("bigint").alias("i2"),
        F.lit(None).cast("bigint").alias("i3"),
        F.col("kl").alias("score"),
        F.col("grp").alias("tags"),
        F.lit(None).cast("boolean").alias("keep"),
    )

    def tag(variant: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(variant).alias("variant"), "*")

    return tag("dsir", dsir).unionAll(tag("c4", c4)).unionAll(tag("kl", kl))
