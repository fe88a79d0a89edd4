"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Everything is built from codegen'd string/regexp/higher-order expressions —
no Python in the hot path — so the operators stream through a 100 TB scan
at parquet speed.  Every rule is also expressible in ANSI SQL, which keeps
the operators oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/keyword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

# BPE-ish pre-tokenization: word pieces, digit runs, single punctuation.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_PUNCT = r"[.,!?;:]"
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def _count_matches(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


# Word-boundary tokenization equivalent to \b{word}\b counting: split on
# runs of non-word characters ([^a-z0-9_] == complement of ASCII \w on
# lowercased text).  Tokenize ONCE, then count markers with codegen'd
# array filters — one string pass total instead of one full regex scan
# per marker word (25 passes for language ID, 7 for stopwords).
_WORD_SPLIT = r"[^a-z0-9_]+"


def ws_tokens(c: Column) -> Column:
    """Whitespace word tokens (Java \\s+ split on trimmed text, empties
    dropped) — the ONE tokenizer shared by classifier features and
    substring dedup, so token boundaries cannot silently diverge
    between training/apply and dedup."""
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def _word_tokens(c: Column) -> Column:
    return F.split(F.lower(c), _WORD_SPLIT)


def _marker_count(tokens: Column, words: list[str]) -> Column:
    """How many tokens are in `words` — row-local, whole-stage codegen;
    no shuffle, no join, survives any scale the scan itself survives."""
    marker_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda x: F.array_contains(marker_arr, x)))


def _marker_count_sql(tokens_sql: str, words: list[str]) -> str:
    """:func:`_marker_count` as ONE SQL fragment — a single py4j round
    trip instead of one per marker literal plus a lambda registration.
    Same parsed tree: array of string literals, filter + array_contains,
    size."""
    arr = "array(" + ",".join("'" + w.replace("'", "''") + "'" for w in words) + ")"
    return f"size(filter({tokens_sql}, x -> array_contains({arr}, x)))"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(t), r"\s+")).alias("ws_tokens"),
        _count_matches(t, BPE_PATTERN).alias("bpe_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score per document.

    Features: length, whitespace-token count, mean token length, punctuation
    ratio, stopword ratio, alpha ratio.  The composite is a fixed linear
    blend rounded to 4 dp (deterministic double math in both engines).
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    ws = F.size(F.split(F.trim(t), r"\s+"))
    punct = _count_matches(t, _PUNCT)
    alpha = _count_matches(t, r"[A-Za-z]")
    stop = _marker_count(_word_tokens(t), list(_STOPWORDS))
    out = df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        ws.alias("ws_tokens"),
        punct.alias("punct_cnt"),
        alpha.alias("alpha_cnt"),
        stop.alias("stop_cnt"),
    )
    punct_ratio = F.col("punct_cnt").cast("double") / F.col("n_chars")
    alpha_ratio = F.col("alpha_cnt").cast("double") / F.col("n_chars")
    stop_ratio = F.col("stop_cnt").cast("double") / F.col("ws_tokens")
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.4) * F.least(stop_ratio * 2, F.lit(1.0))
        - F.lit(0.2) * punct_ratio
    )
    return out.select(
        id_col,
        "n_chars",
        "ws_tokens",
        F.floor(punct_ratio * 10000.0 + 0.5) / 10000.0,
        F.floor(alpha_ratio * 10000.0 + 0.5) / 10000.0,
        F.floor(score * 10000.0 + 0.5) / 10000.0,
    ).toDF(id_col, "n_chars", "ws_tokens", "punct_ratio", "alpha_ratio", "quality")


def lang_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keyword-marker language ID: score per language, argmax prediction.

    Ties break alphabetically on language code (deterministic).

    One tokenization pass + one array filter per language (all codegen),
    instead of a full regexp_extract_all scan per marker word — 25 string
    scans per row collapsed into one.
    """
    # Built as parsed SQL fragments: the former per-language Column
    # builds (5 marker arrays + 5 filter lambdas + a nested when-chain)
    # cost ~100 py4j round trips ≈ 0.2 s of driver latency per plan
    # build.  Trees are identical — same filter/array_contains/size per
    # language, and the flat CASE checks languages in alphabetical order
    # exactly like the reversed-fold when-chain (earliest lang wins ties).
    langs = sorted(LANG_MARKERS)
    toks = _word_tokens(F.col(text_col))
    scored = df.select(F.col(id_col), toks.alias("__toks")).selectExpr(
        f"`{id_col}`",
        *[
            f"{_marker_count_sql('__toks', LANG_MARKERS[lang])} AS score_{lang}"
            for lang in langs
        ],
    )
    best = "greatest(" + ",".join(f"score_{lang}" for lang in langs) + ")"
    pred = (
        "CASE "
        + " ".join(f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs)
        + " END"
    )
    return scored.selectExpr(
        f"`{id_col}`", *[f"score_{lang}" for lang in langs], f"{pred} AS pred_lang"
    )


def doc_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All per-document text features in ONE scan: token counts, quality
    features/score, and the rolling-hash fingerprint.

    Composing token_counts + quality_scores + fingerprints as separate
    queries would scan the text three times and join on doc_id; at 100 TB
    the single-select formulation is strictly better (still pure codegen,
    zero shuffles)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = _count_matches(t, BPE_PATTERN)
    punct = _count_matches(t, _PUNCT)
    alpha = _count_matches(t, r"[A-Za-z]")
    stop = _marker_count(_word_tokens(t), list(_STOPWORDS))
    fp = rolling_fingerprint(t)
    base = df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        punct.alias("punct_cnt"),
        alpha.alias("alpha_cnt"),
        stop.alias("stop_cnt"),
        fp.alias("fingerprint"),
    )
    punct_ratio = F.col("punct_cnt").cast("double") / F.col("n_chars")
    alpha_ratio = F.col("alpha_cnt").cast("double") / F.col("n_chars")
    stop_ratio = F.col("stop_cnt").cast("double") / F.col("ws_tokens")
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.4) * F.least(stop_ratio * 2, F.lit(1.0))
        - F.lit(0.2) * punct_ratio
    )
    return base.select(
        id_col,
        "n_chars",
        "ws_tokens",
        "bpe_tokens",
        (F.floor(punct_ratio * 10000.0 + 0.5) / 10000.0).alias("punct_ratio"),
        (F.floor(alpha_ratio * 10000.0 + 0.5) / 10000.0).alias("alpha_ratio"),
        (F.floor(score * 10000.0 + 0.5) / 10000.0).alias("quality"),
        "fingerprint",
    )


def rolling_fingerprint(c: Column) -> Column:
    """Rolling polynomial hash (base 31 mod 1e9+7) of a string column as a
    codegen fold — order-sensitive, unlike a bag-of-words hash."""
    p = 1_000_000_007
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % p,
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic rolling polynomial hash (base 31 mod 1e9+7) per doc.

    A true content fingerprint (order-sensitive, unlike a bag-of-words
    hash); computed with a sequential higher-order fold over the char
    array so it stays in codegen.
    """
    return df.select(F.col(id_col), rolling_fingerprint(F.col(text_col)).alias("fingerprint"))


# HTML entity decode pairs, applied AFTER tag stripping (so "&lt;p&gt;"
# survives as literal text, never becomes a strippable tag); &amp; last.
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

# Patterns stay inside the Java-regex ∩ RE2 subset — inline (?is) flags,
# non-greedy quantifiers, explicit character classes, no backreferences —
# so the DuckDB oracle replays them VERBATIM (with its 'g' flag).
# _ATTRS is quote-aware: a '>' INSIDE a quoted attribute value
# (title="a > b") must not end the tag early.
_ATTRS = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
HTML_DROP_BLOCKS = rf"(?is)<(script|style){_ATTRS}>.*?</(script|style)>"
HTML_BLOCK_BREAKS = rf"(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/table){_ATTRS}>"
HTML_ANY_TAG = rf"<{_ATTRS}>"


def html_to_text(c: Column) -> Column:
    """Extract visible text from HTML markup — the first step of every
    web-corpus pipeline (C4 / RefinedWeb start from WET/WARC HTML).

    Pure codegen regex chain: drop <script>/<style> blocks (non-greedy,
    dot-matches-newline), turn block-closers and <br> into newlines,
    strip remaining tags to spaces, decode the six common entities,
    collapse horizontal whitespace and newline runs, trim.  Linear
    single-pass work per document, no Python, no shuffle — a 100 TB WET
    extraction is exactly one scan.
    """
    x = F.regexp_replace(c, HTML_DROP_BLOCKS, " ")
    x = F.regexp_replace(x, HTML_BLOCK_BREAKS, "\n")
    x = F.regexp_replace(x, HTML_ANY_TAG, " ")
    for ent, rep in HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.regexp_replace(x, r"[ \t]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n\n+", "\n")
    # trim BOTH spaces and newlines at the ends (F.trim is spaces-only)
    return F.regexp_replace(x, r"^[\n ]+|[\n ]+$", "")


def html_extract_sql(expr: str) -> str:
    """DuckDB replay of ``html_to_text`` over the SQL expression ``expr``.

    Built from the SAME pattern constants (SQL-quote-doubled) so the two
    engines cannot drift; DuckDB needs its explicit 'g' flag where Spark
    replaces globally by default.  Used by the q32 'html' oracle and the
    hypothesis cross-engine fuzz."""

    def q(pattern: str) -> str:
        return pattern.replace("'", "''")

    return rf"""
    regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(
        replace(replace(replace(replace(replace(replace(
          regexp_replace(regexp_replace(regexp_replace(
            {expr},
            '{q(HTML_DROP_BLOCKS)}', ' ', 'g'),
            '{q(HTML_BLOCK_BREAKS)}', chr(10), 'g'),
            '{q(HTML_ANY_TAG)}', ' ', 'g'),
          '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
          '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
        '[ \t]+', ' ', 'g'),
        ' ?\n ?', chr(10), 'g'),
        '\n\n+', chr(10), 'g'),
      '^[\n ]+|[\n ]+$', '', 'g')
"""


def tf_idf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, term) TF-IDF: (doc_id, term, tf, df, tfidf).

    Tokenize once (lower + whitespace split), count term frequency with
    one groupBy(doc, term) shuffle, persist that TF table, then derive
    document frequency as a partial-aggregated groupBy(term) count over
    it — the TF table is already (doc, term)-distinct, so the count IS
    the document frequency — and attach it back with an equi-join on
    term.  (r9 computed df as ``count(*) over (partition by term)`` to
    avoid the join; that window shuffles the whole TF table on term with
    NO map-side partial aggregation and places every row of a hot term
    on one task — a stopword's df at corpus scale is billions of rows on
    one partition.  The groupBy ships one partial count per (term, map
    partition), the vocabulary-sized df side broadcasts when small, and
    the join — unlike a window — is AQE-skew-splittable.  The persist is
    what keeps the single-tokenize win: Catalyst does not share the TF
    subplan between its two consumers, so without it the corpus would be
    scanned, exploded and aggregated twice.)  idf uses the smoothed form
    ln((N+1)/(df+1)) + 1 so unseen/ubiquitous terms stay finite.  The
    corpus size joins in as a broadcast 1-row aggregate — never a
    driver-side collect.

    The TF persist is NOT unpersisted here (the returned plan references
    it); callers running many tf_idf jobs in one session must drop it
    between runs (``spark.catalog.clearCache()`` or unpersist via the
    catalog) — bench-style harnesses already clearCache per pass.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = F.log((F.col("__n") + 1).cast("double") / (F.col("df") + 1).cast("double")) + 1.0
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf").cast("double") * idf)
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = False,
) -> DataFrame:
    """Train/eval overlap check: per document, the fraction of its
    distinct word n-grams that occur anywhere in ``benchmark``.

    The standard decontamination test for training corpora: a document
    whose n-grams substantially appear in a held-out benchmark leaks
    that benchmark.  Returns (doc_id, n_ngrams, n_matched,
    contamination) for every document with at least one n-gram.

    Plan shape: n-grams are built inside the row (transform over the
    token array + array_distinct — no shuffle), then one left join
    against the distinct benchmark n-gram set keyed on the n-gram
    string, then one groupBy(doc).  ``broadcast_benchmark`` hints the
    benchmark set broadcast-able (typical: benchmarks are tiny next to
    the corpus); default lets AQE decide.
    """
    def ngrams(d: DataFrame, idc) -> DataFrame:
        words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        arr = F.expr(
            f"transform(sequence(1, size(split(lower(trim({text_col})), '\\\\s+')) - {n - 1}),"
            f" i -> array_join(slice(split(lower(trim({text_col})), '\\\\s+'), i, {n}), ' '))"
        )
        return (
            d.filter(F.size(words) >= n)
            .select(idc, F.explode(F.array_distinct(arr)).alias("ng"))
        )

    doc_ng = ngrams(df, F.col(id_col))
    bench_ng = ngrams(benchmark, F.lit(1).alias("__b")).select("ng").distinct()
    bench_ng = bench_ng.withColumn("__hit", F.lit(1))
    if broadcast_benchmark:
        bench_ng = F.broadcast(bench_ng)
    return (
        doc_ng.join(bench_ng, "ng", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
        )
        .withColumn(
            "contamination",
            F.floor(
                F.col("n_matched").cast("double") / F.col("n_ngrams") * 10000.0 + 0.5
            )
            / 10000.0,
        )
    )


def _run_fold(sorted_arr: Column) -> Column:
    """(best, dup) over a SORTED gram array, one codegen left-fold:
    ``best`` = the longest equal-run length (= the max gram count),
    ``dup`` = total instances of grams occurring more than once
    (when a run reaches 2 both instances count, each extension adds 1 —
    summing run_len over runs with run_len > 1)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc, x):
        run2 = (
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).cast("long")
        )
        dup2 = acc["dup"] + (
            F.when(run2 == 2, F.lit(2)).when(run2 > 2, F.lit(1)).otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.greatest(acc["best"], run2).alias("best"),
            dup2.cast("long").alias("dup"),
        )

    return F.aggregate(
        sorted_arr,
        acc0,
        step,
        lambda acc: F.struct(acc["best"].alias("best"), acc["dup"].alias("dup")),
    )


def _gram_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-scan token/bigram/trigram statistics per document — with ZERO
    shuffles.

    Every signal here is document-local, so nothing needs a groupBy:
    grams build inside the row, gram counts come from equal-run folds
    over the row's SORTED gram arrays (O(tokens log tokens) codegen per
    row), and the output is a pure select.  The previous shape exploded
    (doc, n, gram) and aggregated twice — shuffling every distinct gram
    string of the corpus for per-document answers.  Output columns and
    NULL semantics (short docs have NULL bigram/trigram stats, exactly
    as conditional aggregation produced) are unchanged.
    """
    toks = _word_tokens(F.trim(F.col(text_col)))
    toks = F.filter(toks, lambda t: F.length(t) > 0)

    def grams(n: int):
        # guard: sequence(1, 0) DESCENDS in Spark, so short docs need
        # an explicit empty array, not a clamped upper bound
        return F.when(
            F.size("__toks") >= n,
            F.expr(
                f"transform(sequence(1, size(__toks) - {n - 1}),"
                f" i -> array_join(slice(__toks, i, {n}), ' '))"
            ),
        ).otherwise(F.array().cast("array<string>"))

    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    bi = F.array_sort(grams(2))
    tri = F.array_sort(grams(3))
    bst = _run_fold(bi)
    tst = _run_fold(tri)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)  # 0-word docs have no defined signals
        .select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("n_words"),
            F.size(F.array_distinct("__toks")).cast("long").alias("n_distinct"),
            F.aggregate(
                F.col("__toks"),
                F.lit(0).cast("long"),
                lambda acc, t: acc + F.length(t),
            ).alias("char_sum"),
            F.exists("__toks", lambda t: F.array_contains(stop_arr, t))
            .cast("int")
            .alias("has_stop_i"),
            F.when(F.size(bi) > 0, bst["best"]).alias("max_bigram"),
            F.when(F.size(bi) > 0, F.size(bi).cast("long")).alias("total_bigrams"),
            F.when(F.size(tri) > 0, tst["dup"]).alias("dup_trigram_inst"),
            F.when(F.size(tri) > 0, F.size(tri).cast("long")).alias("total_trigrams"),
        )
    )


def _signals_from_stats(stats: DataFrame, id_col: str) -> DataFrame:
    return stats.select(
        id_col,
        "n_words",
        (
            F.lit(1.0)
            - F.col("n_distinct").cast("double") / F.col("n_words").cast("double")
        ).alias("dup_word_frac"),
        (F.col("max_bigram").cast("double") / F.col("total_bigrams")).alias(
            "top_bigram_frac"
        ),
        (F.col("dup_trigram_inst").cast("double") / F.col("total_trigrams")).alias(
            "dup_trigram_frac"
        ),
        (F.col("char_sum").cast("double") / F.col("n_words").cast("double")).alias(
            "mean_word_len"
        ),
        (F.col("has_stop_i") == 1).alias("__has_stop"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    Returns (id, n_words, dup_word_frac, top_bigram_frac,
    dup_trigram_frac):
    - ``dup_word_frac``: 1 - distinct(words)/words — raw token-level
      repetition.
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over all bigrams — catches boilerplate loops.
    - ``dup_trigram_frac``: fraction of trigram *instances* whose trigram
      occurs more than once in the document.
    Documents scoring high on these are the classic low-quality /
    machine-generated training-data rejects (Gopher, Rae et al. 2021,
    §A1.1 — public paper).  Docs with fewer than n tokens get NULL for
    the n-gram fractions; 0-word docs are excluded.

    Plan shape (see _gram_stats): ONE scan, one explode, two map-side
    combining aggregations on compact keys.  Linear in corpus size, no
    all-pairs anything — survives 100 TB.
    """
    return _signals_from_stats(_gram_stats(df, text_col, id_col), id_col).select(
        id_col, "n_words", "dup_word_frac", "top_bigram_frac", "dup_trigram_frac"
    )


# Gopher-style quality rules (Rae et al. 2021 §A1.1, public paper),
# adapted to the signals computable from whitespace/word tokens.  Each is
# (name, violated-when) — a document is kept iff NO rule fires.
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_WORD_LEN = (2.0, 12.0)
GOPHER_MAX_DUP_WORD_FRAC = 0.6
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.5
GOPHER_MAX_DUP_TRIGRAM_FRAC = 0.8


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality verdict per document: (id, repetition signals,
    mean_word_len, keep, reasons).

    ``reasons`` is the comma-joined sorted list of violated rule names
    (empty string when kept) — deterministic, so the whole verdict is
    oracle-checkable.  Every signal (repetition fractions, mean word
    length, stopword presence) comes from the shared one-scan
    ``_gram_stats`` pass — the verdict costs the corpus exactly one read.
    """
    j = _signals_from_stats(_gram_stats(df, text_col, id_col), id_col)
    rules = [
        ("too_few_words", F.col("n_words") < GOPHER_MIN_WORDS),
        ("too_many_words", F.col("n_words") > GOPHER_MAX_WORDS),
        (
            "word_len_out_of_range",
            (F.col("mean_word_len") < GOPHER_MEAN_WORD_LEN[0])
            | (F.col("mean_word_len") > GOPHER_MEAN_WORD_LEN[1]),
        ),
        ("dup_words", F.col("dup_word_frac") > GOPHER_MAX_DUP_WORD_FRAC),
        (
            "top_bigram",
            F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)) > GOPHER_MAX_TOP_BIGRAM_FRAC,
        ),
        (
            "dup_trigrams",
            F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0))
            > GOPHER_MAX_DUP_TRIGRAM_FRAC,
        ),
        ("no_stopwords", ~F.col("__has_stop")),
    ]
    reasons = F.array_join(
        F.array_compact(F.array(*[F.when(cond, F.lit(name)) for name, cond in sorted(rules)])),
        ",",
    )
    return j.select(
        id_col,
        "n_words",
        "dup_word_frac",
        "top_bigram_frac",
        "dup_trigram_frac",
        "mean_word_len",
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )


def line_dedup(
    df: DataFrame,
    max_doc_freq: int = 1,
    min_line_chars: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line-level dedup (CCNet-style boilerplate removal).

    Web corpora repeat whole LINES across documents — cookie banners,
    nav menus, footers — that doc-level dedup never touches.  This drops
    every line whose normalized form (lowercased, whitespace-trimmed)
    appears in more than ``max_doc_freq`` distinct documents, then
    reassembles each document from its surviving lines in order.

    Lines shorter than ``min_line_chars`` after trimming are always kept:
    they are structure (blank separators, list bullets), not boilerplate,
    and exempting them also keeps the dedup join skew-free — the
    pathological shuffle keys at corpus scale are exactly the ultra-short
    lines ("", "-", "*") that millions of documents share.

    Plan shape (all codegen, scales by total line count, never docs^2):
    split + posexplode -> distinct (doc, line) -> partial-aggregated
    count per line -> the DROP LIST (lines with doc_freq > max_doc_freq,
    a small fraction of distinct lines) -> left_anti join -> groupBy(doc)
    ordered reassembly.  The anti-join's build side is the drop list, so
    the full distinct-line table is never joined against.

    ``sep`` sets the dedup unit: '\\n' (default) for lines, '\\n\\n' for
    paragraphs.  It is treated literally, not as a regex.

    Returns (id, text, n_lines, n_kept) with ``text`` rebuilt from kept
    units (``sep``-joined); n_lines/n_kept make the removal rate auditable.
    """
    pat = "\\Q" + sep + "\\E"  # literal separator, regex-quoted
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pat)).alias("__pos", "__line"),
    ).withColumn("__norm", F.lower(F.trim("__line")))
    dedupable = F.length("__norm") >= min_line_chars

    # document frequency: each doc counts each normalized line ONCE.
    # The per-doc dedup happens INSIDE the row (array_distinct before
    # the explode) — a (id, norm).distinct() on the exploded rows would
    # shuffle every line of every document to remove duplicates that
    # are local to the row (the char_shingles rule).
    norm_arr = F.array_distinct(
        F.filter(
            F.transform(
                F.split(F.col(text_col), pat), lambda l: F.lower(F.trim(l))
            ),
            lambda s: F.length(s) >= min_line_chars,
        )
    )
    drop_list = (
        df.select(F.explode(norm_arr).alias("__norm"))
        .groupBy("__norm")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("__norm")
    )
    kept = lines.filter(dedupable).join(drop_list, "__norm", "left_anti")
    survivors = kept.select(id_col, "__pos", "__line").unionByName(
        lines.filter(~dedupable).select(id_col, "__pos", "__line")
    )
    rebuilt = (
        survivors.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__line"))
            ).alias("__ordered")
        )
        .select(
            id_col,
            F.concat_ws(
                sep, F.transform("__ordered", lambda s: s["__line"])
            ).alias(text_col),
            F.size("__ordered").alias("n_kept"),
        )
    )
    totals = df.select(
        F.col(id_col),
        (F.size(F.split(F.col(text_col), pat))).alias("n_lines"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
) -> DataFrame:
    """Rule-based sentence segmentation: split after [.!?] runs followed
    by whitespace (lookbehind regex, pure codegen explode).  One row per
    sentence: (id, sent_idx, sentence) with 0-based indexes and
    whitespace-trimmed text; fragments shorter than ``min_chars`` after
    trimming are dropped (index still counts the original position, so
    offsets remain joinable with the unfiltered split).

    Deterministic and cheap by design — the boundary rules a real
    pipeline wants are locale-specific models; this is the standard
    regex baseline that feeds chunkers and per-sentence dedup/quality
    filters at corpus scale (rows scale with sentence count, no Python).
    """
    parts = F.split(F.col(text_col), r"(?<=[.!?])\s+")
    out = df.select(
        F.col(id_col),
        F.posexplode(parts).alias("sent_idx", "sentence"),
    ).withColumn("sentence", F.trim("sentence"))
    return out.filter(F.length("sentence") >= min_chars)


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 2048,
    overlap: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap.

    The step that feeds embedding / retrieval pipelines: each output row
    is (id, chunk_idx, chunk_start, chunk) where ``chunk_start`` is the
    1-based character offset and consecutive chunks share ``overlap``
    characters so no span near a boundary is lost.  Chunk ids are stable
    (position-derived), so re-running on the same corpus reproduces the
    same chunk keys.

    Entirely codegen: chunk starts come from a sequence() stride inside
    the row and explode linearly — one scan, no shuffle, no Python.
    Scales with total characters exactly like shingling.
    """
    if chunk_chars < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")
    if not 0 <= overlap < chunk_chars:
        raise ValueError(f"overlap ({overlap}) must be in [0, chunk_chars)")
    stride = chunk_chars - overlap
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(text_col) - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
            F.col(text_col),
        )
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.substring(F.col(text_col), F.col("chunk_start"), chunk_chars).alias("chunk"),
        )
    )


def train_char_lm(
    df: DataFrame, n: int = 3, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Character n-gram language model from a reference corpus.

    Returns (gram_counts, prefix_counts): (gram, cnt) over all character
    n-grams and (prefix, pcnt) over their (n-1)-char prefixes.  Two
    aggregations over one explode — the model for a 100 TB corpus is
    still bounded by alphabet^n distinct rows (a char-trigram table tops
    out around a few million entries), small enough to broadcast at
    scoring time.
    """
    grams = df.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col}) - {n - 1}),"
                f" i -> substring({text_col}, i, {n}))"
            )
        ).alias("gram")
    ).filter(F.length("gram") == n)
    gram_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    prefix_counts = (
        gram_counts.groupBy(F.substring("gram", 1, n - 1).alias("prefix"))
        .agg(F.sum("cnt").alias("pcnt"))
    )
    return gram_counts, prefix_counts


def char_lm_scores(
    df: DataFrame,
    gram_counts: DataFrame,
    prefix_counts: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: int = 256,
) -> DataFrame:
    """Per-document mean log-probability and perplexity under a character
    n-gram LM — the CCNet-style quality signal: text that looks like the
    reference corpus scores low perplexity, boilerplate/garbage scores
    high.

    P(c|ctx) is Laplace-smoothed: (cnt + 1) / (pcnt + vocab); unseen
    grams and prefixes fall back to the same formula with zero counts, so
    every document gets a finite score.  Plan: one explode linear in
    characters, two dimension joins against the model (broadcast-sized by
    construction), one aggregation.  The log-prob sum runs in DECIMAL so
    the result is independent of partial-aggregation order.

    Returns (id, n_grams, avg_logp, ppl) for documents with at least one
    n-gram.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col}) - {n - 1}),"
                f" i -> substring({text_col}, i, {n}))"
            )
        ).alias("gram"),
    ).filter(F.length("gram") == n)
    scored = (
        grams.join(gram_counts, "gram", "left")
        .withColumn("prefix", F.substring("gram", 1, n - 1))
        .join(prefix_counts, "prefix", "left")
        .withColumn(
            "__logp",
            F.log(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
            - F.log(F.coalesce(F.col("pcnt"), F.lit(0)) + F.lit(float(vocab))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            (
                F.sum(F.col("__logp").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_logp"),
        )
        .withColumn("ppl", F.exp(-F.col("avg_logp")))
    )


# --- C4-style cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning...", §2.2 — the heuristics behind the C4 corpus) ---------

C4_MIN_WORDS_PER_LINE = 3
C4_MIN_SENTENCES = 5
C4_TERMINAL = ('.', '!', '?', '"')


def c4_clean_lines(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4's LINE-level pass, pure codegen: keep only lines that end in a
    terminal punctuation mark ('.', '!', '?', '\"'), contain at least
    C4_MIN_WORDS_PER_LINE words, and do not mention 'javascript'
    (case-insensitive); rebuild the document from the survivors.

    Returns (id, clean_text, n_lines, n_kept_lines).  Documents whose
    every line is dropped come back with clean_text = '' — pair with
    ``c4_document_filter`` which drops them for the sentence-count rule.
    """
    lines = F.split(F.col(text_col), "\n")
    is_kept = (
        lambda ln: F.trim(ln).rlike(r"[.!?\"]$")
        & (F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != "")) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(ln).contains("javascript")
    )
    kept = F.filter(lines, is_kept)
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
    )


def c4_document_filter(
    cleaned: DataFrame,
    text_col: str = "clean_text",
    id_col: str = "id",
    bad_phrases: tuple = ("lorem ipsum",),
    carry: tuple = (),
) -> DataFrame:
    """C4's DOCUMENT-level gates over the line-cleaned text: at least
    C4_MIN_SENTENCES sentences (terminal-punctuation count), no curly
    brace (code), none of ``bad_phrases`` (the paper also applies a
    blocklist; parameterized here).  Returns (id, n_sentences, keep,
    reasons) with deterministic comma-joined reasons, same contract as
    gopher_quality_filter.  ``carry`` names extra input columns to pass
    through the projection — both passes are row-local, so a caller
    needing line stats next to the verdict gets them from ONE scan
    instead of joining this output back to its own input.

    Span-level dedup (the paper's three-sentence-window rule) is
    ``dedup.substring_dedup`` — run it after this gate.
    """
    low = F.lower(F.col(text_col))
    n_sent = F.size(F.filter(F.split(F.col(text_col), r"[.!?]"), lambda s: F.trim(s) != ""))
    rules = [
        ("too_few_sentences", n_sent < C4_MIN_SENTENCES),
        ("curly_brace", F.col(text_col).contains("{")),
    ] + [
        (f"bad_phrase_{i}", low.contains(p.lower()))
        for i, p in enumerate(bad_phrases)
    ]
    reasons = F.array_join(
        F.array_compact(F.array(*[F.when(cond, F.lit(name)) for name, cond in sorted(rules)])),
        ",",
    )
    return cleaned.select(
        id_col,
        *carry,
        n_sent.alias("n_sentences"),
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )
