"""BPE tokenizer: hand-derived merges on the classic corpus, lossless
decode invariant (hypothesis-fuzzed), and distributed encode == driver
encode."""

from __future__ import annotations

from shardpack_spark.operators.tokenizer import (
    END,
    bpe_decode_tokens,
    bpe_encode,
    bpe_train,
    encode_word,
)


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_classic_corpus_merges(spark):
    # Sennrich et al. example frequencies: low x5, lower x2, newest x6,
    # widest x3.  Pair counts at step 1: ('e','s') = 6+3 = 9 is the max
    # (('s','t') ties at 9; ('e','s') < ('s','t') lexicographically),
    # then ('es','t') = 9, then ('est','</w>') = 9.
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    merges = bpe_train(_df(spark, corpus), n_merges=4)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", END)]
    # 4th: 'lo' appears 5+2=7 times — the remaining max
    assert merges[3] == ("l", "o")

    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("low", ranks) == ["lo", "w", END]
    assert encode_word("unseen", ranks) == ["u", "n", "s", "e", "e", "n", END]


def test_zero_merges_is_characters(spark):
    ranks = {}
    assert encode_word("ab", ranks) == ["a", "b", END]


def test_distributed_encode_matches_driver_and_decodes(spark):
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox again and again",
        "pack my box with five dozen liquor jugs",
        "",
        "   ",
    ]
    merges = bpe_train(_df(spark, corpus), n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = bpe_encode(_df(spark, corpus), merges).collect()
    assert len(rows) == len(corpus)
    for r in rows:
        text = corpus[r["doc_id"]]
        expect = [t for w in text.split() for t in encode_word(w, ranks)]
        assert list(r["tokens"]) == expect
        assert r["n_tokens"] == len(expect)
        # lossless: decoding restores the whitespace-normalized text
        assert bpe_decode_tokens(list(r["tokens"])) == " ".join(text.split())


def test_more_merges_never_grow_token_count(spark):
    corpus = ["compression compression ratio ratio ratio improves steadily"] * 3
    df = _df(spark, corpus)
    merges = bpe_train(df, n_merges=40)
    last = None
    for k in (0, 5, 15, 40):
        total = sum(r["n_tokens"] for r in bpe_encode(df, merges[:k]).collect())
        if last is not None:
            assert total <= last
        last = total


def test_decode_fuzz_lossless():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # decode joins on the </w> marker, so a word containing the literal
    # marker is out of domain (byte-level BPE vocabularies avoid this by
    # construction; the driver-side decode helper documents it)
    words = st.text(
        alphabet=st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
        min_size=1,
        max_size=8,
    ).filter(lambda w: END not in w)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(words, max_size=12), st.integers(0, 25))
    def roundtrip(ws, n_pairs):
        # arbitrary merge table over characters actually present
        chars = sorted({c for w in ws for c in w})
        pairs = []
        for i in range(min(n_pairs, max(0, len(chars) - 1))):
            pairs.append((chars[i], chars[i + 1]))
        ranks = {p: i for i, p in enumerate(pairs)}
        toks = [t for w in ws for t in encode_word(w, ranks)]
        assert bpe_decode_tokens(toks) == " ".join(ws)

    roundtrip()


def test_bpe_composes_with_sequence_packing(spark):
    """Real token counts from bpe_encode drive pack_sequences: exactly-once
    doc assignment and every multi-doc sequence within the BPE budget."""
    from shardpack_spark.operators.packing import pack_sequences

    corpus = [
        "some documents are short",
        "others carry quite a few more words than the short ones do",
        "mid length text rows here",
        "a b c d e f g h i j k l m n o p",
        "repeated words repeated words repeated words",
        "one",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=25)
    counted = bpe_encode(df, merges).drop("tokens")
    packed = pack_sequences(counted, budget=40, token_col="n_tokens")
    rows = packed.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(corpus)))
    by_seq: dict = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for members in by_seq.values():
        if len(members) > 1:
            assert sum(m["n_tokens"] for m in members) <= 40


def test_train_and_encode_agree_on_unicode_whitespace(spark):
    """NBSP/U+2028-joined text segments identically in the trainer
    (Java regex) and the encoder (Python re) — a divergence here makes
    the trainer learn merges over words the encoder never produces."""
    from pyspark.sql import functions as F

    from shardpack_spark.operators.tokenizer import (
        _split_words,
        bpe_encode,
        bpe_train,
    )

    text = "foo bar baz qux foo bar"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=20)
    # trainer vocabulary == encoder segmentation
    trained_words = set()
    rows = (
        df.select(F.explode(F.split(F.col("text"), "[ \\t\\n\\r\\f\\x0b]+")).alias("w"))
        .filter(F.col("w") != "")
        .collect()
    )
    trained_words = {r["w"] for r in rows}
    assert trained_words == set(_split_words(text))

    [enc] = bpe_encode(df, merges).collect()
    from shardpack_spark.operators.tokenizer import bpe_decode_tokens

    # lossless modulo the (consistent) whitespace definition
    assert bpe_decode_tokens(enc["tokens"]) == " ".join(_split_words(text))
