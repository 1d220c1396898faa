"""BPE tokenizer training (functions/bpe.py): the Spark pipeline must
reproduce the pure-Python reference merge-for-merge (count, order and
tiebreaks), stop early when pairs bottom out, and respect word
boundaries via the EOW marker."""

from __future__ import annotations

from hadoop_3_3_6_spark.functions.bpe import (
    EOW,
    _word_freqs,
    reference_bpe,
    train_bpe,
)


def _corpus(spark):
    rows = [
        ("low low low lower lower newest newest newest newest widest widest",),
        ("the newest gadget is the widest gadget of the newest line",),
        ("low lower lowest the the the newest",),
    ] * 5
    return spark.createDataFrame(rows, "text string")


def test_train_bpe_matches_python_reference(spark):
    df = _corpus(spark)
    merges = train_bpe(df, num_merges=15, sample_cap_words=None).collect()
    wf = {r.word: r.freq for r in _word_freqs(df, "text", None).collect()}
    ref = reference_bpe(wf, 15)
    assert [(r.left, r.right, r.pair_count) for r in merges] == ref
    assert [r.rank for r in merges] == list(range(len(merges)))
    assert all(r.merged == r.left + r.right for r in merges)


def test_train_bpe_merges_never_cross_word_boundary(spark):
    merges = train_bpe(_corpus(spark), num_merges=20, sample_cap_words=None).collect()
    # EOW may only ever terminate a merged symbol, never sit inside one
    for r in merges:
        assert EOW not in r.left, r
        assert not r.right.startswith(EOW) or r.right == EOW, r
        inner = r.merged[: -len(EOW)] if r.merged.endswith(EOW) else r.merged
        assert EOW not in inner, r


def test_train_bpe_early_stop_on_tiny_corpus(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    # every word is a single symbol after char-split ('a</w>' etc.):
    # no pair ever reaches count 2 -> zero merges, no infinite loop
    assert train_bpe(df, num_merges=10, sample_cap_words=None).count() == 0


def test_word_freq_cap_is_deterministic(spark):
    df = _corpus(spark)
    a = {r.word: r.freq for r in _word_freqs(df, "text", 5).collect()}
    b = {r.word: r.freq for r in _word_freqs(df, "text", 5).collect()}
    assert a == b and len(a) == 5
