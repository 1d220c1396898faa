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


def test_apply_bpe_matches_python_reference(spark):
    from hadoop_3_3_6_spark.functions.bpe import apply_bpe

    from pyspark.sql import functions as F

    df = _corpus(spark).withColumn("doc_id", F.monotonically_increasing_id())
    wf = {r.word: r.freq for r in _word_freqs(df, "text", None).collect()}
    merges = [(l, r) for l, r, _ in reference_bpe(wf, 10)]
    got = {r.doc_id: (r.bpe_tokens, r.n_chars) for r in apply_bpe(df, merges).collect()}

    def ref_word(word):
        syms = [c if i < len(word) - 1 else c + EOW for i, c in enumerate(word)]
        for left, right in merges:
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right); i += 2
                else:
                    res.append(syms[i]); i += 1
            syms = res
        return len(syms)

    for row in df.select("doc_id", "text").collect():
        words = [w for w in row.text.split(" ") if w]
        want = (sum(ref_word(w) for w in words), sum(len(w) for w in words))
        assert got[row.doc_id] == want
    # merges compress: token count strictly below character count
    assert all(t < c for t, c in got.values())


def test_unigram_train_and_apply_tiny(spark):
    """Hard-EM unigram training on a hand corpus: frequent whole words
    become single pieces (the unigram model's defining behavior vs
    char-BPE's bottom-up merges), per-doc counts follow, and the
    engine's per-word-hash + 31^n combine equals the naive sequential
    id fold."""
    from hadoop_3_3_6_spark.functions.bpe import (
        _viterbi_segment,
        apply_unigram,
        train_unigram,
    )

    df = spark.createDataFrame(
        [(0, "table table table scan"), (1, "table scan scan"), (2, "")],
        "doc_id long, text string",
    )
    pieces = train_unigram(df, "text", vocab_size=10, seed_size=50, max_piece_len=6, iters=2)
    lp = {p: s for p, _i, s in pieces}
    pid = {p: i for p, i, _s in pieces}
    assert "table" in lp and "scan" in lp  # whole words won the EM
    assert _viterbi_segment("table", lp, 6) == ["table"]
    assert _viterbi_segment("tscan", lp, 6) == ["t", "scan"]
    out = {r.doc_id: r for r in apply_unigram(df, pieces, "text", "doc_id").collect()}
    assert out[0].n_pieces == 4 and out[1].n_pieces == 3
    assert out[2].n_pieces == 0 and out[2].pieces_hash == 0
    M = 1_000_000_007
    h = 0
    for w in "table table table scan".split():
        for x in ([pid[p] for p in _viterbi_segment(w, lp, 6)]):
            h = (h * 31 + x) % M
    assert out[0].pieces_hash == h


def test_unigram_oov_char_encodes_unk(spark):
    """A word containing a character absent from training has no
    in-vocab segmentation and must encode as exactly one UNK_ID piece
    — deterministically, with the python-side positive hash."""
    from hadoop_3_3_6_spark.functions.bpe import UNK_ID, apply_unigram, train_unigram

    train = spark.createDataFrame([(0, "aa bb aa")], "doc_id long, text string")
    pieces = train_unigram(train, "text", vocab_size=4, seed_size=10, max_piece_len=4, iters=1)
    test = spark.createDataFrame([(7, "zz")], "doc_id long, text string")
    out = apply_unigram(test, pieces, "text", "doc_id").collect()[0]
    M = 1_000_000_007
    assert out.n_pieces == 1
    assert out.pieces_hash == UNK_ID % M == M - 1


def test_unigram_train_word_cap_is_frequency_topn(spark):
    """The max_train_words bound is the deterministic (-count, word)
    top-N: training on a corpus whose distinct words exceed the cap
    must yield the SAME inventory as training on a corpus holding only
    the surviving words at the same counts — the contract the driver
    oracle's replica mirrors (round-9 ADVICE: the replica truncates
    too, so the pair stays exact past the cap)."""
    from hadoop_3_3_6_spark.functions.bpe import train_unigram

    full = spark.createDataFrame(
        [(0, "table table table scan scan lamp"), (1, "table scan rug")],
        "doc_id long, text string",
    )
    # top-3 by (-count, word): table(4) scan(3) lamp/rug tie -> lamp(1)
    top3 = spark.createDataFrame(
        [(0, "table table table scan scan lamp"), (1, "table scan")],
        "doc_id long, text string",
    )
    kw = dict(vocab_size=8, seed_size=30, max_piece_len=6, iters=2)
    capped = train_unigram(full, "text", max_train_words=3, **kw)
    want = train_unigram(top3, "text", **kw)
    assert capped == want
    assert capped != train_unigram(full, "text", **kw)  # the cap bit
