"""Unigram-LM tokenizer: Viterbi exactness, EM determinism, partition
invariance, and compression sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from glamira_batch_processing_spark.operators.unigram import (
    UNK_SCORE,
    seed_vocab,
    unigram_encode_stats,
    unigram_train,
    viterbi_segment,
)


def test_viterbi_hand_computed():
    """Piece probs chosen so the best split is checkable by hand."""
    scores = {
        "a": math.log(0.1), "b": math.log(0.1),
        "ab": math.log(0.3), "abc": math.log(0.4), "c": math.log(0.1),
    }
    # 'abc' as one piece (log 0.4) beats ab+c (log 0.03) and a+b+c
    assert viterbi_segment("abc", scores, 4) == ["abc"]
    # 'abab' -> ab+ab (2*log .3) beats a+b+ab etc.
    assert viterbi_segment("abab", scores, 4) == ["ab", "ab"]


def test_viterbi_tie_prefers_longer_final_piece():
    """Two segmentations with bit-identical scores: the longer final
    piece must win (smallest split point)."""
    s = math.log(0.25)
    scores = {"x": s, "xx": 2 * s}  # xx == x+x exactly (2*s vs s+s)
    assert (2 * s) == (s + s)
    assert viterbi_segment("xx", scores, 4) == ["xx"]


def test_viterbi_unknown_char_fallback():
    scores = {"a": math.log(0.5)}
    seg = viterbi_segment("aqa", scores, 4)
    assert seg == ["a", "q", "a"]
    # unknown never beats a real piece
    assert scores.get("q") is None and UNK_SCORE < math.log(0.5)


def test_seed_vocab_contains_all_chars_and_top_substrings(spark):
    df = spark.createDataFrame(
        [("the cat the cat",), ("the dog",)], "text string"
    )
    vocab = dict(seed_vocab(df, "text", max_piece_len=3, seed_size=24))
    for ch in "thecadog":
        assert ch in vocab
    assert vocab["the"] == 3
    assert vocab["cat"] == 2


def test_unigram_train_learns_repeated_unit_and_is_partition_invariant(spark):
    rows = [("ababab ababab ab",)] * 6 + [("zq",)]
    df1 = spark.createDataFrame(rows, "text string")
    df7 = df1.repartition(7)
    v1 = unigram_train(df1, vocab_size=8, n_iters=2, max_piece_len=3, seed_size=32)
    v7 = unigram_train(df7, vocab_size=8, n_iters=2, max_piece_len=3, seed_size=32)
    assert v1 == v7, "training must be partition-invariant"
    top_multi = [p for p, _ in v1 if len(p) > 1][0]
    assert top_multi in ("ab", "aba", "bab")


def test_unigram_encode_stats_compresses_and_digests(spark):
    df = spark.createDataFrame(
        [(1, "the table the table"), (2, "the row"), (3, None)],
        "doc_id long, text string",
    )
    vocab = unigram_train(
        df.select("text"), vocab_size=16, n_iters=2, max_piece_len=4, seed_size=64
    )
    got = {r.doc_id: r for r in unigram_encode_stats(df, vocab, max_piece_len=4).collect()}
    n_chars_1 = len("thetablethetable")
    assert 0 < got[1].n_tokens < n_chars_1, "must beat character-level"
    assert got[3].n_tokens == 0 and got[3].seg_digest is not None
    # determinism: same digest on re-run
    again = {r.doc_id: r.seg_digest for r in unigram_encode_stats(df, vocab, max_piece_len=4).collect()}
    assert {k: v.seg_digest for k, v in got.items()} == again
