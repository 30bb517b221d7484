"""Unigram-LM tokenizer (SentencePiece-style, Kudo 2018): distributed
Viterbi-EM training + Arrow-batched encoding.

The complement to ``operators/bpe.py``: BPE builds a vocabulary
bottom-up by merging frequent pairs; the unigram LM starts from an
OVER-complete seed vocabulary (all frequent substrings) and shrinks it,
choosing for every word the segmentation that maximizes the sum of
piece log-probabilities. This is the tokenizer family behind
SentencePiece/T5/LLaMA-style vocabularies, so a training-data pipeline
that packs or cost-accounts in unigram tokens needs the real
segmentation, not a whitespace proxy.

Training here is hard-EM (Viterbi-EM — the E-step assigns each word its
single best segmentation rather than the full forward-backward
posterior; SentencePiece itself offers this mode), which keeps every
statistic an EXACT INTEGER count:

* seed: one Arrow pass emits per-batch partial counts of every
  substring up to ``max_piece_len`` per word (vocab-bounded rows — the
  per-batch dict collapses repeats before anything is emitted), one
  groupBy sums them, the driver keeps the top ``seed_size`` plus every
  single character (the closure guarantee: every word stays
  segmentable).
* E-step: piece scores (log count/total, computed ONCE on the driver so
  a heterogeneous cluster's libm cannot disagree mid-iteration) ship in
  the task closure; each batch Viterbi-segments its distinct words
  (per-batch cache — Zipf makes throughput track the distinct-word
  rate) and emits partial integer piece counts; one groupBy sums.
* M-step: re-score from the exact counts; pieces that won zero tokens
  die (single chars are immortal).
* prune: after the final iteration keep the top ``vocab_size`` pieces
  by (count desc, piece) — count-based pruning instead of
  SentencePiece's likelihood-loss ranking, chosen because it is
  deterministic, total-ordered, and partition-invariant.

Viterbi ties (two segmentations with bit-identical float scores) break
toward the LONGER final piece (the smallest split point wins), so the
learned table and every segmentation are deterministic and
partition-invariant — pinned by pytest.

Scale design (100 TB): both passes are embarrassingly parallel Arrow
scans emitting vocab-bounded partials with map-side combining; the only
shuffle per round has ~|vocab| keys. Driver state is the vocabulary
itself (bounded by construction). Rounds are a small constant. No
all-pairs, no per-token rows, no Python row loop.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PIECE_COUNT_SCHEMA = StructType(
    [
        StructField("piece", StringType()),
        StructField("cnt", LongType()),
    ]
)

# Log-score assigned to a character absent from the vocabulary at
# encode time (training seeds every seen char, so this only fires on
# apply-time novelty). Harshly negative: unknowns never beat a real
# piece, but segmentation still always exists.
UNK_SCORE = -100.0


def _words(text: str) -> list[str]:
    return [w for w in (text or "").lower().split(" ") if w]


def viterbi_segment(
    word: str,
    scores: dict[str, float],
    max_piece_len: int,
    cache: dict[str, list[str]] | None = None,
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs ``scores``.

    dp over end positions; candidate pieces are the vocab substrings
    ending there (plus the single char as UNK fallback). Equal-score
    ties keep the SMALLEST split point — the longer final piece — so
    the result is deterministic.
    """
    if cache is not None and word in cache:
        return cache[word]
    n = len(word)
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[int] = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            s = scores.get(piece)
            if s is None:
                if i - j > 1:
                    continue
                s = UNK_SCORE
            cand = best[j] + s
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    if cache is not None:
        cache[word] = out
    return out


def _sum_piece_counts(partials: DataFrame) -> list[tuple[str, int]]:
    rows = partials.groupBy("piece").agg(F.sum("cnt").alias("cnt")).collect()
    return [(r.piece, r.cnt) for r in rows]


def seed_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_size: int = 512,
    min_count: int = 2,
) -> list[tuple[str, int]]:
    """Over-complete seed: the ``seed_size`` most frequent substrings
    (length <= max_piece_len) plus every single character seen."""
    texts = df.select(F.col(text_col).alias("text"))

    def count_subs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        word_subs: dict[str, dict[str, int]] = {}
        for pdf in batches:
            for text in pdf["text"].fillna(""):
                for w in _words(text):
                    subs = word_subs.get(w)
                    if subs is None:
                        subs = {}
                        for i in range(len(w)):
                            for l in range(1, max_piece_len + 1):
                                if i + l > len(w):
                                    break
                                p = w[i : i + l]
                                subs[p] = subs.get(p, 0) + 1
                        word_subs[w] = subs
                    for p, c in subs.items():
                        counts[p] = counts.get(p, 0) + c
        if counts:
            yield pd.DataFrame(
                {"piece": list(counts), "cnt": list(counts.values())}
            )

    summed = _sum_piece_counts(texts.mapInPandas(count_subs, PIECE_COUNT_SCHEMA))
    chars = [(p, c) for p, c in summed if len(p) == 1]
    multi = [
        (p, c) for p, c in summed if len(p) > 1 and c >= min_count
    ]
    multi.sort(key=lambda t: (-t[1], t[0]))
    return chars + multi[: max(0, seed_size - len(chars))]


def _scores_from_counts(counts: list[tuple[str, int]]) -> dict[str, float]:
    total = sum(c for _, c in counts)
    return {p: math.log(c / total) for p, c in counts if c > 0}


def unigram_train(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    n_iters: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 512,
    min_count: int = 2,
) -> list[tuple[str, int]]:
    """Learn a unigram-LM vocabulary: seed -> ``n_iters`` Viterbi-EM
    rounds -> count-ranked prune to ``vocab_size`` (single characters
    are never pruned). Returns (piece, final_count) sorted by
    (count desc, piece) — a deterministic, partition-invariant table."""
    from .bpe import materialized_training_corpus

    # One materialization serves the seed pass + every EM round
    # (round 15; see materialized_training_corpus for the rationale).
    texts = materialized_training_corpus(
        df.select(F.col(text_col).alias("text"))
    )
    counts = seed_vocab(
        texts, "text", max_piece_len=max_piece_len,
        seed_size=seed_size, min_count=min_count,
    )

    for _ in range(n_iters):
        scores = _scores_from_counts(counts)
        chars = {p for p, _ in counts if len(p) == 1}

        def estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            out: dict[str, int] = {}
            cache: dict[str, list[str]] = {}
            for pdf in batches:
                for text in pdf["text"].fillna(""):
                    for w in _words(text):
                        for piece in viterbi_segment(
                            w, scores, max_piece_len, cache
                        ):
                            out[piece] = out.get(piece, 0) + 1
            if out:
                yield pd.DataFrame(
                    {"piece": list(out), "cnt": list(out.values())}
                )

        won = dict(
            _sum_piece_counts(texts.mapInPandas(estep, PIECE_COUNT_SCHEMA))
        )
        # M-step: survivors = pieces that won tokens; chars immortal
        # (count 0 chars keep a floor count of 1 so log stays finite).
        counts = [
            (p, won.get(p, 1 if p in chars else 0))
            for p, _ in counts
            if won.get(p, 0) > 0 or p in chars
        ]
        counts.sort(key=lambda t: (-t[1], t[0]))

    chars = [(p, c) for p, c in counts if len(p) == 1]
    multi = [(p, c) for p, c in counts if len(p) > 1]
    multi.sort(key=lambda t: (-t[1], t[0]))
    final = chars + multi[: max(0, vocab_size - len(chars))]
    final.sort(key=lambda t: (-t[1], t[0]))
    return final


def unigram_encode_stats(
    df: DataFrame,
    vocab: list[tuple[str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Per-doc unigram tokenization stats: token count, distinct pieces,
    md5 digest of the full segmentation (pipe-joined) — the same shape
    as ``bpe_encode_stats`` so either tokenizer slots into the packing /
    chunking / cost-accounting paths."""
    import hashlib

    scores = _scores_from_counts(vocab)
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("n_distinct_pieces", LongType()),
            StructField("seg_digest", StringType()),
        ]
    )
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"].fillna("")):
                toks: list[str] = []
                for w in _words(text):
                    toks.extend(viterbi_segment(w, scores, max_piece_len, cache))
                digest = hashlib.md5("|".join(toks).encode()).hexdigest()
                rows.append((int(doc_id), len(toks), len(set(toks)), digest))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return cols.mapInPandas(run, out_schema)
