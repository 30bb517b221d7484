"""Generate digest-pinned EXPECTED tables for the two tokenizer
contract queries (VERDICT r8 ask #8).

``bpe_encode_stats`` and ``unigram_encode_stats`` have no SQL form (an
iterative merge loop / Viterbi-EM trainer), so they were rows-only in
the driver gate. This script converts them to externally checkable
rows: it computes the per-doc expected stats with the PYTEST-PROVEN
pure-Python twins — ``encode_text`` (hand-computed segmentations,
cache parity, partition invariance all pinned in tests) and a
single-process reimplementation of the unigram trainer's count loops
(reusing the pure ``viterbi_segment``/``_scores_from_counts``;
partition invariance of the distributed counts is pytest-proven, so
the single-process counts are the same exact integers) — entirely
WITHOUT Spark, and commits them as seed parquet keyed by a corpus
content fingerprint ``corpus_sig = SUM((doc_id + 1) * LENGTH(text))``
(not a bare row count — the weighted sum also moves when any text
changes length or docs are reordered/renumbered, so a refreshed corpus
with a coincidentally equal row count cannot silently match a stale
slice). The oracle SQL in ``plans/hygiene_queries.py`` selects the
slice matching the same fingerprint computed over ``documents``, and
the driver's value-hash compares Spark's distributed output against
this independent single-process computation.

Regenerate after any testdata refresh:
    python scripts/gen_tokenizer_expected.py
A pytest (tests/test_hygiene.py) regenerates the sf0.001 slice
in-memory and asserts it matches the committed file, so staleness is
caught locally before the driver sees it.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glamira_batch_processing_spark.operators.bpe import encode_text
from glamira_batch_processing_spark.operators.unigram import (
    _scores_from_counts,
    _words,
    viterbi_segment,
)

SEEDS = Path(__file__).resolve().parent.parent / (
    "glamira_batch_processing_spark/seeds"
)
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
# The 10x scaled corpus is DETERMINISTIC (key-shifted replicas with a
# deterministic word mutation — make_scaled_sf.py), so its slice is
# stable across .scale rebuilds and makes the full driver_sim battery
# oracle-checkable at sf1 too (round 11; pyarrow reads the Spark part
# -file directory and skips _SUCCESS). Generated only when present.
_SCALE_SF1 = Path(__file__).resolve().parent.parent / ".scale/sf1"
if (_SCALE_SF1 / "documents.parquet").exists():
    SF_DIRS.append(str(_SCALE_SF1))


def py_unigram_train(
    texts: list[str],
    vocab_size: int,
    n_iters: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 256,
    min_count: int = 2,
) -> list[tuple[str, int]]:
    """Single-process twin of ``operators/unigram.py::unigram_train``:
    the same seed -> Viterbi-EM -> prune algebra with plain dict loops
    where Spark sums partial counts (exact integers either way)."""
    # seed: substring counts per word OCCURRENCE
    word_subs: dict[str, dict[str, int]] = {}
    counts_d: dict[str, int] = {}
    for text in texts:
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
                counts_d[p] = counts_d.get(p, 0) + c
    summed = list(counts_d.items())
    chars_l = [(p, c) for p, c in summed if len(p) == 1]
    multi = [(p, c) for p, c in summed if len(p) > 1 and c >= min_count]
    multi.sort(key=lambda t: (-t[1], t[0]))
    counts = chars_l + multi[: max(0, seed_size - len(chars_l))]

    for _ in range(n_iters):
        scores = _scores_from_counts(counts)
        chars = {p for p, _ in counts if len(p) == 1}
        won: dict[str, int] = {}
        cache: dict[str, list[str]] = {}
        for text in texts:
            for w in _words(text):
                for piece in viterbi_segment(w, scores, max_piece_len, cache):
                    won[piece] = won.get(piece, 0) + 1
        counts = [
            (p, won.get(p, 1 if p in chars else 0))
            for p, _ in counts
            if won.get(p, 0) > 0 or p in chars
        ]
        counts.sort(key=lambda t: (-t[1], t[0]))

    chars_l = [(p, c) for p, c in counts if len(p) == 1]
    multi = [(p, c) for p, c in counts if len(p) > 1]
    multi.sort(key=lambda t: (-t[1], t[0]))
    final = chars_l + multi[: max(0, vocab_size - len(chars_l))]
    final.sort(key=lambda t: (-t[1], t[0]))
    return final


def py_bpe_train(
    texts: list[str], n_merges: int = 8, min_count: int = 2
) -> list[tuple[str, str]]:
    """Single-process twin of ``operators/bpe.py::bpe_train``: the same
    round loop (re-encode with merges-so-far, count adjacent pairs,
    take the (count desc, a, b) argmax) with plain dict sums where
    Spark sums Arrow-batch partials — exact integers either way."""
    from glamira_batch_processing_spark.operators.bpe import _encode_with

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        ranks = {p: i for i, p in enumerate(merges)}
        counts: dict[tuple[str, str], int] = {}
        cache: dict[str, list[str]] = {}
        for text in texts:
            for w in (text or "").lower().split(" "):
                if not w:
                    continue
                seq = _encode_with(w, merges, ranks, cache)
                for i in range(len(seq) - 1):
                    p = (seq[i], seq[i + 1])
                    counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_count:
            break
        merges.append((a, b))
    return merges


def corpus_sig(doc_ids: list[int], texts: list[str]) -> int:
    """Corpus fingerprint computable identically in DuckDB SQL:
    SUM((doc_id + 1) * LENGTH(text)). Disambiguates corpora that share
    a row count (sf0.001 and sf0.01 both carry 500 docs with entirely
    different texts). SQL SUM skips NULLs; so does this."""
    return sum(
        (d + 1) * len(t) for d, t in zip(doc_ids, texts) if t is not None
    )


def expected_for_corpus(
    doc_ids: list[int], texts: list[str]
) -> tuple[list[tuple], list[tuple]]:
    """(bpe_rows, unigram_rows) for one corpus; row shapes match the
    operators' output schemas exactly."""
    n = corpus_sig(doc_ids, texts)
    # Normalize NULLs once, up front, so the trainer and both encode
    # loops see exactly what the Spark twins' fillna("") path sees —
    # py_unigram_train's inner _words() has no None guard of its own.
    texts = [t or "" for t in texts]
    bpe_rows = []
    cache: dict[str, list[str]] = {}
    for doc_id, text in zip(doc_ids, texts):
        toks = encode_text(text, cache)
        bpe_rows.append(
            (
                n,
                doc_id,
                len([w for w in text.lower().split(" ") if w]),
                len(toks),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
            )
        )
    # mirror plans/hygiene_queries.py::unigram_encode_stats_query params
    vocab = py_unigram_train(
        texts, vocab_size=48, n_iters=2, max_piece_len=4, seed_size=256
    )
    scores = _scores_from_counts(vocab)
    uni_rows = []
    vcache: dict[str, list[str]] = {}
    for doc_id, text in zip(doc_ids, texts):
        toks: list[str] = []
        for w in _words(text or ""):
            toks.extend(viterbi_segment(w, scores, 4, vcache))
        uni_rows.append(
            (
                n,
                doc_id,
                len(toks),
                len(set(toks)),
                hashlib.md5("|".join(toks).encode()).hexdigest(),
            )
        )
    return bpe_rows, uni_rows


def train_expected_for_corpus(
    doc_ids: list[int], texts: list[str]
) -> tuple[list[tuple], list[tuple]]:
    """(bpe_train_rows, unigram_train_rows) for one corpus — the
    round-13 TRAIN seed tables: the learned merge table / vocabulary
    computed by the pure-Python twins, keyed like the encode seeds."""
    n = corpus_sig(doc_ids, texts)
    texts = [t or "" for t in texts]
    merges = py_bpe_train(texts, n_merges=8, min_count=2)
    bpe_rows = [(n, i, a, b) for i, (a, b) in enumerate(merges)]
    vocab = py_unigram_train(
        texts, vocab_size=48, n_iters=2, max_piece_len=4, seed_size=256
    )
    uni_rows = [(n, i, p, c) for i, (p, c) in enumerate(vocab)]
    return bpe_rows, uni_rows


def main() -> None:
    all_bpe, all_uni = [], []
    all_bpe_train, all_uni_train = [], []
    for sf in SF_DIRS:
        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        doc_ids = [int(v) for v in t["doc_id"].to_pylist()]
        texts = t["text"].to_pylist()
        bpe_rows, uni_rows = expected_for_corpus(doc_ids, texts)
        all_bpe.extend(bpe_rows)
        all_uni.extend(uni_rows)
        bt_rows, ut_rows = train_expected_for_corpus(doc_ids, texts)
        all_bpe_train.extend(bt_rows)
        all_uni_train.extend(ut_rows)
        print(f"{sf}: {len(doc_ids)} docs")

    pq.write_table(
        pa.table(
            {
                "corpus_sig": pa.array([r[0] for r in all_bpe], pa.int64()),
                "doc_id": pa.array([r[1] for r in all_bpe], pa.int64()),
                "n_words": pa.array([r[2] for r in all_bpe], pa.int32()),
                "n_tokens": pa.array([r[3] for r in all_bpe], pa.int32()),
                "tokens_md5": pa.array([r[4] for r in all_bpe], pa.string()),
            }
        ),
        SEEDS / "bpe_expected.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "corpus_sig": pa.array([r[0] for r in all_uni], pa.int64()),
                "doc_id": pa.array([r[1] for r in all_uni], pa.int64()),
                "n_tokens": pa.array([r[2] for r in all_uni], pa.int64()),
                "n_distinct_pieces": pa.array([r[3] for r in all_uni], pa.int64()),
                "seg_digest": pa.array([r[4] for r in all_uni], pa.string()),
            }
        ),
        SEEDS / "unigram_expected.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "corpus_sig": pa.array(
                    [r[0] for r in all_bpe_train], pa.int64()
                ),
                "rank": pa.array([r[1] for r in all_bpe_train], pa.int32()),
                "a": pa.array([r[2] for r in all_bpe_train], pa.string()),
                "b": pa.array([r[3] for r in all_bpe_train], pa.string()),
            }
        ),
        SEEDS / "bpe_train_expected.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "corpus_sig": pa.array(
                    [r[0] for r in all_uni_train], pa.int64()
                ),
                "rank": pa.array([r[1] for r in all_uni_train], pa.int32()),
                "piece": pa.array([r[2] for r in all_uni_train], pa.string()),
                "count": pa.array([r[3] for r in all_uni_train], pa.int64()),
            }
        ),
        SEEDS / "unigram_train_expected.parquet",
    )
    print(
        f"wrote {SEEDS}/bpe_expected.parquet, unigram_expected.parquet, "
        f"bpe_train_expected.parquet, unigram_train_expected.parquet"
    )


if __name__ == "__main__":
    main()
