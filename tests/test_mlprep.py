"""Unit/property tests for the training-data prep operators
(`operators/mlprep.py`, `operators/components.py`)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from glamira_batch_processing_spark.operators.components import connected_components
from glamira_batch_processing_spark.operators.mlprep import (
    PII_PATTERNS,
    chunk_token_windows,
    hash_split,
    pack_sequences,
    redact_pii,
    stratified_sample,
)

# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------


def test_hash_split_partition_invariant(spark):
    """The assignment must not depend on physical layout."""
    d = spark.range(0, 2000).select(F.col("id"))
    a = hash_split(d, F.col("id"), {"train": 90, "val": 5, "test": 5})
    b = hash_split(
        d.repartition(7), F.col("id"), {"train": 90, "val": 5, "test": 5}
    )
    am = {r["id"]: r["split"] for r in a.collect()}
    bm = {r["id"]: r["split"] for r in b.collect()}
    assert am == bm


def test_hash_split_subset_invariant(spark):
    """Growing/shrinking the corpus never moves an existing row's split."""
    d = spark.range(0, 2000)
    full = {
        r["id"]: r["split"]
        for r in hash_split(d, F.col("id"), {"train": 80, "test": 20}).collect()
    }
    sub = {
        r["id"]: r["split"]
        for r in hash_split(
            d.filter(F.col("id") % 3 == 0), F.col("id"), {"train": 80, "test": 20}
        ).collect()
    }
    for k, v in sub.items():
        assert full[k] == v


def test_hash_split_proportions_and_totality(spark):
    d = spark.range(0, 20000)
    counts = dict(
        hash_split(d, F.col("id"), {"train": 90, "val": 5, "test": 5})
        .groupBy("split")
        .count()
        .collect()
    )
    assert sum(counts.values()) == 20000  # every row assigned
    assert 0.85 < counts["train"] / 20000 < 0.95
    assert 0.02 < counts["val"] / 20000 < 0.08


def test_hash_split_rejects_bad_percentages(spark):
    with pytest.raises(ValueError):
        hash_split(spark.range(1), F.col("id"), {"a": 50, "b": 40})


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_rates_and_determinism(spark):
    d = spark.range(0, 10000).select(
        "id", (F.when(F.col("id") % 2 == 0, "en").otherwise("de")).alias("lang")
    )
    s1 = stratified_sample(d, F.col("id"), F.col("lang"), {"en": 0.5}, 0.1)
    s2 = stratified_sample(d, F.col("id"), F.col("lang"), {"en": 0.5}, 0.1)
    assert sorted(r["id"] for r in s1.collect()) == sorted(
        r["id"] for r in s2.collect()
    )
    rates = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.45 < rates["en"] / 5000 < 0.55
    assert 0.07 < rates["de"] / 5000 < 0.13


# ---------------------------------------------------------------------------
# redact_pii
# ---------------------------------------------------------------------------


def test_redact_pii_removes_all_matches(spark):
    rows = [
        (1, "mail a.b-c_d@sub.example.org and 192.168.0.1 call 415-555-0199 end"),
        (2, "no pii here at all"),
        (3, "two mails x@y.io z@w.ai one ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in redact_pii(df, "text").collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0
    assert out[2]["text_redacted"] == "no pii here at all"
    assert out[3]["n_email"] == 2 and out[3]["n_ipv4"] == 1
    for r in out.values():
        for pat in PII_PATTERNS.values():
            assert not re.search(pat, r["text_redacted"])
    assert "<EMAIL>" in out[1]["text_redacted"]
    assert "<IPV4>" in out[1]["text_redacted"]
    assert "<PHONE>" in out[1]["text_redacted"]


# ---------------------------------------------------------------------------
# chunk_token_windows
# ---------------------------------------------------------------------------


def test_chunks_cover_document_exactly(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    ch = chunk_token_windows(df, "text", ["id"], window=32, stride=24).collect()
    # stride coverage: chunk i holds tokens [24i, 24i+32)
    assert [c["chunk_idx"] for c in ch] == list(range(4))
    toks = text.split(" ")
    for c in ch:
        start = c["chunk_idx"] * 24
        assert c["chunk_text"] == " ".join(toks[start : start + 32])
        assert c["n_tokens"] == len(toks[start : start + 32])
    # every token index covered by at least one chunk
    covered = set()
    for c in ch:
        covered.update(range(c["chunk_idx"] * 24, c["chunk_idx"] * 24 + c["n_tokens"]))
    assert covered == set(range(100))


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], ["id", "text"])
    ch = chunk_token_windows(df, "text", ["id"], window=32, stride=24).collect()
    assert len(ch) == 1
    assert ch[0]["chunk_text"] == "a b c" and ch[0]["n_tokens"] == 3


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_budget_overflow_bound(spark):
    d = spark.range(0, 500).select(
        "id",
        F.lit("s").alias("stream"),
        ((F.col("id") * 37) % 100 + 1).alias("n_tokens"),
    )
    packed = pack_sequences(d, "stream", "id", "n_tokens", budget=256)
    agg = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx")
    )
    for r in agg.collect():
        # a pack exceeds the budget only by (part of) its straddler doc
        assert r["tot"] - r["mx"] < 256
    # pack ids are dense from 0
    ids = sorted(r["pack_id"] for r in agg.collect())
    assert ids[0] == 0 and ids == list(range(len(ids)))


# ---------------------------------------------------------------------------
# connected_components
# ---------------------------------------------------------------------------


def _cc_reference(edges):
    """Driver-side union-find for verification."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label canonical form
    out = {}
    for n in list(parent):
        r = find(n)
        out.setdefault(r, set()).add(n)
    labels = {}
    for members in out.values():
        m = min(members)
        for n in members:
            labels[n] = m
    return labels


def test_cc_chain_and_islands(spark):
    # chain 1-2-3-4, island 10-11, self-contained pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _cc_reference(edges)


def test_cc_pseudorandom_graph_matches_union_find(spark):
    # deterministic pseudo-random graph: 120 nodes, multiplicative hops
    edges = [((i * 7) % 120, (i * 13 + 5) % 120) for i in range(80) if (i * 7) % 120 != (i * 13 + 5) % 120]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _cc_reference(edges)


def test_cc_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1)


def test_cc_pathological_path_graph_converges_logarithmically(spark):
    """Round-2 verdict ask #6: a path graph is the adversarial-diameter
    case for plain min-label propagation (rounds = diameter). The
    pointer-jump makes remaining chain length halve per round, so a
    300-edge path must close well within the default 20-round budget."""
    n = 300
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(8)
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_datapipe_e2e_fast_matches_md5_variant(spark):
    """The xxhash64 flagship path tracks the oracle-checked md5 path to
    within LSH borderline recall: same schema, same (split, lang) keys,
    and doc counts within a couple of docs per bucket (each diverging
    borderline candidate pair — see test_lsh_fast_parity — shifts at
    most one doc in or out of the dedup survivor set). Exact equality
    would over-claim: hash families legitimately differ on borderline
    pairs."""
    from glamira_batch_processing_spark.plans.mlprep_queries import (
        datapipe_e2e,
        datapipe_e2e_fast,
    )

    from tests.conftest import SF_SMALL

    md5_df = datapipe_e2e(spark, SF_SMALL)
    fast_df = datapipe_e2e_fast(spark, SF_SMALL)
    assert md5_df.schema == fast_df.schema
    md5_out = {(r.split, r.lang): r for r in md5_df.collect()}
    fast_out = {(r.split, r.lang): r for r in fast_df.collect()}
    assert md5_out
    assert md5_out.keys() == fast_out.keys()
    for key, a in md5_out.items():
        b = fast_out[key]
        assert abs(a.n_docs - b.n_docs) <= 2, (key, a, b)
    total_a = sum(r.n_docs for r in md5_out.values())
    total_b = sum(r.n_docs for r in fast_out.values())
    assert abs(total_a - total_b) <= 2


def test_weighted_sample_exact_k_partition_invariant_and_monotone(spark):
    """A-ES weighted sampling: exactly k rows; identical sample under
    any partitioning; a row with overwhelming weight is always drawn;
    non-positive/NULL weights are never drawn."""
    from glamira_batch_processing_spark.operators.mlprep import weighted_sample
    from pyspark.sql import functions as F

    rows = [(i, float(1 + (i % 5))) for i in range(500)]
    rows += [(1000, 1e9), (1001, 0.0), (1002, -3.0), (1003, None)]
    df = spark.createDataFrame(rows, "id long, w double")
    kw = dict(key=F.col("id"), weight=F.col("w"), k=50, tiebreak=F.col("id"))
    a = {r.id for r in weighted_sample(df, **kw).collect()}
    b = {r.id for r in weighted_sample(df.repartition(13), **kw).collect()}
    assert len(a) == 50
    assert a == b
    assert 1000 in a  # 1e9 weight -> es key ~0, always selected
    assert not {1001, 1002, 1003} & a
    # changing the salt changes the draw (it is really hash-driven)
    c = {r.id for r in weighted_sample(df, **kw, salt="other").collect()}
    assert c != a


def test_weighted_sample_plans_take_ordered(spark):
    """The weighted sample must be a per-partition top-k + k-row merge
    (TakeOrderedAndProject), never a global Exchange+Sort."""
    import __spark_entry__  # noqa: F401
    from glamira_batch_processing_spark.plans.registry import QUERIES
    from tests.conftest import SF_SMALL

    df = QUERIES["sample_weighted_by_length"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_drift_split_lang_chi2_below_critical(spark):
    """The hash split must preserve the language mix: total chi-square
    over the (split, lang) cells stays under the 0.001 critical value
    for (3-1)*(5-1)=8 degrees of freedom (26.12)."""
    import __spark_entry__  # noqa: F401  (populates the registry)
    from glamira_batch_processing_spark.plans.registry import QUERIES
    from tests.conftest import SF_SMALL

    cells = QUERIES["drift_split_lang_cells"](spark, SF_SMALL).collect()
    assert len(cells) >= 8
    chi2 = sum(r.chi2_contribution for r in cells)
    assert chi2 < 26.12, f"split skewed the language mix: chi2={chi2}"


# ---------------------------------------------------------------------------
# split_leakage_safe: cluster-atomic split assignment.
# ---------------------------------------------------------------------------


def test_split_leakage_safe_clusters_never_straddle(spark):
    """The hazard is real on this corpus: a NAIVE per-doc hash split
    places members of at least one near-dup cluster in different
    splits (train/eval contamination). The cluster-keyed split places
    every cluster entirely inside one split, while singletons keep the
    exact assignment the naive split gives them (same salt, same key
    value), so going leakage-safe re-buckets only duplicate docs."""
    from glamira_batch_processing_spark.operators.dedup import lsh_candidate_pairs
    from glamira_batch_processing_spark.operators.mlprep import hash_split
    from glamira_batch_processing_spark.plans.datapipe_queries import corpus
    from tests.conftest import SF_SMALL

    c = corpus(spark, SF_SMALL)
    pairs = lsh_candidate_pairs(c, num_hashes=12, band_rows=3)
    comp = connected_components(pairs, "doc_a", "doc_b")
    splits = {"train": 90, "val": 5, "test": 5}

    naive = hash_split(c, F.col("doc_id"), splits, salt="split-v1")
    straddle_naive = (
        naive.join(comp, naive["doc_id"] == comp["node"])
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddle_naive >= 1  # the leakage the operator exists to stop

    keyed = c.join(comp, c["doc_id"] == comp["node"], "left").select(
        c["doc_id"],
        F.coalesce(comp["component"], c["doc_id"]).alias("split_key"),
    )
    safe = hash_split(keyed, F.col("split_key"), splits, salt="split-v1")
    straddle_safe = (
        safe.join(comp, safe["doc_id"] == comp["node"])
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddle_safe == 0

    # singletons (no cluster membership) keep their naive assignment
    singles_changed = (
        naive.select("doc_id", F.col("split").alias("naive_split"))
        .join(safe.select("doc_id", "split"), "doc_id")
        .join(comp, naive["doc_id"] == comp["node"], "left_anti")
        .filter(F.col("naive_split") != F.col("split"))
        .count()
    )
    assert singles_changed == 0


# ---------------------------------------------------------------------------
# Token-budget selection: two-phase form vs the naive greedy prefix
# ---------------------------------------------------------------------------


def _naive_budget_prefix(rows, budget):
    """Greedy prefix by (score DESC, doc_id ASC) with cumsum <= budget."""
    out, run = [], 0
    for doc_id, score, tok in sorted(rows, key=lambda r: (-r[1], r[0])):
        if run + tok > budget:
            break
        run += tok
        out.append((doc_id, score, tok))
    return sorted(out)


def _two_phase(spark, rows, budget, bucket_w=20_000):
    from glamira_batch_processing_spark.plans.mlprep_queries import (
        budget_select_two_phase,
    )

    df = spark.createDataFrame(
        rows, "doc_id long, score_ppm long, n_tokens long"
    )
    got = budget_select_two_phase(df, budget, bucket_w)
    return sorted(
        (r.doc_id, r.score_ppm, r.n_tokens) for r in got.collect()
    )


def test_budget_select_matches_naive_prefix_edges(spark):
    """The two-phase bucket form must equal the naive global prefix on
    the shapes that break sloppy rewrites: an exact-boundary remainder
    (better buckets consume the whole budget -> boundary prefix must be
    EMPTY), score ties straddling the within-bucket tie-break, and a
    boundary doc whose tokens overflow mid-bucket."""
    rows = [
        # bucket 2 (scores 40000..44000): 3 docs, 10 tokens total
        (1, 44000, 4), (2, 42000, 3), (3, 40000, 3),
        # bucket 1 (scores 20000..30000): ties on score -> doc_id order
        (4, 30000, 5), (5, 30000, 5), (6, 20000, 7),
        # bucket 0
        (7, 1000, 2),
    ]
    # exact boundary: budget == bucket-2 total -> bucket 1 prefix empty
    assert _two_phase(spark, rows, 10) == _naive_budget_prefix(rows, 10)
    # mid-bucket overflow with a score tie: selects doc 4, skips 5
    assert _two_phase(spark, rows, 16) == _naive_budget_prefix(rows, 16)
    # stop mid-way into the tie pair's second member
    assert _two_phase(spark, rows, 20) == _naive_budget_prefix(rows, 20)
    # everything fits
    assert _two_phase(spark, rows, 1000) == _naive_budget_prefix(rows, 1000)
    assert len(_two_phase(spark, rows, 1000)) == len(rows)
    # budget smaller than the single best doc -> empty selection
    assert _two_phase(spark, rows, 3) == []


def test_budget_select_randomized_vs_naive(spark):
    """Randomized cross-check (fixed seed): arbitrary score/token mixes
    across many buckets must match the naive prefix exactly."""
    import random

    rng = random.Random(12)
    rows = [
        (i, rng.randrange(0, 200_000), rng.randrange(1, 50))
        for i in range(200)
    ]
    for budget in (0, 37, 500, 2_000, 10**6):
        assert _two_phase(spark, rows, budget) == _naive_budget_prefix(
            rows, budget
        ), budget


def test_shard_balance_two_phase_rank_equals_naive_global_window(spark):
    """ADVICE r14: the scale-safe two-phase rank (histogram offsets +
    per-token-count partitioned window) must equal the naive
    unpartitioned row_number over (n_tokens DESC, doc_id) — on a frame
    with HEAVY token-count ties, where an offset or tie-break bug would
    shuffle docs between shards."""
    from pyspark.sql import Window

    from glamira_batch_processing_spark.plans.mlprep_queries import (
        ranked_round_robin_shards,
    )

    # 60 docs over only 4 distinct token counts (15-way ties), ids
    # deliberately interleaved so rank order != id order.
    rows = [((i * 7) % 60 + 100, (i % 4 + 1) * 10) for i in range(60)]
    t = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    n_shards = 8
    naive_rank = F.row_number().over(
        Window.orderBy(F.desc("n_tokens"), "doc_id")
    )
    naive = (
        t.withColumn("shard", ((naive_rank - 1) % n_shards).cast("long"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("shard_tokens"),
            F.max("n_tokens").cast("long").alias("max_doc_tokens"),
        )
    )
    got = {
        r.shard: (r.n_docs, r.shard_tokens, r.max_doc_tokens)
        for r in ranked_round_robin_shards(t, n_shards).collect()
    }
    want = {
        r.shard: (r.n_docs, r.shard_tokens, r.max_doc_tokens)
        for r in naive.collect()
    }
    assert got == want


def test_shard_balance_imbalance_bounded_by_one_doc(spark):
    """Longest-first round-robin dealing: max(shard_tokens) -
    min(shard_tokens) <= the largest document's token count, at every
    test scale — the property that makes the dealt shards stragglerless
    at the training step level."""
    import __spark_entry__ as contract

    qs = contract.queries()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = qs["shard_balance_tokens"](spark, sf).collect()
        assert len(rows) == 8
        assert {r.shard for r in rows} == set(range(8))
        totals = [r.shard_tokens for r in rows]
        biggest_doc = max(r.max_doc_tokens for r in rows)
        assert max(totals) - min(totals) <= biggest_doc, (
            sf,
            max(totals) - min(totals),
            biggest_doc,
        )
