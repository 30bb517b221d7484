"""Scale the driver's sf0.1 TESTDATA by an integer factor (default 10x
-> "sf1") for scale-evidence runs. Output goes under the repo
(.scale/sf1/), never into the read-only /root/testdata.

Usage: python scripts/make_scaled_sf.py [factor] [out_dir]

Design: each fact table is unioned from ``factor`` key-shifted replicas
so every FK relationship is preserved inside each replica (offsets are
exact per-table key-domain sizes read from the data). Dimensions
(region/nation/supplier/part) are NOT scaled — that is exactly the
warehouse shape at 100 TB (facts grow, dims don't).

Two columns need more than a key shift:
- ``documents.text``: replica copies must NOT be near-duplicates of the
  original, or the dedup workload grows quadratically in the factor
  (every doc would LSH-pair with its replicas) instead of linearly. We
  append a per-replica alphabetic suffix to every word that is not a
  known stopword: all 3-gram shingles containing a content word become
  replica-unique (cross-replica Jaccard ~0), while stopword counts,
  language-id, and the quality gate see the same distribution, so
  per-replica dedup structure is an exact mirror of the original.
- ``embeddings.embedding``: rotated by ``replica`` positions — norms
  and pairwise in-replica geometry are preserved, cross-replica
  vectors decorrelate, so ANN candidate structure scales linearly.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"
DIMS = ("region", "nation", "supplier", "part")


def _replicate(df: DataFrame, factor: int, shifts: dict[str, int]) -> DataFrame:
    out = None
    for r in range(factor):
        rep = df
        for col, domain in shifts.items():
            rep = rep.withColumn(col, F.col(col) + F.lit(r * domain))
        rep = rep.withColumn("__r", F.lit(r))
        out = rep if out is None else out.unionByName(rep)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(".scale/sf1")
    out_dir.mkdir(parents=True, exist_ok=True)

    from glamira_batch_processing_spark import get_spark
    from glamira_batch_processing_spark.operators.text import LANG_STOPWORDS

    spark = get_spark("make-scaled-sf")
    t = {n: spark.read.parquet(f"{SRC}/{n}.parquet") for n in (
        "customer", "orders", "lineitem", "events", "documents", "embeddings", *DIMS
    )}

    # Exact key-domain sizes so shifted replicas can never collide.
    n_cust = t["customer"].agg(F.max("c_custkey")).first()[0] + 1
    n_ord = t["orders"].agg(F.max("o_orderkey")).first()[0] + 1
    n_evt = t["events"].agg(F.max("event_id")).first()[0] + 1
    n_usr = t["events"].agg(F.max("user_id")).first()[0] + 1
    n_doc = t["documents"].agg(F.max("doc_id")).first()[0] + 1
    n_vec = t["embeddings"].agg(F.max("vec_id")).first()[0] + 1
    dim = len(t["embeddings"].first()["embedding"])

    for name in DIMS:
        t[name].write.mode("overwrite").parquet(str(out_dir / f"{name}.parquet"))

    _replicate(t["customer"], factor, {"c_custkey": n_cust}).drop("__r").write.mode(
        "overwrite"
    ).parquet(str(out_dir / "customer.parquet"))
    _replicate(
        t["orders"], factor, {"o_orderkey": n_ord, "o_custkey": n_cust}
    ).drop("__r").write.mode("overwrite").parquet(str(out_dir / "orders.parquet"))
    _replicate(t["lineitem"], factor, {"l_orderkey": n_ord}).drop("__r").write.mode(
        "overwrite"
    ).parquet(str(out_dir / "lineitem.parquet"))
    _replicate(
        t["events"], factor, {"event_id": n_evt, "user_id": n_usr}
    ).drop("__r").write.mode("overwrite").parquet(str(out_dir / "events.parquet"))

    stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    docs = _replicate(t["documents"], factor, {"doc_id": n_doc})
    suffix = F.concat(F.lit("xq"), F.char(F.lit(97) + F.col("__r")))
    mutated = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.when(
                (F.col("__r") == 0) | w.isin(stop), w
            ).otherwise(F.concat(w, suffix)),
        ),
        " ",
    )
    docs.withColumn("text", mutated).withColumn(
        "n_chars", F.length("text")
    ).drop("__r").write.mode("overwrite").parquet(str(out_dir / "documents.parquet"))

    vecs = _replicate(t["embeddings"], factor, {"vec_id": n_vec})
    # rotate by replica mod dim (factor may exceed the vector dim; a
    # rotation by r and r+dim are the same permutation anyway)
    rot = F.col("__r") % F.lit(dim)
    rotated = F.when(rot == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(F.col("embedding"), rot + 1, F.lit(dim) - rot),
            F.slice(F.col("embedding"), 1, rot),
        )
    )
    vecs.withColumn("embedding", rotated).drop("__r").write.mode(
        "overwrite"
    ).parquet(str(out_dir / "embeddings.parquet"))

    for name in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        n = spark.read.parquet(str(out_dir / f"{name}.parquet")).count()
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
