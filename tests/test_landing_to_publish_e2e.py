"""End-to-end landing-zone -> audited-publish integration.

Composes the round's pieces into the full ingestion story a real
deployment runs: exporter JSONL chunks land -> the custom streaming
DataSource ingests them with checkpointed resume -> batches MERGE
into a raw VersionedTable (idempotent txn ids) -> a curation job
applies the quality gate and exact dedup -> write-audit-publish flips
the curated snapshot ONLY when the audit passes. Restart safety and
failed-audit isolation are asserted along the way."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from glamira_batch_processing_spark.operators.dedup import content_key
from glamira_batch_processing_spark.operators.text import quality_score
from glamira_batch_processing_spark.sources.chunked_source import (
    ChunkedExportDataSource,
)
from glamira_batch_processing_spark.sources.versioned import VersionedTable

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "sleeps in the warm sun for a while before dinner"
)
JUNK = "zzzzz 0000 !!!! ~~~~ %%%% @@@@ ###"


def _chunk(src, idx, rows):
    with open(f"{src}/chunk_{idx:05d}.jsonl", "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _ingest(spark, src, raw: VersionedTable, ckpt):
    """Stream unseen chunks; each micro-batch MERGEs into the raw
    table with the batch id as the idempotence token."""
    spark.dataSource.register(ChunkedExportDataSource)

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if raw.latest_version() is None:
            raw.create(batch_df)
        else:
            raw.merge(
                batch_df.sparkSession,
                batch_df,
                keys=["doc_id"],
                txn_id=f"ingest-{batch_id}",
            )

    q = (
        spark.readStream.format("chunked_export")
        .schema("doc_id long, text string")
        .option("path", src)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _curate(spark, raw: VersionedTable, curated: VersionedTable):
    """Quality gate + exact dedup (min-id survivor), then WAP."""
    docs = raw.read(spark)
    good = docs.filter(quality_score(F.col("text")) >= 0.5)
    from pyspark.sql import Window

    survivors = good.withColumn("ck", content_key(F.col("text"))).withColumn(
        "rk", F.row_number().over(Window.partitionBy("ck").orderBy("doc_id"))
    )
    cleaned = survivors.filter(F.col("rk") == 1).select("doc_id", "text")
    return curated.write_audit_publish(
        cleaned,
        checks=[
            ("nonempty", lambda df: df.count() > 0),
            (
                "no_dup_content",
                lambda df: df.groupBy(content_key(F.col("text")))
                .count()
                .filter(F.col("count") > 1)
                .count()
                == 0,
            ),
            (
                "no_null_text",
                lambda df: df.filter(F.col("text").isNull()).count() == 0,
            ),
        ],
    )


def test_landing_to_publish(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    raw = VersionedTable(tmp_path / "raw")
    curated = VersionedTable(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    # Wave 1: two chunks — one junk doc, one duplicated text.
    _chunk(src, 0, [(1, GOOD), (2, JUNK)])
    _chunk(src, 1, [(3, GOOD + " extra tail words"), (4, GOOD)])
    _ingest(spark, str(src), raw, ckpt)
    assert raw.read(spark).count() == 4

    version, results = _curate(spark, raw, curated)
    assert version == 0 and all(results.values()), results
    kept = {r.doc_id for r in curated.read(spark).collect()}
    # junk doc 2 fails quality; doc 4 is an exact dup of doc 1 (min id
    # survives)
    assert kept == {1, 3}

    # Restart with nothing new: ingest is a no-op, raw table version
    # unchanged (no empty-batch commit).
    v_before = raw.latest_version()
    _ingest(spark, str(src), raw, ckpt)
    assert raw.latest_version() == v_before

    # Wave 2: a new chunk lands; only it is ingested; re-curation
    # publishes a NEW curated version, old one remains time-travelable.
    _chunk(src, 2, [(5, "completely different and reasonably long "
                        "sentence about the weather and the sea")])
    _ingest(spark, str(src), raw, ckpt)
    assert raw.read(spark).count() == 5
    version2, results2 = _curate(spark, raw, curated)
    assert version2 == 1 and all(results2.values())
    assert {r.doc_id for r in curated.read(spark).collect()} == {1, 3, 5}
    assert {r.doc_id for r in curated.read(spark, version=0).collect()} == {1, 3}


def test_full_lifecycle_write_ingest_compact_restore_vacuum(spark, tmp_path):
    """The round-7 session pieces composed into one lakehouse
    lifecycle: Spark WRITES the landing chunks through the connector's
    own write path -> the rate-limited streaming reader ingests them
    with idempotent MERGEs -> small-file accretion is bin-packed by
    compact_small (carrying untouched files) -> a bad overwrite is
    rolled back with the O(1) metadata-only restore -> vacuum reclaims
    everything unreferenced while the restored snapshot survives."""
    src = tmp_path / "landing"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    raw = VersionedTable(tmp_path / "raw", stat_columns=("doc_id",))
    spark.dataSource.register(ChunkedExportDataSource)

    # 1. land the export with the connector's WRITE path (4 pages)
    df = spark.range(40).selectExpr("id AS doc_id", f"'{GOOD}' AS text")
    df.repartition(4).write.format("chunked_export").option(
        "path", str(src)
    ).mode("append").save()
    assert len(list(src.glob("chunk_*.jsonl"))) == 4

    # 2. rate-limited streaming ingest (first batch unlimited by design,
    #    then <=1 chunk per trigger) with idempotent MERGE batches
    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if raw.latest_version() is None:
            raw.create(batch_df)
        else:
            raw.merge(
                batch_df.sparkSession,
                batch_df,
                keys=["doc_id"],
                txn_id=f"ingest-{batch_id}",
            )

    q = (
        spark.readStream.format("chunked_export")
        .schema("doc_id long, text string")
        .option("path", str(src))
        .option("maxChunksPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert raw.read(spark).count() == 40

    # 3. merge accretion left multiple versions/files: bin-pack them
    v_before = raw.latest_version()
    files_before = len(raw._version_abs_files(raw.manifest(v_before)))
    v_packed = raw.compact_small(spark, target_bytes=64 << 20)
    files_after = len(raw._version_abs_files(raw.manifest(v_packed)))
    assert files_after <= files_before
    assert raw.read(spark).count() == 40

    # 4. a bad job overwrites the table; metadata-only restore rolls back
    raw.overwrite(spark.createDataFrame([(999, "oops")], "doc_id long, text string"))
    v_restored = raw.restore(v_packed)
    assert raw.read(spark).count() == 40
    assert raw.manifest(v_restored)["operation"] == f"restore:{v_packed}"

    # 5. vacuum to the restored head: shared files survive, junk goes
    raw.vacuum(keep_last=1)
    assert raw.read(spark).count() == 40
    got = sorted(r.doc_id for r in raw.read(spark).collect())
    assert got == list(range(40))
    # the data-skipping stats still work on the surviving manifest
    pruned, info = raw.read_pruned(spark, "doc_id", equals=7)
    assert pruned.count() == 1 and info["pruned"]
