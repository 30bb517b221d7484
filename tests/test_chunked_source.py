"""Custom Python DataSource (PySpark 4 API): the keyset-paginated
JSONL chunk connector (ref: ETL/export_to_gcs.py:327-357 cursor pages,
:191-195 chunk files)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from glamira_batch_processing_spark.sources.chunked_source import (
    ChunkedExportDataSource,
)


@pytest.fixture()
def chunks_dir(tmp_path):
    for i in range(3):
        with open(tmp_path / f"chunk_{i:05d}.jsonl", "w") as f:
            for j in range(4):
                f.write(
                    json.dumps(
                        {
                            "_id": i * 4 + j,
                            "collection": "view_product_detail"
                            if j % 2
                            else "checkout_success",
                            "price": 10.5 + j,
                            "active": j % 2 == 0,
                            "cart": {"qty": j},
                        }
                    )
                    + "\n"
                )
    return str(tmp_path)


def _register(spark):
    spark.dataSource.register(ChunkedExportDataSource)


def test_chunked_source_reads_one_partition_per_chunk(spark, chunks_dir):
    """The chunk boundary is the parallelism unit — exactly the page
    layout the exporter wrote — and JSON scalars sniff to typed
    columns while nested objects land as lenient strings (the raw
    layer's stringly default, SURVEY §1.3)."""
    _register(spark)
    df = spark.read.format("chunked_export").option("path", chunks_dir).load()
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 12
    types = dict(df.dtypes)
    assert types["_id"] == "bigint"
    assert types["price"] == "double"
    assert types["active"] == "boolean"
    assert types["cart"] == "string"  # nested object -> lenient string
    got = {r._id for r in df.collect()}
    assert got == set(range(12))
    # the stringly nested column is still JSON-parseable downstream
    qty = df.select(
        F.get_json_object("cart", "$.qty").cast("int").alias("q")
    ).agg(F.sum("q")).first()[0]
    assert qty == 3 * (0 + 1 + 2 + 3)


def test_chunked_source_user_schema_prunes_fields(spark, chunks_dir):
    """An explicit .schema() narrows what the executor materializes."""
    _register(spark)
    sch = StructType(
        [
            StructField("_id", LongType()),
            StructField("collection", StringType()),
        ]
    )
    df = (
        spark.read.format("chunked_export")
        .schema(sch)
        .option("path", chunks_dir)
        .load()
    )
    assert df.columns == ["_id", "collection"]
    n = df.filter(F.col("collection") == "checkout_success").count()
    assert n == 6


def test_chunked_source_empty_dir_raises(spark, tmp_path):
    _register(spark)
    with pytest.raises(Exception, match="no records"):
        spark.read.format("chunked_export").option(
            "path", str(tmp_path)
        ).load().collect()


def _add_chunk(path, idx, n=4):
    with open(f"{path}/chunk_{idx:05d}.jsonl", "w") as f:
        for j in range(n):
            f.write(json.dumps({"_id": idx * 100 + j, "collection": "c"}) + "\n")


def test_chunked_source_stream_resumes_at_unseen_chunk(spark, tmp_path):
    """The streaming reader is the RESUMABLE export: the offset is the
    ingested-chunk count, persisted in the stream checkpoint — a
    restart after new pages land processes ONLY the unseen chunks."""
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _register(spark)
    _add_chunk(src, 0)
    _add_chunk(src, 1)

    sch = StructType(
        [
            StructField("_id", LongType()),
            StructField("collection", StringType()),
        ]
    )

    def run_once():
        q = (
            spark.readStream.format("chunked_export")
            .schema(sch)
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 8

    # No new chunks: a restarted stream must be a no-op.
    run_once()
    assert spark.read.parquet(out).count() == 8

    # One new page lands; the resumed stream ingests exactly it.
    _add_chunk(src, 2)
    run_once()
    back = spark.read.parquet(out)
    assert back.count() == 12
    assert back.filter(F.col("_id") >= 200).count() == 4


def test_chunked_source_permissive_type_drift(spark, tmp_path):
    """Later records may drift from the sniffed schema (the reference's
    normalize_parquet_run exists because they do): a mismatched scalar
    lands as NULL — spark.read.json PERMISSIVE semantics — while
    string columns absorb anything (objects re-serialized, scalars
    stringified)."""
    _register(spark)
    recs = [
        {"_id": 1, "price": 9.5, "active": True, "note": "ok"},
        # drifted: _id string, price bool, active int, note object
        {"_id": "x", "price": True, "active": 2, "note": {"a": 1}},
        # drifted: price int (int widens to double), note number
        {"_id": 3, "price": 7, "active": False, "note": 4.5},
    ]
    with open(tmp_path / "chunk_00000.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    # sampleSize=1 pins first-record sniffing so the LATER records are
    # genuine drift against the sniffed types (the multi-record default
    # would fold the drift into the sample and widen to string).
    df = spark.read.format("chunked_export").option(
        "path", str(tmp_path)
    ).option("sampleSize", "1").load()
    rows = sorted(df.collect(), key=lambda r: (r._id is None, r._id or 0))
    by = {r.note: r for r in rows}
    assert by["ok"]._id == 1 and by["ok"].price == 9.5 and by["ok"].active is True
    drifted = by['{"a": 1}']
    assert drifted._id is None and drifted.price is None and drifted.active is None
    widened = by["4.5"]
    assert widened._id == 3 and widened.price == 7.0 and widened.active is False


def test_chunked_source_sniffs_fields_beyond_first_record(spark, tmp_path):
    """A key absent from the first record but present later in the
    sample must still become a column (NULL where missing) — the
    single-record sniff silently DROPPED it from the whole dataset.
    Conflicting sampled types widen: {int,float}→double, else string."""
    _register(spark)
    recs = [
        {"_id": 1, "qty": 2},
        {"_id": 2, "qty": 2.5, "discount": 0.1},   # late field + int/float mix
        {"_id": "three", "flag": True},            # late field + type conflict
    ]
    with open(tmp_path / "chunk_00000.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    df = spark.read.format("chunked_export").option("path", str(tmp_path)).load()
    assert df.columns == ["_id", "qty", "discount", "flag"]
    types = dict(df.dtypes)
    assert types["_id"] == "string"      # int vs str conflict
    assert types["qty"] == "double"      # int widens to double
    assert types["discount"] == "double"
    assert types["flag"] == "boolean"
    rows = {r.flag: r for r in df.collect()}
    assert rows[True]._id == "three" and rows[True].qty is None
    got = sorted((r.discount or 0.0) for r in df.collect())
    assert got == [0.0, 0.0, 0.1]


def test_chunk_listing_survives_padding_width_rollover(tmp_path):
    """chunk_99999 -> chunk_100000 must stay at the TAIL of the
    listing (length-first order); plain lexicographic order would put
    the wider name mid-list, where the streaming offset (a file count)
    would skip it forever."""
    from glamira_batch_processing_spark.sources.chunked_source import (
        _list_chunks,
    )

    names = ["chunk_99998.jsonl", "chunk_99999.jsonl", "chunk_100000.jsonl"]
    for n in names:
        (tmp_path / n).write_text('{"a": 1}\n')
    got = [f.rsplit("/", 1)[-1] for f in _list_chunks({"path": str(tmp_path)})]
    assert got == names


def test_chunked_source_oversized_int_becomes_null(spark, tmp_path):
    """A JSON integer past int64 must land as NULL (PERMISSIVE), not
    kill the task at Arrow conversion."""
    _register(spark)
    with open(tmp_path / "chunk_00000.jsonl", "w") as f:
        f.write(json.dumps({"_id": 1, "v": 7}) + "\n")
        f.write(json.dumps({"_id": 2, "v": 2**64}) + "\n")
    df = spark.read.format("chunked_export").option("path", str(tmp_path)).load()
    got = {r._id: r.v for r in df.collect()}
    assert got == {1: 7, 2: None}


def test_chunked_source_unsupported_schema_type_fails_fast(spark, tmp_path):
    """A user schema with a type the source cannot coerce must raise a
    clear error, never silently NULL the whole column."""
    import pytest as _pytest
    from pyspark.sql.types import DateType

    _register(spark)
    (tmp_path / "chunk_00000.jsonl").write_text('{"d": "2024-01-01"}\n')
    sch = StructType([StructField("d", DateType())])
    with _pytest.raises(Exception, match="unsupported column type"):
        spark.read.format("chunked_export").schema(sch).option(
            "path", str(tmp_path)
        ).load().collect()


def test_chunked_source_max_chunks_per_trigger(spark, tmp_path):
    """Rate-limited catch-up: after the first trigger establishes the
    base, a 6-chunk backlog drains in increments of <= 2 chunks per
    micro-batch (each committing its own offset) — and every row lands
    exactly once. (The FIRST batch of a run is deliberately unlimited:
    latestOffset precedes the engine revealing the checkpointed start,
    see the reader docstring.)"""
    import time

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _register(spark)
    _add_chunk(src, 0)  # first (unlimited) batch: just this chunk

    sch = StructType(
        [
            StructField("_id", LongType()),
            StructField("collection", StringType()),
        ]
    )
    q = (
        spark.readStream.format("chunked_export")
        .schema(sch)
        .option("path", str(src))
        .option("maxChunksPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() == 4:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        # backlog lands while the stream runs
        for i in range(1, 7):
            _add_chunk(src, i)
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() == 28:
                    break
            except Exception:
                pass
            time.sleep(0.3)
    finally:
        q.stop()
    back = spark.read.parquet(out)
    assert back.count() == 28  # 7 chunks x 4 rows, exactly once
    assert back.select("_id").distinct().count() == 28

    # offset log: after the base is known, no batch advanced > 2 chunks
    import json as _json
    import pathlib

    offs = []
    for pth in sorted(
        (
            x
            for x in pathlib.Path(ckpt, "offsets").iterdir()
            if x.name.isdigit()
        ),
        key=lambda x: int(x.name),
    ):
        last = pth.read_text().strip().splitlines()[-1]
        offs.append(_json.loads(last)["n_files"])
    deltas = [b - a for a, b in zip(offs, offs[1:])]
    assert offs[-1] == 7, offs
    assert all(d <= 2 for d in deltas[1:]), offs
    assert len([d for d in deltas if d > 0]) >= 3, offs


def test_chunked_source_rate_limit_validation(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _add_chunk(src, 0)
    _register(spark)
    sch = StructType([StructField("_id", LongType())])
    with pytest.raises(Exception, match="maxChunksPerTrigger"):
        q = (
            spark.readStream.format("chunked_export")
            .schema(sch)
            .option("path", str(src))
            .option("maxChunksPerTrigger", "-1")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


# ---------------------------------------------------------------------------
# Write path: df.write.format("chunked_export")
# ---------------------------------------------------------------------------


def test_chunked_writer_roundtrip(spark, tmp_path):
    """Distributed chunk landing: one chunk per partition, monotone
    names, manifest; the connector's own reader gets every row back."""
    dst = tmp_path / "dst"
    dst.mkdir()
    _register(spark)
    df = spark.range(20).selectExpr(
        "id AS _id", "CONCAT('u', CAST(id AS STRING)) AS name"
    ).repartition(4)
    df.write.format("chunked_export").option("path", str(dst)).mode(
        "append"
    ).save()
    chunks = sorted(p.name for p in dst.glob("chunk_*.jsonl"))
    assert chunks == [f"chunk_{i:05d}.jsonl" for i in range(4)]
    back = (
        spark.read.format("chunked_export").option("path", str(dst)).load()
    )
    assert back.count() == 20
    assert sorted(r["_id"] for r in back.collect()) == list(range(20))
    manifest = json.loads((dst / "_export_manifest.json").read_text())
    assert manifest["total_rows"] == 20 and len(manifest["chunks"]) == 4


def test_chunked_writer_append_continues_sequence(spark, tmp_path):
    dst = tmp_path / "dst"
    dst.mkdir()
    _register(spark)
    one = spark.createDataFrame([(1,)], "_id long").coalesce(1)
    one.write.format("chunked_export").option("path", str(dst)).mode("append").save()
    one.write.format("chunked_export").option("path", str(dst)).mode("append").save()
    names = sorted(p.name for p in dst.glob("chunk_*.jsonl"))
    assert names == ["chunk_00000.jsonl", "chunk_00001.jsonl"]
    back = spark.read.format("chunked_export").option("path", str(dst)).load()
    assert back.count() == 2


def test_chunked_writer_overwrite_replaces(spark, tmp_path):
    dst = tmp_path / "dst"
    dst.mkdir()
    _register(spark)
    spark.range(10).selectExpr("id AS _id").coalesce(2).write.format(
        "chunked_export"
    ).option("path", str(dst)).mode("append").save()
    spark.createDataFrame([(99,)], "_id long").coalesce(1).write.format(
        "chunked_export"
    ).option("path", str(dst)).mode("overwrite").save()
    back = spark.read.format("chunked_export").option("path", str(dst)).load()
    assert [r["_id"] for r in back.collect()] == [99]
    assert len(list(dst.glob("chunk_*.jsonl"))) == 1


def test_chunked_writer_nan_inf_null_and_no_temp_leftovers(spark, tmp_path):
    dst = tmp_path / "dst"
    dst.mkdir()
    _register(spark)
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, 1.5)], "_id long, x double"
    ).coalesce(1)
    df.write.format("chunked_export").option("path", str(dst)).mode("append").save()
    lines = (dst / "chunk_00000.jsonl").read_text().strip().splitlines()
    recs = {json.loads(ln)["_id"]: json.loads(ln)["x"] for ln in lines}
    assert recs == {1: None, 2: None, 3: 1.5}  # strict JSON, NaN/Inf -> null
    assert not list(dst.glob(".inprogress-*"))


def test_chunked_writer_feeds_streaming_reader(spark, tmp_path):
    """The written layout is the exporter's: the connector's streaming
    reader ingests writer output and resumes past it."""
    dst = tmp_path / "dst"
    dst.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _register(spark)
    spark.range(8).selectExpr("id AS _id").coalesce(2).write.format(
        "chunked_export"
    ).option("path", str(dst)).mode("append").save()

    sch = StructType([StructField("_id", LongType())])

    def run_once():
        q = (
            spark.readStream.format("chunked_export")
            .schema(sch)
            .option("path", str(dst))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 8
    spark.createDataFrame([(100,)], "_id long").coalesce(1).write.format(
        "chunked_export"
    ).option("path", str(dst)).mode("append").save()
    run_once()
    assert spark.read.parquet(out).count() == 9


def test_chunked_writer_append_skips_sparse_gaps(spark, tmp_path):
    """Append continues after the HIGHEST existing index: a sparse
    exporter sequence (gaps from deleted pages) must never be
    clobbered by a count-based name collision."""
    dst = tmp_path / "dst"
    dst.mkdir()
    _register(spark)
    _add_chunk(dst, 0)
    _add_chunk(dst, 5)  # sparse: indices 1-4 missing
    spark.createDataFrame([(7,)], "_id long").coalesce(1).write.format(
        "chunked_export"
    ).option("path", str(dst)).mode("append").save()
    names = sorted(p.name for p in dst.glob("chunk_*.jsonl"))
    assert names == ["chunk_00000.jsonl", "chunk_00005.jsonl", "chunk_00006.jsonl"]


def test_chunked_writer_creates_missing_destination(spark, tmp_path):
    """The destination directory is created on demand (nested, never
    pre-made here) and the manifest lands via temp-then-rename — no
    manifest temp file survives the commit."""
    dst = tmp_path / "not" / "yet" / "there"
    assert not dst.exists()
    _register(spark)
    df = spark.range(6).selectExpr("id AS _id").repartition(2)
    df.write.format("chunked_export").option("path", str(dst)).mode(
        "append"
    ).save()
    back = spark.read.format("chunked_export").option("path", str(dst)).load()
    assert back.count() == 6
    manifest = json.loads((dst / "_export_manifest.json").read_text())
    assert manifest["total_rows"] == 6
    leftovers = [p.name for p in dst.iterdir() if ".tmp" in p.name]
    assert leftovers == []
