"""Custom Python DataSource: keyset-paginated JSONL export chunks.

The reference's extract stage walks a Mongo collection with a
keyset-paginated cursor and lands fixed-size chunk files
(`ETL/export_to_gcs.py:327-357` paging loop, `:191-195` chunk writer,
checkpoint manifest `:272-293`). This connector makes that chunk
layout a first-class Spark source via the PySpark 4 DataSource API
(`pyspark.sql.datasource`): one input partition per chunk file — the
chunk boundary IS the parallelism unit, exactly how the cursor pages
were written — with driver-side schema sniffing and per-row JSON
decode on executors.

Usage:
    spark.dataSource.register(ChunkedExportDataSource)
    df = (spark.read.format("chunked_export")
          .option("path", "/data/export_chunks").load())

Scale posture: partitions() lists files only (driver metadata pass —
no data read); each executor task streams one chunk line-by-line
(memory = one row, not one chunk). At 100 TB the chunk count is the
task count, so the layout parallelizes to however many pages the
exporter wrote. A production deployment would convert chunks to
parquet once (`reconcile_read` handles the drifted-schema variants);
this source exists for the landing zone, where JSON chunks are what
the cursor produced.
"""

from __future__ import annotations

import json
from pathlib import Path

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_JSON_SPARK_TYPES = {
    bool: BooleanType(),  # before int: bool is an int subclass
    int: LongType(),
    float: DoubleType(),
    str: StringType(),
}


def _sniff_schema(lines: "list[str]") -> StructType:
    """Schema from a SAMPLE of records (not just the first), first-seen
    key order, mirroring how spark.read.json merges fields across its
    sample: a key absent from the first record but present in a later
    sampled one still gets a column (NULL-filled where missing) instead
    of being silently dropped from the whole dataset. Per-key type
    resolution: a single observed JSON type wins; {int, float} widens
    to double; any other mix — and keys seen only as null — fall back
    to string (the raw layer's lenient default — staging casts decide
    the real type, SURVEY §1.3)."""
    seen: dict[str, set] = {}
    order: list[str] = []
    for i, line in enumerate(lines):
        rec = json.loads(line)
        if not isinstance(rec, dict):
            raise ValueError(
                f"chunked_export: sampled record {i} is not a JSON object "
                "— JSONL chunks must contain one object per line"
            )
        for k, v in rec.items():
            if k not in seen:
                seen[k] = set()
                order.append(k)
            if v is not None:
                seen[k].add(type(v))
    fields = []
    for k in order:
        types = seen[k]
        if len(types) == 1:
            typ = _JSON_SPARK_TYPES.get(next(iter(types)), StringType())
        elif types == {int, float}:
            typ = DoubleType()
        else:  # empty (all-null) or conflicting: lenient string
            typ = StringType()
        fields.append(StructField(k, typ, nullable=True))
    return StructType(fields)


def _coercer(dtype):
    """PERMISSIVE-style scalar coercion (the contract of
    spark.read.json's default mode): a value whose JSON type does not
    match the sniffed column type becomes NULL instead of crashing the
    task — later records may drift (the reference's whole
    normalize_parquet_run exists because they do), and the raw layer's
    job is to land them, not to die. String columns accept ANY value
    (objects/arrays re-serialized, scalars stringified — the
    reference's stringify-all-objects defensive encode,
    export_to_gcs.py:179)."""
    if isinstance(dtype, StringType):
        def to_str(v):
            if v is None or isinstance(v, str):
                return v
            if isinstance(v, (dict, list)):
                return json.dumps(v)
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        return to_str
    if isinstance(dtype, BooleanType):
        return lambda v: v if isinstance(v, bool) else None
    if isinstance(dtype, LongType):
        # Bound-check: a JSON integer past int64 would crash the task
        # at Arrow conversion — the exact death PERMISSIVE forbids.
        return lambda v: (
            v if type(v) is int and -(2**63) <= v < 2**63 else None
        )
    if isinstance(dtype, IntegerType):
        return lambda v: (
            v if type(v) is int and -(2**31) <= v < 2**31 else None
        )
    if isinstance(dtype, (DoubleType, FloatType)):
        return lambda v: float(v) if type(v) in (int, float) else None
    # A silent all-NULL column would be worse than an error: fail fast
    # on schema types this source does not know how to coerce.
    raise ValueError(
        f"chunked_export: unsupported column type {dtype.simpleString()} "
        "(supported: boolean, int, bigint, float, double, string)"
    )


def _list_chunks(options: dict) -> list[str]:
    """Chunk files in ingestion order — ONE definition shared by the
    batch reader, the stream reader and schema sniffing so the three
    can never see different file sets. Ordered by (name length, name):
    zero-padded monotone names stay in export order even across a
    padding-width rollover (chunk_99999 -> chunk_100000 would sort
    MID-LIST lexicographically and be silently skipped by the
    streaming offset; length-first ordering keeps it at the tail)."""
    path = options["path"]
    suffix = options.get("suffix", ".jsonl")
    return sorted(
        (str(p) for p in Path(path).glob(f"*{suffix}")),
        key=lambda f: (len(Path(f).name), Path(f).name),
    )


class _ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ChunkedExportReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self._path = options["path"]
        self._suffix = options.get("suffix", ".jsonl")
        self._schema = schema

    def _files(self) -> list[str]:
        return _list_chunks({"path": self._path, "suffix": self._suffix})

    def partitions(self):
        # Driver metadata pass: file listing only, no data bytes.
        return [_ChunkPartition(f) for f in self._files()]

    def read(self, partition: _ChunkPartition):
        fields = [(f.name, _coercer(f.dataType)) for f in self._schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError as e:
                    raise ValueError(
                        f"chunked_export: corrupt JSON in {partition.path}: {e}"
                    ) from e
                if not isinstance(rec, dict):
                    raise ValueError(
                        f"chunked_export: non-object record in {partition.path}"
                        " (JSONL chunks must contain one object per line)"
                    )
                yield tuple(coerce(rec.get(name)) for name, coerce in fields)


class ChunkedExportDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chunked_export"

    def schema(self) -> StructType:
        # Sample up to sampleSize records (default 100) spread over the
        # LEADING records of every chunk — a key first appearing in a
        # later chunk's head is still discovered without a full scan.
        # Raise sampleSize if fields can first appear deep inside a
        # single chunk; pass an explicit .schema(...) to skip sniffing.
        budget = int(self.options.get("sampleSize", "100"))
        chunks = _list_chunks(self.options)
        per_chunk = max(1, budget // max(1, len(chunks)))
        sample: list[str] = []
        for f in chunks:
            taken = 0
            with open(f, encoding="utf-8") as fh:
                for line in fh:
                    if line.strip():
                        sample.append(line)
                        taken += 1
                        if taken >= per_chunk or len(sample) >= budget:
                            break
            if len(sample) >= budget:
                break
        if not sample:
            raise ValueError(
                f"chunked_export: no records under {self.options['path']}"
            )
        return _sniff_schema(sample)

    def reader(self, schema: StructType) -> ChunkedExportReader:
        return ChunkedExportReader(self.options, schema)

    def streamReader(self, schema: StructType) -> "ChunkedExportStreamReader":
        return ChunkedExportStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "ChunkedExportWriter":
        return ChunkedExportWriter(self.options, schema, overwrite)


class ChunkedExportStreamReader(DataSourceStreamReader):
    """Streaming form: the RESUMABLE export (ref export_to_gcs.py
    checkpoint/resume, :272-293,388-405). The offset is the count of
    chunk files already ingested — valid because the exporter names
    pages monotonically (keyset cursor ⇒ ordered chunk_NNNNN files;
    the length-first listing order keeps a padding-width rollover at
    the tail) and chunks are IMMUTABLE once written (rows appended to
    an already-counted file would be lost — the exporter's
    write-then-advance-checkpoint protocol guarantees this). Spark's
    checkpoint persists the offset; a restarted stream resumes at the
    first unseen chunk, never re-reading or skipping a page.

    ``maxChunksPerTrigger`` (option, default unlimited) rate-limits a
    micro-batch to that many chunks — the maxFilesPerTrigger analog.
    Without it, a stream resuming after downtime against a backlog of
    accumulated pages would put the ENTIRE backlog in one micro-batch
    (one giant transaction, worst-case executor memory, no progress
    checkpoints until it all lands); with it, catch-up proceeds in
    bounded increments and each increment commits its offset. One
    caveat, chosen deliberately: the FIRST batch of each run is
    unlimited — the engine calls latestOffset() BEFORE revealing the
    checkpointed start (observed: latestOffset precedes even
    initialOffset on a fresh stream), and limiting against a guessed
    base could move the offset BACKWARD, which would re-read committed
    chunks after a restart. Bounded catch-up engages from the second
    trigger, once partitions()/commit() have shown the true base; with
    trigger(availableNow=True) the engine snapshots one batch total,
    so the limit applies to processing-time/continuous triggers."""

    def __init__(self, options: dict, schema: StructType):
        self._inner = ChunkedExportReader(options, schema)
        self._max_per_trigger = int(options.get("maxChunksPerTrigger", "0"))
        if self._max_per_trigger < 0:
            raise ValueError("maxChunksPerTrigger must be >= 0 (0 = unlimited)")
        # High-water mark the ENGINE has shown us (via partitions/commit).
        # None = not yet known: latestOffset() is called before the
        # engine reveals the checkpointed start on restart, and a guessed
        # base could move the offset BACKWARD — which would re-read
        # already-committed chunks. So the first batch after (re)start is
        # unlimited, and the limit engages once the true base is known.
        self._base: int | None = None

    def initialOffset(self) -> dict:
        self._base = 0  # fresh stream: no checkpoint, base is known
        return {"n_files": 0}

    def latestOffset(self) -> dict:
        n = len(self._inner._files())
        if self._max_per_trigger and self._base is not None:
            n = min(n, self._base + self._max_per_trigger)
        return {"n_files": n}

    def partitions(self, start: dict, end: dict):
        # the engine's start IS the committed checkpoint — learn it
        self._base = max(self._base or 0, start["n_files"])
        files = self._inner._files()
        return [
            _ChunkPartition(f)
            for f in files[start["n_files"]: end["n_files"]]
        ]

    def read(self, partition: _ChunkPartition):
        return self._inner.read(partition)

    def commit(self, end: dict) -> None:
        # Offsets live in the stream checkpoint; nothing source-side to
        # clean up (chunks are immutable exporter output). Advance the
        # rate-limit base to committed progress so the next trigger's
        # window starts where this batch ended.
        self._base = max(self._base or 0, end["n_files"])


@dataclass
class _ChunkCommit(WriterCommitMessage):
    temp_path: str
    n_rows: int


class ChunkedExportWriter(DataSourceWriter):
    """Write path of the connector: lands a DataFrame AS the exporter's
    chunk layout (`df.write.format("chunked_export").save()` — the
    distributed form of the reference's cursor-paged chunk writer,
    ref export_to_gcs.py:191-195, checkpoint manifest :272-293).

    Exactly-once protocol, mirroring the exporter's write-then-advance:
    each task streams its partition to a TEMP file (.inprogress-*) and
    returns it as a commit message; only the driver-side commit()
    renames temp files into the monotone ``chunk_NNNNN.jsonl`` sequence
    (continuing after any chunks already present) and finally writes
    the JSON manifest — so readers (and the streaming offset, which
    counts finished chunks) can never observe a half-written page, and
    abort() removes the temps of a failed job without touching
    committed chunks. Rows serialize as one JSON object per line with
    NaN/Inf normalized to null (strict JSON, exporter-compatible).
    """

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self._path = options["path"]
        self._suffix = options.get("suffix", ".jsonl")
        self._fields = [f.name for f in schema.fields]
        self._overwrite = overwrite

    def write(self, iterator) -> _ChunkCommit:
        import math
        import os
        import uuid

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(
            self._path, f".inprogress-{pid:05d}-{uuid.uuid4().hex[:8]}"
        )

        def clean(v):
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                return None  # strict JSON: the exporter's jsonify guard
            return v

        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {k: clean(v) for k, v in zip(self._fields, row)}
                fh.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return _ChunkCommit(temp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        import os

        existing = _list_chunks({"path": self._path, "suffix": self._suffix})
        if self._overwrite:
            for f in existing:
                os.remove(f)
            start = 0
        else:
            # continue after the HIGHEST existing index, not the count:
            # an exporter-written sequence may be sparse, and a name
            # collision would clobber a committed page
            def idx(f: str) -> int:
                stem = Path(f).name[: -len(self._suffix)]
                digits = stem.rsplit("_", 1)[-1]
                return int(digits) if digits.isdigit() else -1

            start = max((idx(f) for f in existing), default=-1) + 1
        # deterministic chunk order: partition order = message order
        total = 0
        named = []
        for i, m in enumerate(messages):
            name = f"chunk_{start + i:05d}{self._suffix}"
            os.replace(m.temp_path, os.path.join(self._path, name))
            named.append({"chunk": name, "rows": m.n_rows})
            total += m.n_rows
        manifest = {
            "chunks": named,
            "total_rows": total,
            "mode": "overwrite" if self._overwrite else "append",
        }
        # temp-then-rename, same protocol as the chunks themselves: a
        # concurrent reader sees the previous complete manifest or the
        # new complete one, never a truncated write-in-progress.
        final = os.path.join(self._path, "_export_manifest.json")
        tmp_manifest = final + f".tmp-{os.getpid()}"
        with open(tmp_manifest, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp_manifest, final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.temp_path)
                except FileNotFoundError:
                    pass
