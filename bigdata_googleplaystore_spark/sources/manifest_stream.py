"""Streaming SOURCE over a manifest-committed table — the lakehouse
layer's missing read half: `spark.readStream.format("manifest_stream")`
turns every committed manifest version into replayable micro-batches,
the same public design as Delta's streaming source over `_delta_log`.

Why this composes into end-to-end exactly-once pipelines:

- OFFSETS ARE MANIFEST VERSIONS. Structured Streaming checkpoints the
  offset dicts; a restarted query resumes from its last committed
  version. Because manifests are immutable and a version's batch-id
  set never changes, `partitions(start, end)` is a PURE function of
  the two version numbers — replays return byte-identical rows, which
  is exactly the determinism the engine's offset-replay contract
  needs (readBetweenOffsets semantics, done with the full
  partition-planned API).
- PLANNING IS METADATA-ONLY. A micro-batch's file set is the batch-id
  DIFF of two manifest JSONs — no directory listing of the table, no
  footer reads; O(|new batches|) driver work regardless of table
  history (the same no-root-listing discipline as the snapshot
  reads).
- READS RUN ON EXECUTORS, ARROW-BATCHED. Each new batch partition
  becomes an InputPartition; `read()` yields pyarrow RecordBatches,
  so rows never funnel through the driver (the 100 TB posture the
  simple-reader tier cannot give).
- APPEND-ONLY SEMANTICS, STATED HONESTLY. Compaction bases (negative
  ids) are SKIPPED — they rewrite rows already emitted by earlier
  micro-batches, so re-emitting would double-count downstream. A
  version that adds equality-delete files is REFUSED (deletes are
  retractions; an append-only stream cannot represent them) unless
  `ignoreDeletes=true`, mirroring the public Delta source's
  ignoreChanges/ignoreDeletes contract. Consumers who need
  retractions read the CDF path (manifest.snapshot_diff) instead.

Scope note: manifest JSONs and parquet files are opened with plain
`open()`/pyarrow here, so this connector tier handles local paths (the
test environment); the operator-tier read paths (streaming/manifest.py)
go through the Hadoop FS API. A deployment against object storage
would swap the two `_read_*` helpers for fsspec — the offset/planning
logic is storage-agnostic.

Reference parity: the reference's only streaming surface is console
output (challenge.scala C:26-44); this source is part of the engine's
§2.7 streaming extension tier.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

MANIFEST_DIR = "_manifests"


def _read_manifest_json(table_dir: str, version: int) -> dict:
    p = os.path.join(table_dir, MANIFEST_DIR, f"v{version:012d}.json")
    with open(p, "rb") as f:
        return json.loads(f.read().decode("utf-8"))


def _latest_version(table_dir: str) -> int | None:
    """Newest committed version: checkpoint-pointer forward probes when
    the advisory pointer exists (O(commits since checkpoint)), else a
    directory listing — the same ladder as manifest.latest_version."""
    mdir = os.path.join(table_dir, MANIFEST_DIR)
    ckpt = os.path.join(mdir, "_last_checkpoint.json")
    if os.path.exists(ckpt):
        try:
            with open(ckpt, "rb") as f:
                v = int(json.loads(f.read())["version"])
            if os.path.exists(
                os.path.join(mdir, f"v{v:012d}.json")
            ):
                while os.path.exists(
                    os.path.join(mdir, f"v{v + 1:012d}.json")
                ):
                    v += 1
                return v
        except (ValueError, KeyError, TypeError):
            pass
    if not os.path.isdir(mdir):
        return None
    vs = [
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(vs) if vs else None


class _ParquetFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        # Python DataSource options arrive lower-cased
        self.table_dir = options["path"].rstrip("/")
        self.ignore_deletes = (
            str(options.get("ignoredeletes", "false")).lower() == "true"
        )
        # -1 = from the beginning of the retained history
        self.starting = int(options.get("startingversion", -1))
        # admission control (the maxFilesPerTrigger analog): bound how
        # many commit-log versions one micro-batch may span while the
        # query runs, so a stream on a hot table never falls unbounded
        # behind its own sink. 0/absent = unlimited. The cap engages
        # only AFTER the first planned batch reveals the authoritative
        # start offset: this API's latestOffset() never sees the
        # checkpoint-restored offset, so capping from a guessed floor
        # could return an offset BELOW the restored one and stall (or
        # regress) the stream — the first trigger after any (re)start
        # is therefore uncapped, same size as an initial snapshot.
        self.max_versions = int(options.get("maxversionspertrigger", 0))
        self._floor: int | None = None  # authoritative once partitions() runs
        self.schema = schema

    # ---- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        v = _latest_version(self.table_dir)
        if v is None:
            return {"version": self.starting}
        if self.max_versions > 0 and self._floor is not None:
            v = min(v, self._floor + self.max_versions)
        return {"version": v}

    # ---- planning (driver, metadata-only) -----------------------------
    def _ids_at(self, version: int) -> tuple[set, set]:
        if version < 0:
            return set(), set()
        try:
            m = _read_manifest_json(self.table_dir, version)
        except FileNotFoundError:
            raise ValueError(
                f"manifest_stream: manifest v{version} of "
                f"{self.table_dir} no longer exists — the stream fell "
                "behind the table's vacuum retention. Widen "
                "keep_versions or restart from a fresh checkpoint."
            ) from None
        return set(m["batch_ids"]), set(m.get("delete_ids") or [])

    def _refuse_deletes(self, sv: int, ev: int, dels: set) -> None:
        raise ValueError(
            f"manifest_stream: versions {sv}->{ev} of {self.table_dir} "
            f"carry equality deletes {sorted(dels)}; an append-only "
            "stream cannot represent retractions. Read the change feed "
            "(manifest.snapshot_diff) instead, or set ignoreDeletes="
            "true to stream raw inserts only (delete masks NOT applied)."
        )

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        sv, ev = start["version"], end["version"]
        # advance the admission-control floor to this batch's END here,
        # in planning — the engine's runner process is not guaranteed
        # to route commit() callbacks to the same worker, and a floor
        # stuck below the running offset would cap latestOffset at an
        # already-processed version and stall the stream
        self._floor = max(ev, self._floor if self._floor is not None else ev)
        if ev <= sv:
            return []
        if sv < 0:
            # INITIAL SNAPSHOT (the Delta streaming-source contract): a
            # fresh stream's first batch is the CURRENT snapshot's full
            # content — including compaction bases, whose rows this
            # stream has never emitted — then the log is tailed from
            # there. Replaying dead history versions instead would read
            # vacuumed directories.
            ids_e, dels_e = self._ids_at(ev)
            if dels_e and not self.ignore_deletes:
                self._refuse_deletes(sv, ev, dels_e)
            return self._parts_for(sorted(ids_e))
        # tail: walk EVERY intermediate version, not just the endpoint
        # diff — a batch committed then compacted away inside one
        # interval appears in no endpoint diff, and a delete added then
        # GC'd inside one interval must still refuse
        seen, dels_seen = self._ids_at(sv)
        emit: list[int] = []
        for v in range(sv + 1, ev + 1):
            ids_v, dels_v = self._ids_at(v)
            new_dels = dels_v - dels_seen
            if new_dels and not self.ignore_deletes:
                self._refuse_deletes(sv, ev, new_dels)
            dels_seen |= dels_v
            # negative ids are compaction bases: rewrites of rows this
            # stream already emitted (their constituents were visible at
            # or after sv) — skipping them keeps the tail append-only
            # across OPTIMIZE-style maintenance
            emit += [b for b in sorted(ids_v - seen) if b >= 0]
            seen |= ids_v
        return self._parts_for(emit)

    def _parts_for(self, ids: list[int]) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for b in ids:
            files = sorted(
                glob.glob(
                    os.path.join(self.table_dir, f"_batch_id={b}", "*.parquet")
                )
            )
            if not files:
                raise ValueError(
                    f"manifest_stream: batch {b} of {self.table_dir} has "
                    "no files on disk — vacuumed past this stream's "
                    "offset; restart from a fresh checkpoint"
                )
            parts += [_ParquetFilePartition(f) for f in files]
        return parts

    # ---- execution (executors, arrow-batched) -------------------------
    def read(self, partition: _ParquetFilePartition):
        import pyarrow.parquet as pq

        names = [f.name for f in self.schema.fields]
        table = pq.read_table(partition.path, columns=names)
        # column-pruned to the declared schema, emitted as RecordBatches
        # so rows never round-trip through Python objects
        for rb in table.select(names).to_batches():
            yield rb

    def commit(self, end: dict) -> None:
        # offsets live in the engine's checkpoint; the admission-control
        # floor advances in partitions() (commit() callbacks are not
        # guaranteed to reach the planning worker), so belt-and-braces
        v = end["version"]
        self._floor = max(v, self._floor if self._floor is not None else v)


class ManifestStreamSource(DataSource):
    """`spark.readStream.format("manifest_stream").option("path", dir)
    .schema(...)` — schema is required (a streaming source cannot
    infer: the first trigger may plan zero files)."""

    @classmethod
    def name(cls) -> str:
        return "manifest_stream"

    def schema(self):
        raise ValueError(
            "manifest_stream requires an explicit .schema(...): the "
            "source must plan micro-batches before any file is read"
        )

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(ManifestStreamSource)
