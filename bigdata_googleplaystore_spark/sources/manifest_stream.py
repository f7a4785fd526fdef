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
  retractions read the CDF source (manifest_cdf_stream) or the batch
  feed (manifest.snapshot_diff) instead.

Option contract (Delta-parity where Delta has the option):

- `startingVersion=N` is INCLUSIVE of N, like Delta's: the first
  micro-batch replays the changes version N itself committed (the
  baseline is N-1). Absent, the first batch is the current snapshot.
  As in Delta, a startingVersion replay is a LOG replay: compaction
  bases stay skipped, so rows that exist only inside a base rewritten
  before N are not re-emitted.
- `startingTimestamp=T` (mutually exclusive with startingVersion;
  ISO date/datetime, naive = UTC, or epoch seconds) resolves to the
  first version whose manifest file mtime >= T and tails from there —
  O(log versions) metadata probes by binary search, sound because
  manifest mtimes are monotone with version (the invariant vacuum's
  age-based retention already rests on). Every commit older than T ->
  the stream reads only future commits; a backend without mtimes
  refuses loudly.
- `skipChangeCommits=true` (the modern Delta option that replaced
  ignoreChanges): a tail version that adds equality deletes is a
  CHANGE commit and is skipped WHOLE — its deletes AND the inserts
  committed beside them (an upsert's new rows are updates, not
  appends) — while pure-append versions stream through. Mutually
  exclusive with `ignoreDeletes` (which emits a change commit's raw
  inserts and ignores only its deletes). Governs the TAIL only: an
  initial snapshot over a table with delete groups still refuses
  (applying masks is the CDF source's job, not this source's).
- `maxVersionsPerTrigger` / `maxBytesPerTrigger` — admission control
  (Delta's maxFilesPerTrigger/maxBytesPerTrigger analog at this
  layer's version granularity). Bytes come from the `_bytes` zone-map
  stat `manifest.write_and_commit_batch` records per batch; a batch
  committed without stats counts 0 bytes (admission is backlog
  PACING — planning still walks every admitted version, so
  correctness never depends on the stat being present). At least one
  version is always admitted, so a single over-cap commit cannot
  stall the stream.

Storage: all file access routes through `sources/storage.py`'s
pluggable backend (local paths by default, `memory://` for unit tests,
fsspec schemes when that package exists), so this connector tier is
storage-agnostic; the operator-tier write paths (streaming/manifest.py)
go through the Hadoop FS API.

Schema: additive evolution is READ-TOLERANT — a batch file written
before a column was added is read with the declared columns it has,
and the missing ones are emitted as typed nulls (the same
mergeSchema-on-read semantics the operator-tier snapshot read offers).
This tolerance is per-file and total: ANY declared column a file lacks
becomes typed nulls, including a column NO file has ever carried — a
typo'd declared name therefore reads as all-null rather than raising.
That is the same trade Spark's own mergeSchema read makes (a selected
column absent everywhere is null, not an error). The opt-in
`strictSchemaCheck=true` closes the footgun at a declared cost: the
FIRST plan validates every declared data column against the union of
one parquet footer per committed batch (a batch's files share the
schema of the job that wrote them) and raises naming any column no
batch has ever carried — O(|batches|) footer reads once per stream
start, zero cost thereafter.

Reference parity: the reference's only streaming surface is console
output (challenge.scala C:26-44); this source is part of the engine's
§2.7 streaming extension tier.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .storage import StorageBackend, get_backend

MANIFEST_DIR = "_manifests"


def _read_manifest_json(
    fs: StorageBackend, table_dir: str, version: int
) -> dict:
    p = f"{table_dir}/{MANIFEST_DIR}/v{version:012d}.json"
    with fs.open(p, "rb") as f:
        return json.loads(f.read().decode("utf-8"))


def _latest_version(fs: StorageBackend, table_dir: str) -> int | None:
    """Newest committed version: checkpoint-pointer forward probes when
    the advisory pointer exists (O(commits since checkpoint)), else a
    directory listing — the same ladder as manifest.latest_version."""
    mdir = f"{table_dir}/{MANIFEST_DIR}"
    ckpt = f"{mdir}/_last_checkpoint.json"
    if fs.exists(ckpt):
        try:
            with fs.open(ckpt, "rb") as f:
                v = int(json.loads(f.read())["version"])
            if fs.exists(f"{mdir}/v{v:012d}.json"):
                while fs.exists(f"{mdir}/v{v + 1:012d}.json"):
                    v += 1
                return v
        except (ValueError, KeyError, TypeError):
            pass
    vs = [
        int(n[1:-5])
        for n in fs.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(vs) if vs else None


def _byte_capped_end(
    fs: StorageBackend, table_dir: str, floor: int, latest: int, max_bytes: int
) -> int:
    """The farthest version <= `latest` whose cumulative NEW
    non-negative batches' recorded `_bytes` (manifest stats, written by
    manifest.write_and_commit_batch) stay within `max_bytes` past
    `floor` — the maxBytesPerTrigger admission decision, shared by the
    append-only and CDF stream readers. Walks O(admitted backlog)
    manifest JSONs, which the cap itself bounds after the first
    trigger; batches without the stat count 0 (admission is backlog
    PACING, never a correctness input). Always admits >= 1 version
    (progress guarantee)."""
    try:
        seen = set(
            _read_manifest_json(fs, table_dir, floor)["batch_ids"]
        ) if floor >= 0 else set()
    except FileNotFoundError:
        return latest  # retention edge: let planning raise the loud error
    admitted = floor
    spent = 0
    for cand in range(floor + 1, latest + 1):
        try:
            m = _read_manifest_json(fs, table_dir, cand)
        except FileNotFoundError:
            # vacuum removed a manifest in (floor, latest] mid-walk —
            # same retention edge as the floor read above: return the
            # uncapped end so partitions() walks the gap and raises its
            # descriptive vacuum-retention error instead of this raw
            # FileNotFoundError escaping from latestOffset()
            return latest
        ids = set(m["batch_ids"])
        stats = m.get("stats") or {}
        add = sum(
            int((stats.get(str(b)) or {}).get("_bytes") or 0)
            for b in ids - seen
            if b >= 0
        )
        if admitted > floor and spent + add > max_bytes:
            break
        admitted, spent = cand, spent + add
        seen |= ids
    return admitted


def _parse_timestamp(v) -> float:
    """startingTimestamp value -> epoch seconds. ISO date/datetime is
    tried FIRST (naive = UTC, matching the engine's UTC session
    discipline) so compact ISO forms like '20260816' don't misparse as
    epoch numbers; a plain numeric literal is epoch SECONDS, bounded
    to [0, ~year 2200] so epoch-milliseconds habits (and NaN/inf) fail
    loudly instead of silently replaying everything or nothing.

    Compact 8-digit dates are matched EXPLICITLY (strptime %Y%m%d)
    before any other path: fromisoformat only accepts them on
    Python >= 3.11, and without the explicit match an older
    interpreter would silently fall through to the numeric branch and
    resolve '20260816' as epoch 1970 — the exact mis-resolution the
    ISO-first rule exists to prevent."""
    import math
    import re
    from datetime import datetime, timezone

    s = str(v)
    if re.fullmatch(r"\d{8}", s):
        try:
            return datetime.strptime(s, "%Y%m%d").replace(
                tzinfo=timezone.utc
            ).timestamp()
        except ValueError:
            pass  # not a real YYYYMMDD (e.g. month 00) -> numeric path
    try:
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()
    except (TypeError, ValueError):
        pass
    ts = float(v)
    if not math.isfinite(ts) or ts < 0 or ts > 7258118400:  # 2200-01-01
        raise ValueError(
            f"startingTimestamp={v!r}: numeric timestamps are epoch "
            "SECONDS in [0, 7258118400) — an epoch-milliseconds value "
            "or NaN/inf would silently mis-resolve, so it refuses "
            "instead; pass seconds or an ISO date/datetime"
        )
    return ts


def min_version_at_or_after(mt, latest: int, ts: float) -> int:
    """The smallest v in [0, latest] with mt(v) >= ts, else latest+1 —
    binary search over a monotone mtime sequence. `mt(v)` returns
    epoch seconds or None meaning DEFINITELY-OLDER (a vacuumed
    prefix); `mt` itself must raise for anomalies (an existing file
    whose mtime the backend cannot give), so a probe failure never
    silently classifies a commit as old. Shared by the stream
    sources' startingTimestamp and, mirrored (`max_version_at_or_
    before`), by the operator tier's timestampAsOf. None at `latest`
    is handled HERE (definitely-older -> latest+1), not left to the
    caller: the helper is shared/exported and a raw TypeError from the
    first probe would betray the documented mt contract."""
    m_latest = mt(latest)
    if m_latest is None or m_latest < ts:
        return latest + 1
    lo, hi = 0, latest  # invariant: mt(hi) >= ts
    while lo < hi:
        mid = (lo + hi) // 2
        m = mt(mid)
        if m is None or m < ts:
            lo = mid + 1
        else:
            hi = mid
    return lo


def max_version_at_or_before(mt, latest: int, ts: float):
    """The largest v in [0, latest] whose mtime is KNOWN and <= ts,
    else None (every retained commit is newer, or the as-of version
    was vacuumed). Same `mt` contract as min_version_at_or_after."""
    m_latest = mt(latest)
    if m_latest is not None and m_latest <= ts:
        return latest
    lo, hi = 0, latest  # invariant: predicate(hi) is False
    while lo < hi:
        mid = (lo + hi + 1) // 2
        m = mt(mid)
        if m is None or m <= ts:
            lo = mid
        else:
            hi = mid - 1
    m_lo = mt(lo)
    return lo if (m_lo is not None and m_lo <= ts) else None


def resolve_starting_timestamp(
    fs: StorageBackend, table_dir: str, ts: float, now: float | None = None
) -> int:
    """The SMALLEST committed version whose manifest mtime >= ts —
    Delta's startingTimestamp resolution, done in O(log versions)
    metadata probes, each stat memoized (manifest mtimes are monotone
    with version, the invariant vacuum's age-based retention already
    rests on). Returns latest+1 when every commit predates ts (the
    stream reads only future commits) and 0 on a table with no
    commits — SOUND in both cases for any ts <= now, because a commit
    landing after resolution time carries an mtime >= now >= ts. A ts
    in the FUTURE of resolution wall-clock (`now`, injectable for
    tests) refuses instead: a commit landing between now and T would
    carry mtime < T yet be emitted, the one regime where the
    first-version-with-mtime>=ts contract can actually break. (Delta
    refuses EVERY ts past its last commit; this keeps the usable
    resume-from-a-quiet-period case and refuses only the unsound one.
    Driver/storage clock skew narrows the boundary by the skew —
    callers needing exactness at the boundary should pass
    startingVersion.) Vacuumed manifests probe as older-than-ts (they
    are), but a resolution landing ON the vacuum retention floor
    refuses loudly — the replay's baseline manifest (resolved-1) is
    gone, so tailing from there cannot be exact (the same
    loud-over-wrong policy as timestampAsOf). Backends that cannot
    provide mtimes, or that fail to stat an EXISTING manifest, also
    refuse rather than silently skipping history."""
    import time

    if now is None:
        now = time.time()
    latest = _latest_version(fs, table_dir)
    if latest is None:
        if ts > now:
            raise ValueError(
                f"manifest stream source: startingTimestamp {ts} is in "
                f"the future and {table_dir} has no commits — a commit "
                "landing before that instant would carry mtime < T yet "
                "be emitted; pass a timestamp <= now, or "
                "startingVersion=0 to tail every future commit"
            )
        return 0

    _mt_cache: dict[int, float | None] = {}

    def mt(v: int) -> float | None:
        if v in _mt_cache:
            return _mt_cache[v]
        p = f"{table_dir}/{MANIFEST_DIR}/v{v:012d}.json"
        m = fs.mtime(p)
        if m is None and fs.exists(p):
            raise ValueError(
                f"manifest stream source: the storage backend returned "
                f"no modification time for EXISTING manifest v{v} of "
                f"{table_dir} — startingTimestamp cannot resolve "
                "soundly on this backend; use startingVersion"
            )
        _mt_cache[v] = m
        return m

    if mt(latest) is None:
        raise ValueError(
            f"manifest stream source: manifest v{latest} of {table_dir} "
            "vanished between listing and stat (concurrent vacuum?) — "
            "startingTimestamp cannot resolve against a moving log; "
            "retry, or use startingVersion"
        )
    resolved = min_version_at_or_after(mt, latest, ts)
    if resolved > latest and ts > now:
        raise ValueError(
            f"manifest stream source: startingTimestamp {ts} is in the "
            f"future (past every commit of {table_dir} AND past "
            "resolution wall-clock) — a commit landing before that "
            "instant would carry mtime < T yet be emitted; pass a "
            "timestamp <= now, or startingVersion to pin the tail "
            "explicitly"
        )
    if 0 < resolved <= latest and mt(resolved - 1) is None:
        raise ValueError(
            f"manifest stream source: startingTimestamp resolves to "
            f"v{resolved}, whose replay baseline v{resolved - 1} of "
            f"{table_dir} was vacuumed — the tail cannot start exactly "
            "there. Pick a later timestamp, pass startingVersion "
            "explicitly, or omit both for initial-snapshot semantics."
        )
    return resolved


def validate_declared_columns(
    fs: StorageBackend,
    table_dir: str,
    manifest: dict,
    schema: StructType,
    skip: tuple = (),
) -> None:
    """strictSchemaCheck: every declared data column (minus `skip`
    meta columns) must appear in the union of the table's batch file
    schemas — ONE parquet footer per committed batch (a batch's files
    share the schema of the job that wrote them), early-exiting once
    all names are found. Raises naming the never-carried columns, the
    loud alternative to the default mergeSchema-style typed-null
    tolerance (see module doc)."""
    import pyarrow.parquet as pq

    declared = {f.name for f in schema.fields if f.name not in skip}
    if not declared or not manifest.get("batch_ids"):
        return
    seen: set = set()
    for b in manifest["batch_ids"]:
        bdir = f"{table_dir}/_batch_id={b}"
        names = sorted(
            n for n in fs.listdir(bdir) if n.endswith(".parquet")
        )
        if not names:
            continue
        path = f"{bdir}/{names[0]}"
        local = fs.local_path(path)
        src = local if local is not None else fs.open(path, "rb")
        seen |= set(pq.read_schema(src).names)
        if local is None:
            src.close()
        if declared <= seen:
            return
    missing = sorted(declared - seen)
    if missing:
        raise ValueError(
            f"manifest stream source: declared columns {missing} appear "
            f"in NO committed batch file of {table_dir} "
            "(strictSchemaCheck=true) — fix the declared schema, or "
            "drop the option to read never-carried columns as typed "
            "nulls (mergeSchema semantics)"
        )


class _ParquetFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        # Python DataSource options arrive lower-cased
        self.table_dir = options["path"].rstrip("/")
        self.fs = get_backend(self.table_dir)
        self.ignore_deletes = (
            str(options.get("ignoredeletes", "false")).lower() == "true"
        )
        self.skip_change_commits = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        if self.ignore_deletes and self.skip_change_commits:
            raise ValueError(
                "manifest_stream: ignoreDeletes and skipChangeCommits "
                "are mutually exclusive — the first emits a change "
                "commit's raw inserts (masks not applied), the second "
                "skips the commit whole; pick the semantics you mean"
            )
        # startingVersion=N tails INCLUSIVE of N (Delta parity): the
        # offset baseline is N-1, whose ids are treated as already
        # seen. startingTimestamp=T resolves to the first version whose
        # manifest mtime >= T (O(log versions) probes) and tails from
        # there. Absent both -> baseline -1 + snapshot mode (first
        # batch = current snapshot). N=0 is the whole-log replay.
        sv_opt = options.get("startingversion")
        st_opt = options.get("startingtimestamp")
        if sv_opt is not None and st_opt is not None:
            raise ValueError(
                "manifest_stream: startingVersion and startingTimestamp "
                "are mutually exclusive (Delta parity) — pick one"
            )
        if st_opt is not None:
            n = resolve_starting_timestamp(
                self.fs, self.table_dir, _parse_timestamp(st_opt)
            )
            self.starting = n - 1
            self.snapshot_mode = False
        elif sv_opt is None:
            self.starting = -1
            self.snapshot_mode = True
        else:
            n = int(sv_opt)
            if n < 0:
                raise ValueError(
                    f"manifest_stream: startingVersion={n} — versions "
                    "start at 0; omit the option for initial-snapshot "
                    "semantics"
                )
            self.starting = n - 1
            self.snapshot_mode = False
        # admission control (the maxFilesPerTrigger analog): bound how
        # many commit-log versions / how many committed bytes one
        # micro-batch may span while the query runs, so a stream on a
        # hot table never falls unbounded behind its own sink.
        # 0/absent = unlimited. The caps engage only AFTER the first
        # planned batch reveals the authoritative start offset: this
        # API's latestOffset() never sees the checkpoint-restored
        # offset, so capping from a guessed floor could return an
        # offset BELOW the restored one and stall (or regress) the
        # stream — the first trigger after any (re)start is therefore
        # uncapped, same size as an initial snapshot.
        self.max_versions = int(options.get("maxversionspertrigger", 0))
        self.max_bytes = int(options.get("maxbytespertrigger", 0))
        self.strict_schema = (
            str(options.get("strictschemacheck", "false")).lower() == "true"
        )
        self._strict_checked = False
        self._floor: int | None = None  # authoritative once partitions() runs
        self.schema = schema

    # ---- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        v = _latest_version(self.fs, self.table_dir)
        if v is None:
            return {"version": self.starting}
        if self._floor is None:
            return {"version": v}
        if self.max_versions > 0:
            v = min(v, self._floor + self.max_versions)
        if self.max_bytes > 0 and v > self._floor:
            v = _byte_capped_end(
                self.fs, self.table_dir, self._floor, v, self.max_bytes
            )
        return {"version": v}

    # ---- planning (driver, metadata-only) -----------------------------
    def _manifest_loud(self, version: int) -> dict:
        try:
            return _read_manifest_json(self.fs, self.table_dir, version)
        except FileNotFoundError:
            raise ValueError(
                f"manifest_stream: manifest v{version} of "
                f"{self.table_dir} no longer exists — the stream fell "
                "behind the table's vacuum retention. Widen "
                "keep_versions or restart from a fresh checkpoint."
            ) from None

    def _ids_at(self, version: int) -> tuple[set, set]:
        if version < 0:
            return set(), set()
        m = self._manifest_loud(version)
        return set(m["batch_ids"]), set(m.get("delete_ids") or [])

    def _refuse_deletes(self, sv: int, ev: int, dels: set) -> None:
        raise ValueError(
            f"manifest_stream: versions {sv}->{ev} of {self.table_dir} "
            f"carry equality deletes {sorted(dels)}; an append-only "
            "stream cannot represent retractions. Read the change feed "
            "(manifest_cdf_stream / manifest.snapshot_diff) instead, or "
            "set ignoreDeletes=true to stream raw inserts only (delete "
            "masks NOT applied)."
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
        if self.strict_schema and not self._strict_checked:
            # one manifest GET: _manifest_loud both probes retention
            # (the descriptive vacuum error) and feeds the validation
            validate_declared_columns(
                self.fs, self.table_dir, self._manifest_loud(ev), self.schema
            )
            self._strict_checked = True
        if sv < 0 and self.snapshot_mode:
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
        # GC'd inside one interval must still refuse. (sv < 0 here is
        # startingVersion=0: an empty baseline walked the same way.)
        seen, dels_seen = self._ids_at(sv)
        emit: list[int] = []
        for v in range(max(sv + 1, 0), ev + 1):
            ids_v, dels_v = self._ids_at(v)
            new_dels = dels_v - dels_seen
            if new_dels and self.skip_change_commits:
                # CHANGE commit (Delta skipChangeCommits): skip the
                # version WHOLE — the inserts committed beside the
                # deletes are an upsert's updated rows, not appends, so
                # emitting them without the retractions would be wrong;
                # mark them seen so no later step re-emits them
                dels_seen |= dels_v
                seen |= ids_v
                continue
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
            bdir = f"{self.table_dir}/_batch_id={b}"
            files = sorted(
                f"{bdir}/{n}"
                for n in self.fs.listdir(bdir)
                if n.endswith(".parquet")
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
        for rb in _read_evolved_batches(
            self.fs, partition.path, self.schema
        ):
            yield rb

    def commit(self, end: dict) -> None:
        # offsets live in the engine's checkpoint; the admission-control
        # floor advances in partitions() (commit() callbacks are not
        # guaranteed to reach the planning worker), so belt-and-braces
        v = end["version"]
        self._floor = max(v, self._floor if self._floor is not None else v)


def _read_evolved_batches(
    fs: StorageBackend, path: str, schema: StructType
):
    """Read one parquet file column-pruned to `schema`, tolerating
    ADDITIVE schema evolution: declared columns missing from the file
    (written before the column existed) come back as typed nulls, and
    present columns are cast to the declared arrow types. Yields
    RecordBatches so rows never round-trip through Python objects."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    declared = to_arrow_schema(schema)
    names = declared.names
    local = fs.local_path(path)
    src = local if local is not None else fs.open(path, "rb")
    pf = pq.ParquetFile(src)
    in_file = [n for n in names if n in pf.schema_arrow.names]
    try:
        # iter_batches, NOT pf.read(): the whole-file read materialized
        # an arbitrarily large file as one Table before the first batch
        # left the reader — peak executor memory was bounded only by
        # file sizing. Streaming decodes a bounded batch at a time
        # (row-group granularity), same rows in the same order; both
        # consumers (scan read() and the CDF mask paths) already work
        # batch-at-a-time.
        for rb in pf.iter_batches(columns=in_file):
            cols = []
            for field in declared:
                if field.name in in_file:
                    cols.append(rb.column(field.name).cast(field.type))
                else:
                    cols.append(pa.nulls(rb.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=declared)
    finally:
        if local is None:
            src.close()


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
