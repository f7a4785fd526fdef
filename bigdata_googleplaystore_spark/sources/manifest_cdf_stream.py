"""Change-data-feed STREAMING source over a manifest-committed table —
the retraction-capable twin of `manifest_stream`: where that source
REFUSES versions that commit equality deletes (an append-only stream
cannot represent them), this one emits them, tagging every row with
`_change_type` ('insert' | 'delete'), the public Delta
`readChangeFeed` streaming design.

Semantics, stated precisely (they compose `manifest.snapshot_diff`'s
per-version-step logic, evaluated at PLANNING time):

- The tail walks EVERY intermediate version. Step v-1 -> v emits
  - 'insert' rows for each batch id added at v (masked by v's delete
    groups applicable to that batch — an upsert's own cutoff delete
    never eats the rows committed alongside it), and
  - 'delete' rows for each delete group added at v: the rows of
    v-1's VISIBLE snapshot (each prior batch, minus v-1's applicable
    masks) that match the new group's keys.
- Delete applicability is BATCH-level, because a row's `_seq` is its
  batch's ingestion sequence (`manifest._effective_seq`) — so every
  mask decision resolves at planning time from two manifest JSONs,
  and executors only ever see (file, key-set) pairs. Key files ride
  the partition objects; they are broadcast-small by the same design
  premise the batch CDF's broadcast joins rest on.
- COMPACTION steps (a negative id appears) emit NOTHING and the
  stream keeps running: a compaction rewrites the same logical rows
  (its applied deletes were emitted as 'delete' rows when THEIR
  versions landed), so there is no change data in the step. This is
  deliberately more useful than the batch `snapshot_diff`, which must
  refuse endpoint diffs spanning a rewrite because it cannot
  attribute per-version changes across one.
- `_change_type` values are 'insert' and 'delete' only: an upsert
  surfaces as delete(old)+insert(new) rather than Delta's
  update_preimage/update_postimage pair — the manifest protocol
  stores upserts physically as batch+delete, and pairing the two back
  into update images would need a key-equality join the source tier
  deliberately doesn't do (consumers that need it join on their key).
- Two divergences from the batch feed, both documented trades:
  (a) a row inserted and deleted WITHIN one batch-feed window emits
  as insert-then-delete here (net-equivalent; a streaming CDF is a
  log, not a window diff); (b) 'delete' rows deduplicate per file,
  not globally — a physically duplicated row visible in multiple
  files emits one delete row per containing file.

Option contract mirrors `manifest_stream`: absent `startingVersion`
the first micro-batch is the CURRENT snapshot as 'insert' rows (the
Delta CDF initial-snapshot contract), `startingVersion=N` replays
changes inclusive of version N, `maxVersionsPerTrigger` /
`maxBytesPerTrigger` bound catch-up (bytes count the new data
batches' recorded `_bytes` stat — delete key files are kilobyte-scale
and uncounted; first post-restart trigger uncapped, same floor
discipline).
The declared schema must contain a `_change_type` string column and
may contain a `_commit_version` long column (Delta CDF parity): when
declared, every row carries the commit version its change belongs to
(the initial snapshot stamps its endpoint version), which is what
lets a consumer ORDER changes inside a multi-version catch-up trigger
— apply-to-replica flows are ambiguous without it. The remaining
columns read the data files with the same additive-schema-evolution
tolerance as `manifest_stream` (missing columns -> typed nulls). All
storage I/O routes through `sources/storage.py`.

Reference parity: §2.7 streaming extension tier (the reference's only
streaming surface is console output, challenge.scala C:26-44).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .manifest_stream import (
    _byte_capped_end,
    _latest_version,
    _read_evolved_batches,
    _read_manifest_json,
)
from .storage import StorageBackend, get_backend

CHANGE_COL = "_change_type"
VERSION_COL = "_commit_version"
DELETE_DIR = "_deletes"


def _effective_seq(batch_id: int) -> int:
    # manifest._effective_seq, restated here so the connector tier has
    # no operator-tier (JVM/Hadoop-FS) import
    return batch_id if batch_id >= 0 else -batch_id - 1


def _applies(cutoff, batch_id: int) -> bool:
    """Does a delete group with this cutoff mask rows of `batch_id`?"""
    return cutoff is None or _effective_seq(batch_id) <= int(cutoff)


def _load_keys(fs: StorageBackend, table_dir: str, delete_ids: list[int]):
    """One pandas key frame for a delete group — driver-side, key files
    are broadcast-small by design (see module doc)."""
    import pyarrow.parquet as pq

    frames = []
    for d in sorted(delete_ids):
        ddir = f"{table_dir}/{DELETE_DIR}/d{d:08d}"
        for n in fs.listdir(ddir):
            if not n.endswith(".parquet"):
                continue
            path = f"{ddir}/{n}"
            local = fs.local_path(path)
            src = local if local is not None else fs.open(path, "rb")
            frames.append(pq.read_table(src).to_pandas())
            if local is None:
                src.close()
    import pandas as pd

    out = pd.concat(frames, ignore_index=True) if frames else None
    if out is None:
        raise ValueError(
            f"manifest_cdf_stream: delete group {delete_ids} of "
            f"{table_dir} has no key files on disk — vacuumed past this "
            "stream's offset; restart from a fresh checkpoint"
        )
    return out.drop_duplicates()


class _CDFPartition(InputPartition):
    """One data file plus its planning-time-resolved masks.

    kind='insert': emit the file's rows minus `exclude` key frames.
    kind='delete': emit the file's rows minus `exclude` (the visible-
    before masks), intersected with `match` (the new delete groups'
    keys), deduplicated per file. `version` = the commit the change
    belongs to (the initial snapshot carries its endpoint version)."""

    def __init__(self, path, kind, exclude, match=None, version=None):
        self.path = path
        self.kind = kind
        self.exclude = exclude  # list[pandas key frames]
        self.match = match or []
        self.version = version


class ManifestCDFStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.table_dir = options["path"].rstrip("/")
        self.fs = get_backend(self.table_dir)
        if CHANGE_COL not in schema.fieldNames():
            raise ValueError(
                f"manifest_cdf_stream requires a `{CHANGE_COL} string` "
                "column in the declared schema — it carries the feed's "
                "insert/delete tag"
            )
        sv_opt = options.get("startingversion")
        if sv_opt is None:
            self.starting = -1
            self.snapshot_mode = True
        else:
            n = int(sv_opt)
            if n < 0:
                raise ValueError(
                    f"manifest_cdf_stream: startingVersion={n} — versions "
                    "start at 0; omit the option for initial-snapshot "
                    "semantics"
                )
            self.starting = n - 1
            self.snapshot_mode = False
        self.max_versions = int(options.get("maxversionspertrigger", 0))
        self.max_bytes = int(options.get("maxbytespertrigger", 0))
        self._floor: int | None = None
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
            # byte admission counts NEW data batches' recorded `_bytes`
            # (the insert volume); delete key files are kilobyte-scale
            # and uncounted — pacing, not accounting
            v = _byte_capped_end(
                self.fs, self.table_dir, self._floor, v, self.max_bytes
            )
        return {"version": v}

    def commit(self, end: dict) -> None:
        v = end["version"]
        self._floor = max(v, self._floor if self._floor is not None else v)

    # ---- planning (driver, metadata + key files only) ------------------
    def _manifest(self, version: int) -> dict:
        try:
            return _read_manifest_json(self.fs, self.table_dir, version)
        except FileNotFoundError:
            raise ValueError(
                f"manifest_cdf_stream: manifest v{version} of "
                f"{self.table_dir} no longer exists — the stream fell "
                "behind the table's vacuum retention. Widen keep_versions "
                "or restart from a fresh checkpoint."
            ) from None

    def _groups(self, m: dict) -> list[tuple[object, list[int]]]:
        """(cutoff, delete_ids) groups of a manifest, snapshot_diff's
        grouping restated metadata-side."""
        from collections import defaultdict

        cutoffs = m.get("delete_cutoffs") or {}
        groups: dict[object, list[int]] = defaultdict(list)
        for d in m.get("delete_ids") or []:
            groups[cutoffs.get(str(d))].append(d)
        return list(groups.items())

    def _data_files(self, batch_id: int) -> list[str]:
        bdir = f"{self.table_dir}/_batch_id={batch_id}"
        files = sorted(
            f"{bdir}/{n}"
            for n in self.fs.listdir(bdir)
            if n.endswith(".parquet")
        )
        if not files:
            raise ValueError(
                f"manifest_cdf_stream: batch {batch_id} of "
                f"{self.table_dir} has no files on disk — vacuumed past "
                "this stream's offset; restart from a fresh checkpoint"
            )
        return files

    def _keys_cached(self, ds: list[int], memo: dict):
        """Per-plan memo over delete-group key frames: a group's key
        file is read ONCE per partitions() call however many batches it
        applies to — without this, one new delete over a B-batch table
        costs O(B) re-reads of the same kilobyte parquet at planning."""
        k = tuple(ds)
        if k not in memo:
            memo[k] = _load_keys(self.fs, self.table_dir, list(ds))
        return memo[k]

    def _mask_frames(self, m: dict, batch_id: int, memo: dict) -> list:
        """Key frames of m's delete groups applicable to `batch_id`."""
        return [
            self._keys_cached(ds, memo)
            for cutoff, ds in self._groups(m)
            if _applies(cutoff, batch_id)
        ]

    def _insert_parts(
        self, m: dict, batch_ids: list[int], memo: dict, version: int
    ) -> list[_CDFPartition]:
        parts = []
        for b in sorted(batch_ids):
            masks = self._mask_frames(m, b, memo)
            parts += [
                _CDFPartition(f, "insert", masks, version=version)
                for f in self._data_files(b)
            ]
        return parts

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        sv, ev = start["version"], end["version"]
        self._floor = max(ev, self._floor if self._floor is not None else ev)
        if ev <= sv:
            return []
        memo: dict = {}
        if sv < 0 and self.snapshot_mode:
            # initial snapshot: the CURRENT visible rows, all 'insert'
            m = self._manifest(ev)
            return self._insert_parts(m, m["batch_ids"], memo, ev)
        parts: list[InputPartition] = []
        m_prev = self._manifest(sv) if sv >= 0 else {
            "version": -1, "batch_ids": [], "delete_ids": [],
        }
        for v in range(max(sv + 1, 0), ev + 1):
            m_v = self._manifest(v)
            prev_ids = set(m_prev["batch_ids"])
            new_ids = set(m_v["batch_ids"]) - prev_ids
            new_dels = set(m_v.get("delete_ids") or []) - set(
                m_prev.get("delete_ids") or []
            )
            if any(b < 0 for b in new_ids):
                # compaction step: a rewrite of rows already emitted
                # (its applied deletes were emitted at their own
                # versions) — no change data; skip and keep streaming
                m_prev = m_v
                continue
            # deletes FIRST: they retract from the pre-step snapshot
            if new_dels:
                cutoffs_v = m_v.get("delete_cutoffs") or {}
                from collections import defaultdict

                ngroups: dict[object, list[int]] = defaultdict(list)
                for d in sorted(new_dels):
                    ngroups[cutoffs_v.get(str(d))].append(d)
                for b in sorted(prev_ids):
                    match = [
                        self._keys_cached(ds, memo)
                        for cutoff, ds in ngroups.items()
                        if _applies(cutoff, b)
                    ]
                    if not match:
                        continue
                    exclude = self._mask_frames(m_prev, b, memo)
                    parts += [
                        _CDFPartition(
                            f, "delete", exclude, match, version=v
                        )
                        for f in self._data_files(b)
                    ]
            if new_ids:
                parts += self._insert_parts(m_v, sorted(new_ids), memo, v)
            m_prev = m_v
        return parts

    # ---- execution (executors, arrow-batched) -------------------------
    def read(self, partition: _CDFPartition):
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        declared = to_arrow_schema(self.schema)
        data_schema = StructType(
            [
                f
                for f in self.schema.fields
                if f.name not in (CHANGE_COL, VERSION_COL)
            ]
        )

        def tag_cols(n: int) -> dict:
            return {
                CHANGE_COL: pa.array([partition.kind] * n, pa.string()),
                VERSION_COL: pa.array([partition.version] * n, pa.int64()),
            }

        if partition.kind == "insert" and not partition.exclude:
            # the HOT path: an unmasked insert file (the overwhelming
            # majority of a real feed's volume) streams arrow-to-arrow
            # — no pandas materialization, constant tag columns appended
            # per RecordBatch
            for rb in _read_evolved_batches(
                self.fs, partition.path, data_schema
            ):
                tags = tag_cols(rb.num_rows)
                cols = [
                    tags[f.name] if f.name in tags else rb.column(f.name)
                    for f in declared
                ]
                yield pa.RecordBatch.from_arrays(cols, schema=declared)
            return
        table = pa.Table.from_batches(
            list(_read_evolved_batches(self.fs, partition.path, data_schema))
        )
        pdf = table.to_pandas()

        def matched(df, keys):
            merged = df.merge(
                keys, on=list(keys.columns), how="left", indicator=True
            )
            return (merged["_merge"] == "both").to_numpy()

        for keys in partition.exclude:
            if len(pdf):
                pdf = pdf[~matched(pdf, keys)]
        if partition.kind == "delete":
            import numpy as np

            if len(pdf):
                hit = np.zeros(len(pdf), dtype=bool)
                for keys in partition.match:
                    hit |= matched(pdf, keys)
                pdf = pdf[hit]
            try:
                pdf = pdf.drop_duplicates()
            except TypeError:
                pass  # unhashable cell types (arrays): emit as-is
        out_cols = []
        for field in declared:
            if field.name == CHANGE_COL:
                out_cols.append(
                    pa.array([partition.kind] * len(pdf), pa.string())
                )
            elif field.name == VERSION_COL:
                out_cols.append(
                    pa.array([partition.version] * len(pdf), pa.int64())
                )
            else:
                out_cols.append(
                    pa.Array.from_pandas(pdf[field.name], type=field.type)
                )
        out = pa.Table.from_arrays(out_cols, schema=declared)
        for rb in out.to_batches():
            yield rb


class ManifestCDFStreamSource(DataSource):
    """`spark.readStream.format("manifest_cdf_stream")
    .option("path", dir).schema(... , _change_type string)`."""

    @classmethod
    def name(cls) -> str:
        return "manifest_cdf_stream"

    def schema(self):
        raise ValueError(
            "manifest_cdf_stream requires an explicit .schema(...) "
            "including a `_change_type string` column"
        )

    def streamReader(self, schema: StructType) -> ManifestCDFStreamReader:
        return ManifestCDFStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(ManifestCDFStreamSource)
