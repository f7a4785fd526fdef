"""Randomized MODEL TEST for the CDF streaming source: over arbitrary
interleavings of append / plain-delete / upsert commits, the drained
change feed must FOLD back to the table's visible snapshot — the
invariant that makes a change feed trustworthy for replication/IVM:

    fold(changes) == visible(snapshot)

checked three ways per random log:
- unpaired feed (insert +1 / delete -1), drained version-by-version
  (the maxVersionsPerTrigger=1 shape);
- unpaired feed drained as ONE whole-log plan (multi-version catch-up
  trigger) — must equal the per-step drain row-for-row;
- PAIRED feed (keyColumns=k: update_preimage -1 / update_postimage +1
  alongside insert/delete) — same fold, exercising the r12 pairing on
  every upsert including never-present keys (postimage with no
  preimage still folds correctly: nothing was retracted because
  nothing was visible).

Pure driver-side over the memory:// backend (pyarrow only, no Spark
session), so dozens of random logs run in seconds. The visibility
model restates the manifest protocol's mask rules (plain delete masks
past AND future via cutoff None; an upsert's delete masks only
sequence <= cutoff). Compaction is deliberately excluded here — the
CDF emits nothing for it, pinned separately in tests/test_manifest.py.
"""

from __future__ import annotations

import io
import json
import random
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdata_googleplaystore_spark.sources import manifest_cdf_stream as mc
from bigdata_googleplaystore_spark.sources import manifest_stream as ms
from bigdata_googleplaystore_spark.sources import storage

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("v", DoubleType()),
        StructField("_change_type", StringType()),
        StructField("_commit_version", LongType()),
    ]
)


class _Log:
    """Builds the memory:// table while tracking the pure model."""

    def __init__(self, mem, tbl: str):
        self.mem, self.tbl = mem, tbl
        self.batch_ids: list[int] = []
        self.delete_ids: list[int] = []
        self.cutoffs: dict[str, int] = {}
        self.rows: list[tuple[int, int, float]] = []  # (seq, k, v)
        self.masks: list[tuple[set, int | None]] = []
        self.version = -1
        self.next_batch = 0
        self.next_delete = 0
        self.append_batches: list[tuple[int, dict]] = []  # pure appends

    def _commit(self) -> None:
        self.version += 1
        self.mem.put(
            f"{self.tbl}/_manifests/v{self.version:012d}.json",
            json.dumps(
                {
                    "version": self.version,
                    "batch_ids": sorted(self.batch_ids),
                    "delete_ids": sorted(self.delete_ids),
                    "delete_cutoffs": self.cutoffs,
                }
            ).encode(),
        )

    def _write_batch(self, kv: dict[int, float]) -> int:
        b = self.next_batch
        self.next_batch += 1
        buf = io.BytesIO()
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(sorted(kv), pa.int64()),
                    "v": pa.array([kv[k] for k in sorted(kv)]),
                }
            ),
            buf,
        )
        self.mem.put(f"{self.tbl}/_batch_id={b}/part-0.parquet", buf.getvalue())
        self.batch_ids.append(b)
        self.rows += [(b, k, v) for k, v in kv.items()]
        return b

    def _write_delete(self, keys: set, cutoff: int | None) -> None:
        d = self.next_delete
        self.next_delete += 1
        buf = io.BytesIO()
        pq.write_table(
            pa.table({"k": pa.array(sorted(keys), pa.int64())}), buf
        )
        self.mem.put(
            f"{self.tbl}/_deletes/d{d:08d}/part-0.parquet", buf.getvalue()
        )
        self.delete_ids.append(d)
        if cutoff is not None:
            self.cutoffs[str(d)] = cutoff
        self.masks.append((set(keys), cutoff))

    def append(self, kv: dict[int, float]) -> None:
        b = self._write_batch(kv)
        self.append_batches.append((b, dict(kv)))
        self._commit()

    def plain_delete(self, keys: set) -> None:
        self._write_delete(keys, None)
        self._commit()

    def upsert(self, kv: dict[int, float]) -> None:
        cutoff = max(self.batch_ids, default=-1)
        self._write_batch(kv)
        self._write_delete(set(kv), cutoff)
        self._commit()

    def visible(self) -> Counter:
        out: Counter = Counter()
        for seq, k, v in self.rows:
            masked = any(
                k in keys and (cut is None or seq <= cut)
                for keys, cut in self.masks
            )
            if not masked:
                out[(k, round(v, 6))] += 1
        return out


def _drain(reader, steps) -> list[tuple]:
    rows = []
    for sv, ev in steps:
        for p in reader.partitions({"version": sv}, {"version": ev}):
            for rb in reader.read(p):
                t = pa.Table.from_batches([rb])
                rows += list(
                    zip(
                        t.column("k").to_pylist(),
                        t.column("v").to_pylist(),
                        t.column("_change_type").to_pylist(),
                        t.column("_commit_version").to_pylist(),
                    )
                )
    return rows


def _fold(rows) -> Counter:
    out: Counter = Counter()
    for k, v, ct, _ in rows:
        out[(k, round(v, 6))] += (
            1 if ct in ("insert", "update_postimage") else -1
        )
    # an over-emitted delete must FAIL, not vanish in Counter truncation
    assert all(n >= 0 for n in out.values()), f"negative fold: {+(-out)}"
    return +out  # drop exact-zero entries


def test_cdf_feed_folds_to_snapshot_over_random_logs():
    rng = random.Random(12)
    mem = storage.get_backend("memory://cdfmodel")
    for trial in range(25):
        mem.clear()
        log = _Log(mem, "memory://cdfmodel")
        # first commit is always an append so the log is never empty
        log.append({k: rng.random() for k in rng.sample(range(40), 8)})
        for _ in range(rng.randint(2, 8)):
            op = rng.random()
            keys = rng.sample(range(40), rng.randint(1, 6))
            if op < 0.5:
                log.append({k: rng.random() for k in keys})
            elif op < 0.75:
                log.plain_delete(set(keys))
            else:
                # upserts may hit never-present keys on purpose
                log.upsert({k: rng.random() for k in keys})
        expect = log.visible()
        per_step = [(v - 1, v) for v in range(log.version + 1)]
        whole = [(-1, log.version)]
        # unpaired, version-by-version
        r1 = mc.ManifestCDFStreamReader(
            SCHEMA, {"path": log.tbl, "startingversion": "0"}
        )
        rows1 = _drain(r1, per_step)
        assert _fold(rows1) == expect, f"trial {trial}: per-step fold"
        # unpaired, one whole-log catch-up plan — identical rows
        r2 = mc.ManifestCDFStreamReader(
            SCHEMA, {"path": log.tbl, "startingversion": "0"}
        )
        rows2 = _drain(r2, whole)
        assert sorted(rows1) == sorted(rows2), f"trial {trial}: step==whole"
        # paired: preimage/postimage fold to the same snapshot
        r3 = mc.ManifestCDFStreamReader(
            SCHEMA,
            {"path": log.tbl, "startingversion": "0", "keycolumns": "k"},
        )
        rows3 = _drain(r3, per_step)
        assert _fold(rows3) == expect, f"trial {trial}: paired fold"
        # pairing only relabels upsert steps: the signed fold per
        # (key, value, version) must match the unpaired feed exactly
        sgn = lambda ct: 1 if ct in ("insert", "update_postimage") else -1
        assert sorted(
            (k, round(v, 6), cv, sgn(ct)) for k, v, ct, cv in rows3
        ) == sorted(
            (k, round(v, 6), cv, sgn(ct)) for k, v, ct, cv in rows1
        ), f"trial {trial}: paired==unpaired modulo labels"
        # append-only source with skipChangeCommits: exactly the
        # pure-append versions' rows, change commits skipped whole
        app_schema = StructType(
            [StructField("k", LongType()), StructField("v", DoubleType())]
        )
        r4 = ms.ManifestStreamReader(
            app_schema,
            {
                "path": log.tbl,
                "startingversion": "0",
                "skipchangecommits": "true",
            },
        )
        got: Counter = Counter()
        for p in r4.partitions({"version": -1}, {"version": log.version}):
            for rb in r4.read(p):
                t = pa.Table.from_batches([rb])
                got.update(
                    zip(
                        t.column("k").to_pylist(),
                        (round(v, 6) for v in t.column("v").to_pylist()),
                    )
                )
        want: Counter = Counter()
        for _, kv in log.append_batches:
            want.update((k, round(v, 6)) for k, v in kv.items())
        assert got == want, f"trial {trial}: skipChangeCommits appends"
    mem.clear()
