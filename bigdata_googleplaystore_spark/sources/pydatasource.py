"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`): a
deterministic synthetic-document generator, registered as a real
`spark.read.format(...)` source.

Demonstrates the API surface a connector to a bespoke system would use:
schema declaration, option handling, and — the part that matters at
100 TB — an explicit `partitions()` plan so the scan parallelizes across
executors instead of funneling through one python worker. Rows are a
pure function of (row id), so any partitioning of the id space yields
the same table: re-reads, retries, and repartitioned reads agree.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _row(i: int):
    h = hashlib.md5(f"docgen:{i}".encode()).hexdigest()
    # 8 deterministic pseudo-words derived from the id hash
    words = [h[j : j + 4] for j in range(0, 32, 4)]
    return i, " ".join(words), int(h[:8], 16) % 1000


class DocGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _IdRange(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield _row(i)


class DocGenSource(DataSource):
    """`spark.read.format("docgen").option("rows", N).load()`"""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return "id BIGINT, text STRING, score BIGINT"

    def reader(self, schema: StructType) -> DataSourceReader:
        return DocGenReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return DocGenStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(DocGenSource)


class DocGenStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader: each micro-batch emits the next
    `batch_rows` ids. Offsets are plain dicts checkpointed by the engine,
    so a restarted query resumes exactly where it stopped — the custom
    connector inherits Structured Streaming's exactly-once offset
    tracking for free. Rows are the same pure function of id as the
    batch reader: stream-drained content == batch content."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batchRows", 100))
        self.max_rows = int(options.get("rows", 1000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.max_rows)
        end = {"next": hi}
        return iter([_row(i) for i in range(lo, hi)]), end

    def readBetweenOffsets(self, start, end):
        return iter([_row(i) for i in range(start["next"], end["next"])])

    def commit(self, end):
        pass


class JsonlWriter(DataSourceWriter):
    """Writer half of the connector API: each task serializes its
    partition to one JSON-lines file under a temp name, returns the path
    as its commit message, and the DRIVER-side commit() renames the
    complete set into place — the two-phase commit every sane distributed
    sink uses (task retries overwrite their own temp file; a failed job
    leaves no visible output). `spark.read.json` round-trips the result.
    """

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docgen writer requires .option('path', ...)")
        self.fields = [f.name for f in schema.fields]

    def write(self, rows) -> WriterCommitMessage:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{pid}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in rows:
                f.write(json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        msg = WriterCommitMessage()
        msg.tmp_path = tmp
        msg.part = pid
        msg.rows = n
        return msg

    def commit(self, messages) -> None:
        import os

        for m in messages:
            final = os.path.join(self.path, f"part-{m.part:05d}.jsonl")
            os.replace(m.tmp_path, final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m and getattr(m, "tmp_path", None) and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
