"""Python DataSource API (Spark 4.0) — a custom source implemented in
pure Python that still participates in Spark's planning: it declares a
schema, splits itself into input partitions, and each partition is read
by a separate task.

The reference's only extensibility point was "connect to another RDBMS"
(db_utils.py:119-165, a dict of two hard-coded drivers). The Python
DataSource API is the Spark-native generalization: any Python-reachable
system (internal REST service, proprietary file format, synthetic
generator) becomes a first-class `spark.read.format(...)` with partition
parallelism, without touching the JVM.

This module ships a deterministic synthetic-sequence source used by the
`python_datasource_scan` operator: row i = (i, knuth_hash(i)) — exactly
reproducible in ANSI SQL, so the whole source is oracle-checkable.

Scale notes:
- `partitions()` is the contract that makes a Python source scale: N
  input partitions → N parallel tasks, each streaming its own slice.
  A source that returns one partition serializes the whole read.
- Rows stream from Python via Arrow batches; still, a Python source is
  the slow path vs a JVM scan — use it for systems Spark can't reach
  natively, not for formats parquet/orc/csv already cover.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

KNUTH = 2654435761  # Knuth multiplicative hash constant
MOD = 4294967296  # 2^32


class RangeSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticSeqReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))  # ceil div
        return [
            RangeSlice(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: RangeSlice):
        for i in range(partition.start, partition.end):
            yield (i, (i * KNUTH) % MOD)


class SyntheticSeqDataSource(DataSource):
    """`spark.read.format("synthetic_seq").option("n", ...).load()`"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_seq"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def reader(self, schema) -> SyntheticSeqReader:
        return SyntheticSeqReader(self.options)


def register_synthetic_seq(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    try:
        spark.dataSource.register(SyntheticSeqDataSource)
    except Exception:
        pass  # already registered on this session


# ---------------------------------------------------------------------------
# Write-side seam: a pure-Python sink that participates in Spark's
# commit protocol (per-task write -> commit message -> job-level commit,
# with abort cleanup). The Spark-native generalization of "push results
# to any Python-reachable system" (REST ingest, message bus, bespoke
# format) — the write twin of the reader above.
# ---------------------------------------------------------------------------

import os
import uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class CsvLinesWriter(DataSourceWriter):
    """One CSV file per task written to a staging name, renamed into the
    manifest only at job commit — tasks that never commit leave only
    unreferenced staging files (cleaned by abort)."""

    def __init__(self, options: dict, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        name = f"part-{uuid.uuid4().hex}.csv"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                f.write(",".join("" if v is None else str(v) for v in row) + "\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages):
        if self.overwrite:
            # honor mode("overwrite"): drop every part file from prior
            # jobs so only this job's output remains (new names are
            # uuid-unique, so the committed set is exactly `messages`)
            keep = {m.path for m in messages}
            for name in os.listdir(self.path):
                if (
                    name.startswith("part-")
                    and name.endswith(".csv")
                    and name not in keep
                ):
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass
        manifest = os.path.join(self.path, "_MANIFEST")
        with open(manifest, "w") as f:
            for m in messages:
                f.write(f"{m.path},{m.n_rows}\n")

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.path))
            except OSError:
                pass


class CsvLinesDataSource(DataSource):
    """`df.write.format("csv_lines").option("path", dir).mode("append").save()`"""

    @classmethod
    def name(cls) -> str:
        return "csv_lines"

    def writer(self, schema, overwrite: bool) -> CsvLinesWriter:
        return CsvLinesWriter(self.options, overwrite=overwrite)


def register_csv_lines(spark) -> None:
    """Idempotent registration of the custom sink on a session."""
    try:
        spark.dataSource.register(CsvLinesDataSource)
    except Exception:
        pass  # already registered on this session


# ---------------------------------------------------------------------------
# Streaming seam: the same deterministic synthetic sequence as a
# STRUCTURED STREAMING source (SimpleDataSourceStreamReader, Spark 4) —
# a pure-Python source that participates in the offset/commit protocol:
# initialOffset -> read(start) -> (rows, nextOffset), with
# readBetweenOffsets for failure replay. The Spark-native generalization
# of "tail any Python-reachable system" (message bus, REST poll, bespoke
# WAL) without a JVM connector.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SyntheticTickStreamReader(SimpleDataSourceStreamReader):
    """Deterministic bounded tick stream: row i = (i, knuth_hash(i)),
    `batchSize` rows per microbatch, stops advancing at `limit` (so
    availableNow/processAllAvailable drains and terminates). The rows
    between two offsets are a pure function of the offsets — exactly
    the replayability contract Spark's checkpoint recovery requires."""

    def __init__(self, options: dict):
        self.batch = int(options.get("batchSize", 100))
        self.limit = int(options.get("limit", 1000))

    def initialOffset(self):
        return {"off": 0}

    def read(self, start: dict):
        s = int(start["off"])
        e = min(s + self.batch, self.limit)
        return (self._rows(s, e), {"off": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["off"]), int(end["off"]))

    @staticmethod
    def _rows(s: int, e: int):
        return iter([(i, (i * KNUTH) % MOD) for i in range(s, e)])


class SyntheticTickStreamSource(DataSource):
    """`spark.readStream.format("synthetic_ticks")...load()`"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def simpleStreamReader(self, schema) -> SyntheticTickStreamReader:
        return SyntheticTickStreamReader(self.options)


def register_synthetic_ticks(spark) -> None:
    """Idempotent registration of the streaming source on a session."""
    try:
        spark.dataSource.register(SyntheticTickStreamSource)
    except Exception:
        pass  # already registered on this session
