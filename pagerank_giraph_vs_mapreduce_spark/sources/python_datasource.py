"""Custom connector via Spark 4's Python DataSource API — the extension
point for sources Spark has no built-in reader for (internal services,
bespoke formats, synthetic generators). This one is a deterministic
document generator: every row is a pure function of its id, so the
DuckDB oracle can reproduce the exact table in SQL and the whole
connector path (schema declaration, partition planning, per-partition
iteration, Arrow hand-off) lands in the value hash.

Scale shape: ``partitions()`` splits the id range into equal slices, so
a 1000-executor cluster reads 1000 independent slices with no
coordination — the same contract a real connector (e.g. a sharded
service scan) would implement. Generation is per-row local; nothing
shuffles until the caller aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SYNTH_SCHEMA = "doc_id bigint, text string, grp string"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def synth_row(i: int) -> tuple[int, str, str]:
    """The generator contract, shared with the SQL oracle: text derives
    from the id's residues only (concat + repeat — portable SQL)."""
    return (
        i,
        f"document {i} body " + "ab" * (i % 5),
        f"g{i % 7}",
    )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.slices = int(options.get("slices", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, (self.n + self.slices - 1) // self.slices)
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """The STREAMING face of the same connector: offsets are row ids, a
    micro-batch is the next ``batch`` ids, end-of-data is an empty read
    at the same offset. ``readBetweenOffsets`` regenerates any committed
    range deterministically — the crash-replay contract: a batch
    re-read after failure is bit-identical to its first read (pinned by
    tests/test_python_datasource_stream.py), which is what makes the
    source exactly-once-composable with an idempotent sink."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", 256))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        if i >= self.n:
            return (iter([]), {"i": i})
        end = min(i + self.batch, self.n)
        return (iter([synth_row(j) for j in range(i, end)]), {"i": end})

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([synth_row(j) for j in range(int(start["i"]), int(end["i"]))])


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", N).load()`` —
    or ``spark.readStream`` for the micro-batched face of the same
    generator."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticDocsDataSource)
