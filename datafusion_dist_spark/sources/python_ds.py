"""Custom Python data sources (Spark 4 DataSource API).

The reference implements custom DataFusion ``TableProvider``s: the
``running_jobs`` virtual table (``integration-tests/app/src/table.rs:
14-61``) and in-memory ``MemTable``s (``integration-tests/src/data.rs:
36-92``). Spark's analog for a from-scratch source is the Python
DataSource API — schema + partition planning + per-partition readers,
exactly the DataSource V2 contract, registered per-session.

Two sources:

- ``ddspark_jobs`` — the job-registry virtual table. The registry
  snapshot is passed as a JSON option at read time (the driver-side
  registry is not addressable from executors — same reason the
  reference pins memory-table stages to the submitting node,
  ``dist/src/scheduler.rs:146-175``).
- ``ddspark_synth`` — deterministic synthetic-corpus generator with
  N independent partitions (seeded per partition). The 100 TB story:
  data generation parallelizes like a scan, no files involved.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

JOBS_SCHEMA = "job_id string, created_at_us long, job_meta string, stages string"
SYNTH_SCHEMA = "doc_id long, part_id int, text string, quality double"


class JobsDataSource(DataSource):
    """``running_jobs`` as a first-class data source."""

    @classmethod
    def name(cls) -> str:
        return "ddspark_jobs"

    def schema(self) -> str:
        return JOBS_SCHEMA

    def reader(self, schema) -> "JobsReader":
        return JobsReader(self.options.get("snapshot", "[]"))


class JobsReader(DataSourceReader):
    def __init__(self, snapshot_json: str) -> None:
        self._rows = json.loads(snapshot_json)

    def read(self, partition):
        for r in self._rows:
            yield (
                r["job_id"],
                int(r["created_at_us"]),
                r.get("job_meta", "{}"),
                r.get("stages", "[]"),
            )


def jobs_snapshot_json(entries) -> str:
    """Serialize JobRegistry entries for the ``snapshot`` read option."""
    return json.dumps(
        [
            {
                "job_id": e.job_id,
                "created_at_us": int(e.created_at * 1_000_000),
                "job_meta": json.dumps(e.meta, sort_keys=True),
                "stages": json.dumps(
                    {"status": e.status, "error": e.error}, sort_keys=True
                ),
            }
            for e in entries
        ]
    )


_WORDS = (
    "spark table row column join filter scan window sort hash merge "
    "stream batch vector data key value part group fast slow"
).split()


class SynthPartition(InputPartition):
    def __init__(self, index: int, rows: int, seed: str) -> None:
        self.index = index
        self.rows = rows
        self.seed = seed


class SynthDataSource(DataSource):
    """Deterministic synthetic documents: ``partitions`` independent
    shards of ``rows_per_partition`` rows each, reproducible from
    ``seed`` alone (same contract as a seeded TPC generator)."""

    @classmethod
    def name(cls) -> str:
        return "ddspark_synth"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> "SynthReader":
        return SynthReader(
            partitions=int(self.options.get("partitions", "4")),
            rows=int(self.options.get("rows_per_partition", "100")),
            seed=self.options.get("seed", "0"),
        )


class SynthReader(DataSourceReader):
    def __init__(self, partitions: int, rows: int, seed: str) -> None:
        self._partitions = partitions
        self._rows = rows
        self._seed = seed

    def partitions(self):
        return [
            SynthPartition(i, self._rows, self._seed)
            for i in range(self._partitions)
        ]

    def read(self, partition: SynthPartition):
        base = partition.index * partition.rows
        for i in range(partition.rows):
            doc_id = base + i
            h = hashlib.md5(f"{partition.seed}:{doc_id}".encode()).digest()
            n_words = 5 + h[0] % 20
            words = [
                _WORDS[(h[1 + j % 14] + j * h[2]) % len(_WORDS)]
                for j in range(n_words)
            ]
            quality = round(int.from_bytes(h[4:8], "big") / 2**32, 6)
            yield (doc_id, partition.index, " ".join(words), quality)


def register_sources(spark) -> None:
    """Register both sources on the session (idempotent)."""
    spark.dataSource.register(JobsDataSource)
    spark.dataSource.register(SynthDataSource)
