"""Custom Python data source (Spark 4 DataSource API) for sanctions
feeds: splits raw EU-FSF-style XML files into one row PER ENTITY with
file provenance — the reference's feed-split step (main.py:149-180,
which writes entity{N}.xml temp files in a driver loop) re-expressed as
a first-class, partition-parallel Spark source.

This complements the native ``spark.read.format("xml")`` scan
(xml_source.py): the JVM source is the fast path for well-formed XML;
a Python data source is the ingestion escape hatch when no JVM source
fits (bespoke wire formats, API pagination, custom decryption). The
split itself uses only the standard library's ElementTree.

Scale: one input partition per feed file, so a directory of N snapshot
files fans out across min(N, executors) tasks; each task streams its
file once and yields (file, entity_seq, eu_ref, xml) rows through
Arrow. A single giant feed file stays one partition — the same
constraint as any non-splittable format (gzip); snapshot feeds are
naturally many-file.
"""

from __future__ import annotations

import glob as _glob
import os
import xml.etree.ElementTree as ET
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class FeedFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SanctionsFeedDataSource(DataSource):
    """``spark.read.format("sanctions_feed").option("path", dir_or_file)``."""

    @classmethod
    def name(cls) -> str:
        return "sanctions_feed"

    def schema(self) -> str:
        return ("file string, entity_seq int, eu_ref string, "
                "subject_code string, n_aliases int, xml string")

    def reader(self, schema) -> "SanctionsFeedReader":
        return SanctionsFeedReader(self.options)


class SanctionsFeedReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("sanctions_feed requires .option('path', ...)")
        self._path = path

    def _files(self) -> list[str]:
        if os.path.isdir(self._path):
            return sorted(_glob.glob(os.path.join(self._path, "*.xml")))
        return sorted(_glob.glob(self._path)) or [self._path]

    def partitions(self) -> Sequence[FeedFilePartition]:
        return [FeedFilePartition(p) for p in self._files()]

    def read(self, partition: FeedFilePartition) -> Iterator[tuple]:
        # iterparse streams the file; entities are yielded and freed
        # one at a time, with completed children pruned off the root —
        # memory stays O(largest entity) even for one giant feed file,
        # not O(entities seen so far). Shared with the streaming twin.
        yield from _parse_entities(partition.path)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SanctionsFeedDataSource)


# ---------------------------------------------------------------------------
# Streaming twin: incremental feed ingestion (Spark 4 Python streaming
# data source). The batch source above answers "split THIS feed"; real
# deployments receive snapshot files continuously, so the stream
# source watches a directory and emits ONLY newly-arrived files per
# micro-batch. Offsets are {"files_done": N} over the sorted filename
# list — monotone because snapshot names are monotone (dated); replay
# (readBetweenOffsets) re-reads exactly the files in [start, end), so
# recovery is deterministic. Driver-side reads here are the simple
# single-threaded API (SimpleDataSourceStreamReader) — right for
# control-plane-sized feeds; a high-volume source would implement the
# partitioned streamReader instead.
# ---------------------------------------------------------------------------


class SanctionsFeedStreamDataSource(DataSource):
    """``spark.readStream.format("sanctions_feed_stream")
    .option("path", dir)`` — one row per entity in newly-arrived
    feed files."""

    @classmethod
    def name(cls) -> str:
        return "sanctions_feed_stream"

    def schema(self) -> str:
        return ("file string, entity_seq int, eu_ref string, "
                "subject_code string, n_aliases int, xml string")

    def simpleStreamReader(self, schema) -> "SanctionsFeedStreamReader":
        return SanctionsFeedStreamReader(self.options)


def _parse_entities(path: str) -> Iterator[tuple]:
    """Shared per-file entity parse (same row shape as the batch
    reader): streamed iterparse, root pruned per entity."""
    fname = os.path.basename(path)
    seq = 0
    root = None
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            if root is None:
                root = elem
            continue
        tag = elem.tag.rsplit("}", 1)[-1]
        if tag != "sanctionEntity":
            continue
        seq += 1
        subject = elem.find("{*}subjectType")
        yield (
            fname,
            seq,
            elem.get("euReferenceNumber"),
            subject.get("code") if subject is not None else None,
            sum(1 for _ in elem.iter()
                if _.tag.rsplit("}", 1)[-1] == "nameAlias"),
            ET.tostring(elem, encoding="unicode"),
        )
        elem.clear()
        if root is not None:
            del root[:]


from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class SanctionsFeedStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("sanctions_feed_stream requires .option('path', ...)")
        self._dir = path

    def _files(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self._dir, "*.xml")))

    def initialOffset(self) -> dict:
        return {"files_done": 0}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        # a LIST, not a generator: the engine deep-copies the returned
        # rows for prefetch/replay bookkeeping, and generators don't
        # pickle. Feed snapshots are control-plane-sized, so
        # materializing a batch on the driver is the honest cost.
        files = self._files()
        done = int(start.get("files_done", 0))
        rows = [r for p in files[done:] for r in _parse_entities(p)]
        return rows, {"files_done": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        files = self._files()
        return [r for p in files[int(start.get("files_done", 0)):
                                 int(end.get("files_done", 0))]
                for r in _parse_entities(p)]


def register_stream(spark) -> None:
    """Idempotently register the streaming source with a session."""
    spark.dataSource.register(SanctionsFeedStreamDataSource)
