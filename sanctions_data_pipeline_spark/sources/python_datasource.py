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
        fname = os.path.basename(partition.path)
        seq = 0
        # iterparse streams the file; entities are yielded and freed one
        # at a time. elem.clear() empties the element but leaves it
        # attached to the root, so we also prune completed children off
        # the root — memory stays O(largest entity) even for one giant
        # feed file, not O(entities seen so far).
        root = None
        for event, elem in ET.iterparse(partition.path,
                                        events=("start", "end")):
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


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SanctionsFeedDataSource)
