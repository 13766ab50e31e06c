"""CSV document source with quarantine semantics — same contract as the
JSONL source (explicit schema, PERMISSIVE mode, corrupt-line capture):
schema inference is never acceptable at 100 TB, and one malformed row
must not kill a million-task ingest.

CSV-specific caveats handled here: multiline quoted fields are OFF (a
multiline CSV is not splittable — a 100 TB multiline file would serialize
into one task), and the header is skipped per-file by the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

CSV_DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("_corrupt_record", T.StringType()),
])


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a CSV corpus; malformed rows land in ``_corrupt_record``.

    Use :func:`sanctions_data_pipeline_spark.sources.jsonl.split_corrupt`
    to separate clean rows from the quarantine (same column contract).
    """
    return (spark.read
            .schema(CSV_DOC_SCHEMA)
            .option("header", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("multiLine", "false")
            .csv(path))


def write_documents_csv(df: DataFrame, path: str,
                        compression: str = "gzip",
                        mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true") \
        .option("compression", compression).csv(path)
