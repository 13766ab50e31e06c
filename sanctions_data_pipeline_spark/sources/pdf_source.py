"""PDF travel-ban document source.

Decode (reference main.py:250-258, per-page text extraction) runs
distributed: a ``binaryFile`` scan of the PDF paths feeds an
Arrow-batched ``mapInPandas`` decoder (vendored minimal extractor in
:mod:`pdf_text`; ``pypdf`` preferred when importable). Everything
downstream — entity chunking (main.py:261-283) and field parsing
(main.py:421-522) — is plain Spark over a (doc_path, text) DataFrame,
so any text source plugs in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# chunk boundary: lookahead split on "Entity <N>" (main.py:263)
_CHUNK_SPLIT_RE = r"(?=Entity\s+\d+\b)"


def extract_pdf_text(spark, path: str) -> DataFrame:
    """PDF file(s) -> (doc_path, text), one row per document
    (main.py:250-258 page-concat semantics).

    The decode is per-file data parallel: each binaryFile row decodes
    independently inside mapInPandas, so a directory of PDFs fans out
    across executors; bytes never pass through the driver.
    """
    import pandas as pd

    from sanctions_data_pipeline_spark.sources.pdf_text import (
        extract_text_from_pdf_bytes,
    )

    files = spark.read.format("binaryFile").load(path)

    def decode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_path": [p.rsplit("/", 1)[-1] for p in pdf["path"]],
                "text": [extract_text_from_pdf_bytes(b)
                         for b in pdf["content"]],
            })

    return files.select("path", "content").mapInPandas(
        decode, "doc_path string, text string")


def chunk_entities(texts: DataFrame, path_col: str = "doc_path",
                   text_col: str = "text") -> DataFrame:
    """Split document text into per-entity chunks (main.py:261-283):
    lookahead-split on 'Entity N' boundaries, keep chunks that start
    with 'entity' (ci), extract the Programme code (default GEN).

    Output: (doc_path, chunk_idx, programme, chunk_text).
    """
    chunks = texts.select(
        F.col(path_col).alias("doc_path"),
        F.posexplode(F.split(F.col(text_col), _CHUNK_SPLIT_RE))
         .alias("chunk_idx", "chunk_text"),
    ).withColumn("chunk_text", F.trim(F.col("chunk_text")))
    kept = chunks.filter(F.lower(F.col("chunk_text")).startswith("entity"))
    programme = F.regexp_extract(
        F.col("chunk_text"), r"(?i)Programme\s*[:\-]\s*([A-Za-z0-9]+)", 1)
    return kept.select(
        "doc_path", "chunk_idx",
        F.when(programme != "", F.upper(programme)).otherwise("GEN").alias("programme"),
        "chunk_text",
    )


def parse_chunk_fields(chunks: DataFrame) -> DataFrame:
    """Parse Name/Alias, Number(s) and Programme from a chunk
    (main.py:444-511). Inline values and next-line fallbacks are both
    handled; multiple Number lines join with ' / '; the Programme keeps
    the last '|'-separated part.

    Output adds: pdf_name, numbers, programme_line, rem2.
    """
    txt = F.regexp_replace(
        F.regexp_replace(F.col("chunk_text"), " ", " "), "\r", "\n")
    # Name/Alias: inline value, else first non-blank following line
    name_inline = F.regexp_extract(txt, r"(?i)Name/Alias\s*:[ \t]*(\S[^\n]*)", 1)
    name_nextline = F.regexp_extract(
        txt, r"(?i)Name/Alias\s*:[ \t]*\n\s*(\S[^\n]*)", 1)
    raw_name = F.when(name_inline != "", name_inline).otherwise(name_nextline)
    # truncate at an embedded following field label (main.py:456-461)
    cut = F.split(raw_name,
                  r"(?i)\b(title|function|birth information|birth date|"
                  r"citizenship information|contact information|"
                  r"identity information|address|remark|url|programme)\b\s*:")
    pdf_name = F.trim(cut.getItem(0))
    numbers = F.array_join(
        F.expr(r"regexp_extract_all(chunk_text, '(?im)^\\s*Number\\s*:[ \\t]*(\\S[^\\n]*)', 1)"),
        " / ")
    prog_line = F.regexp_extract(txt, r"(?im)^\s*Programme\s*:[ \t]*(\S[^\n]*)", 1)
    prog_last = F.trim(F.element_at(F.split(prog_line, r"\|"), -1))
    rem2 = F.concat_ws(
        "; ",
        F.when(numbers != "", F.concat(F.lit("Number: "), numbers)),
        F.when(prog_last != "", F.concat(F.lit("Programme: "), prog_last)),
    )
    return chunks.select(
        "doc_path", "chunk_idx", "programme", "chunk_text",
        pdf_name.alias("pdf_name"),
        numbers.alias("numbers"),
        prog_last.alias("programme_line"),
        rem2.alias("rem2"),
    )


class ChunkEntitiesUDTF:
    """The chunker as a Python UDTF (Spark 4): SQL-callable one-row →
    many-rows expansion (``SELECT ... FROM texts, LATERAL
    chunk_entities(text)``), row-identical to :func:`chunk_entities`.
    The DataFrame form stays the hot path (codegen'd split/regexp);
    the UDTF form exists for SQL-surface consumers and is registered
    per-session via :func:`register_chunk_udtf`."""

    def eval(self, text: str):
        import re

        for i, chunk in enumerate(re.split(r"(?=Entity\s+\d+\b)", text or "")):
            c = chunk.strip(" ")  # Spark's trim() strips SPACES only
            if c.lower().startswith("entity"):
                m = re.search(r"(?i)Programme\s*[:\-]\s*([A-Za-z0-9]+)", c)
                yield i, (m.group(1).upper() if m else "GEN"), c


def register_chunk_udtf(spark) -> None:
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "chunk_entities",
        udtf(ChunkEntitiesUDTF,
             returnType="chunk_idx int, programme string, chunk_text string"))
