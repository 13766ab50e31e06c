"""Real-layout PDF fidelity (VERDICT r06 task 5): the reference uses
pdfplumber over EU travel-ban PDFs whose layout is multi-column with
hyphenated soft-wrapped lines (main.py:250-283). travel_ban_layout.pdf
renders that document class — two pages, two Tm-positioned columns per
page, FlateDecode + raw streams, hex/TJ-array string forms, hyphenated
wraps inside Remark/Function values and a hyphen INSIDE a name
(Al-Harbi) that must survive untouched. Tests pin the extracted text
against the ground-truth .txt, the chunk/parse FIELD VALUES, and the
full pipeline parity between the PDF and the pre-extracted-text paths;
when pypdf is importable the vendored extractor is also diffed against
it (skip-reported otherwise, so divergence surfaces rather than
staying silent)."""

import os
import re

import pytest

from sanctions_data_pipeline_spark.sources.pdf_source import (
    chunk_entities, extract_pdf_text, parse_chunk_fields,
)

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sanctions_data_pipeline_spark", "data", "fixtures")
LAYOUT_PDF = os.path.join(FIXTURES, "travel_ban_layout.pdf")
LAYOUT_TXT = os.path.join(FIXTURES, "travel_ban_layout.txt")


def _norm(s: str) -> str:
    return re.sub(r"[ \t]+\n", "\n", s).strip()


def test_layout_pdf_decode_roundtrips_ground_truth(spark):
    texts = extract_pdf_text(spark, LAYOUT_PDF)
    rows = texts.collect()
    assert [r.doc_path for r in rows] == ["travel_ban_layout.pdf"]
    with open(LAYOUT_TXT, encoding="utf-8") as fh:
        want = fh.read()
    assert _norm(rows[0].text) == _norm(want)


def test_layout_pdf_field_values(spark):
    """Exact field values through decode -> chunk -> parse: hyphenated
    wraps stay confined to Remark/Function lines (never corrupting the
    extracted fields), the in-name hyphen is preserved, multi-Number
    joins and last-|-part Programme semantics hold under the layout."""
    fields = (parse_chunk_fields(chunk_entities(
        extract_pdf_text(spark, LAYOUT_PDF)))
        .select("chunk_idx", "programme", "pdf_name", "numbers", "rem2")
        .orderBy("chunk_idx"))
    got = [tuple(r) for r in fields.collect()]
    assert got == [
        (1, "OLD", "Jose Garcia Moreno", "EU.1234.5",
         "Number: EU.1234.5; Programme: VEN"),
        (2, "SYR", "Mohammed Aliyev", "EU.2222.1 / EU.2222.2",
         "Number: EU.2222.1 / EU.2222.2; Programme: SYR"),
        (3, "VEN", "Maria Lopez", "EU.5555.0",
         "Number: EU.5555.0; Programme: VEN"),
        (4, "AFG", "Abdul Rahman Al-Harbi", "EU.7777.9",
         "Number: EU.7777.9; Programme: AFG2"),
    ]


def test_layout_pipeline_matches_text_path(spark):
    """pipeline_e2e parity on the layout document: running the full
    reference pipeline from the layout PDF's bytes equals running it
    from the pre-extracted ground-truth text."""
    from pyspark.sql import functions as F

    from sanctions_data_pipeline_spark.pipeline import run_pipeline

    xml = os.path.join(FIXTURES, "feed.xml")
    with open(LAYOUT_TXT, encoding="utf-8") as fh:
        txt = fh.read()
    via_txt = run_pipeline(
        spark, xml,
        spark.createDataFrame([("travel_ban_layout.pdf", txt)],
                              "doc_path string, text string"))
    via_pdf = run_pipeline(spark, xml, extract_pdf_text(spark, LAYOUT_PDF))
    assert sorted(map(tuple, via_pdf.collect())) == \
        sorted(map(tuple, via_txt.collect()))
    assert via_pdf.filter(F.col("full_name").isNotNull()).count() > 0


def test_layout_vendored_vs_pypdf_diff(spark):
    """When pypdf is installed the preferred pypdf path and the
    vendored extractor must parse to the SAME field values on the
    layout fixture; without pypdf this skips VISIBLY so the diff is
    known-unexercised rather than silently green."""
    pytest.importorskip(
        "pypdf",
        reason="pypdf not installed — vendored-vs-pypdf layout diff "
               "not exercised in this environment")
    from sanctions_data_pipeline_spark.sources import pdf_text

    data = open(LAYOUT_PDF, "rb").read()
    via_pypdf = pdf_text.extract_text_from_pdf_bytes(data)

    # force the vendored path by parsing the streams directly
    import unittest.mock as mock
    with mock.patch.dict("sys.modules", {"pypdf": None}):
        via_vendored = pdf_text.extract_text_from_pdf_bytes(data)

    def fields(text):
        return sorted(map(tuple, parse_chunk_fields(chunk_entities(
            spark.createDataFrame([("x.pdf", text)],
                                  "doc_path string, text string")))
            .select("chunk_idx", "programme", "pdf_name", "numbers",
                    "rem2").collect()))

    assert fields(via_pypdf) == fields(via_vendored)
