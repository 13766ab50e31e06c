"""JSONL source: typed read, corrupt-line quarantine, round-trip."""

from __future__ import annotations

import gzip
import json
import os

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.sources.jsonl import (
    read_documents_jsonl, split_corrupt, write_documents_jsonl,
)


def _write_fixture(path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en",
                    "source": "src0", "meta": {"k": "v"}}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr",
                    "source": "src1", "meta": {}}),
        '{"doc_id": 3, "text": "broken',          # malformed
        json.dumps({"doc_id": 4, "text": None, "lang": "zh",
                    "source": "src2", "meta": None}),
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_read_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    _write_fixture(p)
    df = read_documents_jsonl(spark, p)
    clean, bad = split_corrupt(df)
    got = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    assert got == {1: ("hello world", "en"), 2: ("bonjour", "fr"),
                   4: (None, "zh")}
    assert clean.columns == ["doc_id", "text", "lang", "source", "meta"]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and bad_rows[0].raw_line.startswith('{"doc_id": 3')
    assert {r.doc_id: dict(r.meta or {}) for r in clean.collect()}[1] == {"k": "v"}


def test_jsonl_roundtrip_compressed(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = str(tmp_path / "out_jsonl")
    write_documents_jsonl(
        docs.selectExpr("doc_id", "text", "lang", "source",
                        "map('n_chars', cast(n_chars as string)) AS meta"),
        out)
    shards = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert shards  # compressed shard files
    with gzip.open(os.path.join(out, shards[0]), "rt") as f:
        json.loads(f.readline())  # valid JSONL payload
    back, bad = split_corrupt(read_documents_jsonl(spark, out))
    assert back.count() == 50 and bad.count() == 0
    a = {r.doc_id: r.text for r in back.collect()}
    b = {r.doc_id: r.text for r in docs.collect()}
    assert a == b


def test_csv_source_quarantines_malformed_rows(spark, tmp_path):
    from sanctions_data_pipeline_spark.sources.csv_source import (
        read_documents_csv, write_documents_csv)
    from sanctions_data_pipeline_spark.sources.jsonl import split_corrupt

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,src1,11\n"
        "2,bonjour,fr,src2,7\n"
        "not_a_number,broken,xx,src3,oops\n")
    df = read_documents_csv(spark, str(p))
    clean, bad = split_corrupt(df)
    assert clean.count() == 2
    assert bad.count() == 1
    assert "broken" in bad.collect()[0].raw_line
    # round-trip: clean rows survive a compressed csv write+read
    out = tmp_path / "out_csv"
    write_documents_csv(clean, str(out))
    back = read_documents_csv(spark, str(out))
    clean2, bad2 = split_corrupt(back)
    assert bad2.count() == 0
    assert {r.doc_id for r in clean2.collect()} == {1, 2}
