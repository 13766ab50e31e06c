"""Regression pins for the round-2 review findings: chunk-key
disjointness, UDTF scalar-JSON tolerance, empty-cut token counts,
href resolution, Y4M colorspaces, and scale_up referential integrity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_simhash_chunk_keys_disjoint_and_exact_at_h7(spark):
    """max_hamming=7 (9 chunks over 64 bits) must keep chunks disjoint:
    every pair within hamming<=7 shares a two-chunk combo value."""
    from sanctions_data_pipeline_spark.operators.dedup import (
        simhash_chunk_keys)

    keys = simhash_chunk_keys(7)
    # worst case from the old clamped layout: 6 flips spread over
    # chunks 0-5 plus one flip at the TOP bit (63)
    a = 0x0123456789ABCDEF
    flips = [0, 8, 16, 24, 32, 40, 63]  # 7 bits in 7 different regions
    b = a
    for f in flips:
        b ^= 1 << f
    # embed as longs; compare combo arrays
    df = spark.createDataFrame([(a - (1 << 64 if a >= 1 << 63 else 0),
                                 b - (1 << 64 if b >= 1 << 63 else 0))],
                               "sh long, sh2 long")
    ca = df.select(F.array(*keys).alias("c")).collect()[0].c
    keys2 = simhash_chunk_keys(7, col="sh2")
    cb = df.select(F.array(*keys2).alias("c")).collect()[0].c
    assert set(ca) & set(cb), "hamming-7 pair lost by chunk overlap"


def test_simhash_chunk_keys_rejects_impossible_params(spark):
    from sanctions_data_pipeline_spark.operators.dedup import (
        simhash_chunk_keys)

    with pytest.raises(ValueError):
        simhash_chunk_keys(63)  # 65 chunks > 64 bits


def test_parse_kv_tolerates_non_object_json(spark):
    from sanctions_data_pipeline_spark.functions.udtf_analyze import (
        register_parse_kv)

    register_parse_kv(spark)
    rows = spark.sql(
        "SELECT * FROM parse_kv('3', 'a,b') "
        "UNION ALL SELECT * FROM parse_kv('[1,2]', 'a,b') "
        "UNION ALL SELECT * FROM parse_kv('true', 'a,b') "
        "UNION ALL SELECT * FROM parse_kv('{\"a\": 7}', 'a,b')").collect()
    assert len(rows) == 4
    assert rows[-1][0] == "7" and rows[-1][1] is None


def test_cut_regions_fully_excised_doc_counts_zero(spark):
    from sanctions_data_pipeline_spark.operators.dedup import cut_regions

    text = " ".join(f"tok{i}" for i in range(20))
    docs = spark.createDataFrame([(1, text), (2, text)],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in
           cut_regions(docs, k=8, min_tokens=10).collect()}
    assert out[1].n_tokens_before == 20
    assert out[1].n_tokens_after == 0  # not 1: split('') artifact
    assert out[1].clean_text == ""


def test_discover_link_resolves_relative_and_protocol_relative():
    from sanctions_data_pipeline_spark.sources.fetch import discover_link

    base = "https://host.example/page/index.html"
    html = '<a href="//cdn.example/files/feed.xml">x</a>'
    assert discover_link(html, base, ".xml") == \
        "https://cdn.example/files/feed.xml"
    html2 = '<a href="files/feed.xml">x</a>'
    assert discover_link(html2, base, ".xml") == \
        "https://host.example/page/files/feed.xml"
    html3 = '<a href="/files/feed.xml">x</a>'
    assert discover_link(html3, base, ".xml") == \
        "https://host.example/files/feed.xml"


def test_parse_y4m_handles_c444_and_mono():
    from sanctions_data_pipeline_spark.multimodal import codecs

    w, h, nf = 4, 2, 3
    luma = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    # hand-build a C444 stream: Y + full-size U + V planes
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 C444\n".encode()
    frame = b"FRAME\n" + luma.tobytes() + bytes(w * h) + bytes(w * h)
    buf = hdr + frame * nf
    pw, ph, offs = codecs.parse_y4m(buf)
    assert (pw, ph, len(offs)) == (w, h, nf)
    got = codecs.y4m_luma(buf, offs[1], pw, ph)
    assert (got == luma).all()
    # mono
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Cmono\n".encode()
    buf = hdr + (b"FRAME\n" + luma.tobytes()) * 2
    _, _, offs = codecs.parse_y4m(buf)
    assert len(offs) == 2
    with pytest.raises(ValueError):
        codecs.parse_y4m(f"YUV4MPEG2 W4 H2 F25:1 Cweird\n".encode()
                         + b"FRAME\n" + bytes(12))


def test_scale_up_preserves_referential_integrity(spark, sf_dir, tmp_path):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from scale_up import scale_up

    d = str(tmp_path / "x3")
    scale_up(sf_dir, d, 3)
    from sanctions_data_pipeline_spark.catalog import load_table
    base_join = (load_table(spark, sf_dir, "orders")
                 .join(load_table(spark, sf_dir, "customer"),
                       F.col("o_custkey") == F.col("c_custkey")).count())
    x3_join = (load_table(spark, d, "orders")
               .join(load_table(spark, d, "customer"),
                     F.col("o_custkey") == F.col("c_custkey")).count())
    assert x3_join == 3 * base_join  # every copy joins its own universe
    li = (load_table(spark, d, "lineitem")
          .join(load_table(spark, d, "part"),
                F.col("l_partkey") == F.col("p_partkey")).count())
    li_base = (load_table(spark, sf_dir, "lineitem")
               .join(load_table(spark, sf_dir, "part"),
                     F.col("l_partkey") == F.col("p_partkey")).count())
    assert li == 3 * li_base
