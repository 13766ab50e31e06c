"""Multimodal binary-column plumbing: schema, Arrow batching through
mapInPandas, deterministic fake decode pinned against a pure-Python
recomputation, and honest stubs for the absent codecs."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.multimodal.ops import (
    DECODE_SCHEMA, _fake_decode, attach_media, decode_features,
    resize_images, sample_frames,
)


def test_attach_media_schema(spark, sf_dir):
    m = attach_media(load_table(spark, sf_dir, "documents"))
    d = dict(m.dtypes)
    assert d["media"] == "binary"
    assert d["media_type"] == "string"
    assert d["media_meta"].startswith("struct")


def test_decode_matches_python_recomputation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = decode_features(attach_media(docs)).collect()
    assert len(out) == 50
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        buf = texts[r["doc_id"]].encode("utf-8")
        mtype = ("image", "audio", "video")[r["doc_id"] % 3]
        w, h, nf, feats = _fake_decode(mtype, buf)
        assert (r["media_type"], r["n_bytes"]) == (mtype, len(buf))
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert np.allclose(r["features"], feats)
        assert abs(sum(feats) - 1.0) < 1e-6  # normalized histogram


def test_decode_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    a = decode_features(attach_media(docs)).collect()
    b = decode_features(attach_media(docs.repartition(7))).collect()
    key = lambda r: r["doc_id"]
    assert sorted(map(tuple, a), key=lambda t: t[0]) == \
           sorted(map(tuple, b), key=lambda t: t[0])


def test_decode_plan_prunes_text_column(spark, sf_dir):
    """The projection under mapInPandas must not ship `text`/`media_meta`
    into Python — only (doc_id, media_type, media)."""
    plan = decode_features(attach_media(
        load_table(spark, sf_dir, "documents")))._jdf.queryExecution() \
        .optimizedPlan().toString()
    (head, _, below) = plan.partition("MapInPandas")
    assert "media_meta" not in below


def test_real_codec_paths_are_honest_stubs(spark, sf_dir):
    m = attach_media(load_table(spark, sf_dir, "documents").limit(1))
    with pytest.raises(NotImplementedError):
        decode_features(m, use_real_codecs=True)
    with pytest.raises(NotImplementedError):
        resize_images(m, 64, 64, use_real_codecs=True)
    with pytest.raises(NotImplementedError):
        sample_frames(m, every_n=10, use_real_codecs=True)


def test_decode_schema_stable():
    assert [f.name for f in DECODE_SCHEMA] == [
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames",
        "features"]


def test_resize_fake_kernel_shapes(spark, sf_dir):
    m = attach_media(load_table(spark, sf_dir, "documents"))
    out = resize_images(m, 32, 8).collect()
    assert len(out) == m.count()
    for r in out:
        assert len(r.media) == 32 * 8
        assert (r.width, r.height) == (32, 8)
    # deterministic: same input -> same bytes
    again = {r.doc_id: r.media for r in resize_images(m, 32, 8).collect()}
    assert all(again[r.doc_id] == r.media for r in out)


def test_sample_frames_fan_out(spark, sf_dir):
    from sanctions_data_pipeline_spark.multimodal.ops import FAKE_FRAME_BYTES

    m = attach_media(load_table(spark, sf_dir, "documents"))
    out = sample_frames(m, every_n=2).collect()
    sizes = {r.doc_id: r.n for r in
             m.select("doc_id", F.octet_length("media").alias("n")).collect()}
    from collections import Counter
    per_doc = Counter(r.doc_id for r in out)
    for doc_id, nbytes in sizes.items():
        n_frames = max(1, -(-nbytes // FAKE_FRAME_BYTES))
        assert per_doc[doc_id] == -(-n_frames // 2)  # ceil(n_frames / every_n)
    for r in out:
        assert r.frame_idx % 2 == 0
        assert 0 < len(r.frame) <= FAKE_FRAME_BYTES


def test_window_audio_matches_numpy_recompute(spark):
    import numpy as np
    from sanctions_data_pipeline_spark.multimodal.ops import window_audio

    rng = np.random.default_rng(7)
    pcm = (rng.integers(-3000, 3000, size=1000)).astype("<i2")
    short = np.zeros(100, dtype="<i2")  # shorter than one window
    df = spark.createDataFrame(
        [(1, bytearray(pcm.tobytes())), (2, bytearray(short.tobytes()))],
        "doc_id long, media binary")
    rows = window_audio(df, frame_len=256, hop_len=128).collect()
    assert {r.doc_id for r in rows} == {1}  # short doc emits nothing
    n_wins = 1 + (1000 - 256) // 128
    assert len(rows) == n_wins
    for r in rows:
        w = pcm[r.win_idx * 128: r.win_idx * 128 + 256].astype("float64")
        assert abs(r.rms - round(float(np.sqrt((w * w).mean())), 6)) < 1e-9
        sb = np.signbit(w)
        assert r.zero_crossings == int((sb[1:] != sb[:-1]).sum())


def test_mm_audio_windows_rollup_is_deterministic(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans import registry
    q = registry.queries()["mm_audio_windows"]
    a = {(r.doc_id, r.n_windows, r.max_rms, r.total_zc)
         for r in q(spark, sf_dir).collect()}
    b = {(r.doc_id, r.n_windows, r.max_rms, r.total_zc)
         for r in q(spark, sf_dir).collect()}
    assert a == b and a


def test_map_in_arrow_decode_matches_pandas_path(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.multimodal.ops import (
        attach_media, decode_features, decode_features_arrow,
    )
    media = attach_media(load_table(spark, sf_dir, "documents"))

    def key(r):
        return (r.doc_id, r.media_type, r.n_bytes, r.width, r.height,
                r.n_frames, tuple(r.features))

    a = {key(r) for r in decode_features(media).collect()}
    b = {key(r) for r in decode_features_arrow(media).collect()}
    assert a == b and a


def test_binary_file_source_reads_media_bytes(spark, tmp_path):
    """binaryFile is the real ingest path attach_media stands in for:
    (path, modificationTime, length, content) rows with the exact file
    bytes, filterable by glob before any byte is read."""
    payload = bytes(range(256))
    (tmp_path / "a.bin").write_bytes(payload)
    (tmp_path / "b.txt").write_bytes(b"not media")
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.bin").load(str(tmp_path)))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].length == 256 and bytes(rows[0].content) == payload
