"""Multimodal binary-column plumbing: opaque ``binary`` media columns
with typed metadata, decoded / feature-extracted via Arrow-batched
``mapInPandas``.

The Spark-side machinery — schema, partition-parallel batching, UDF
signatures, column pruning before the Python hop — is real and tested.
The actual image/audio/video codecs are NOT available in this
environment, so:

- :func:`decode_features` uses a **deterministic fake decoder** (pure
  numpy over the raw bytes) so tests can pin exact outputs; the real
  codec hook is an explicit, clearly-marked stub.
- :func:`resize_images` / :func:`sample_frames` raise
  ``NotImplementedError`` unless PIL / a video codec is importable,
  with signatures, output schemas, and batching identical to the real
  thing.

Scale notes: media bytes never leave the executor JVM except through
Arrow record batches (zero-copy to pandas); per-row Python calls are
amortized over ``spark.sql.execution.arrow.maxRecordsPerBatch``-sized
batches; projections below the ``mapInPandas`` prune to exactly the
columns the decoder needs, so a 100 TB scan doesn't ship text columns
into Python alongside the media.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_TYPES = ("image", "audio", "video")

DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque media column on the documents table.

    Deployments read real bytes via ``spark.read.format("binaryFile")``
    (path, modificationTime, length, content) — this helper stands in
    for that source on the synthetic testdata: payload = utf-8 bytes of
    the text, media_type assigned round-robin by doc_id, plus the typed
    metadata struct a binaryFile-style source carries.
    """
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"))
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            F.col("source").alias("origin"),
            F.octet_length(F.col("text")).cast("long").alias("declared_len"),
        ).alias("media_meta"),
    )


def _fake_decode(media_type: str, buf) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for the codec: derives (width, height,
    n_frames, features) purely from the byte content. STUB — replace
    with PIL/librosa/pyav when the codecs exist in the image."""
    import numpy as np

    a = np.frombuffer(buf, dtype=np.uint8)
    n = int(a.size)
    s = int(a.sum())
    width = 16 + (s + n) % 240
    height = 16 + (s * 7 + 3) % 240
    n_frames = 1 + s % 30 if media_type == "video" else 1
    hist = np.bincount(a >> 5, minlength=8).astype("float64")
    feats = (hist / max(n, 1)).round(6)
    return width, height, n_frames, feats.tolist()


def decode_features(media_df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode media bytes → dimensions + an 8-dim byte-histogram feature
    vector, executed as Arrow-batched ``mapInPandas``.

    ``use_real_codecs=True`` selects the real decoder path, which is a
    clearly-marked stub until PIL/librosa/pyav are installed.
    """
    if use_real_codecs:
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real media decode needs PIL/librosa/pyav (absent in this "
                "image); use the deterministic fake decoder "
                "(use_real_codecs=False)") from exc
        raise NotImplementedError("wire PIL.Image.open over the byte buffers")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, mtype, buf in zip(pdf["doc_id"], pdf["media_type"],
                                          pdf["media"]):
                w, h, nf, feats = _fake_decode(mtype, buf)
                rows.append((doc_id, mtype, len(buf), w, h, nf, feats))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA])

    # prune to decoder inputs BEFORE the Python hop (checked in tests)
    return media_df.select("doc_id", "media_type", "media") \
                   .mapInPandas(decode, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads to (width, height). STUB: raises unless PIL
    is importable — the mapInPandas shape is what a real build fills in."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "resize_images needs PIL (absent in this image)") from exc

    def _resize(batches):  # pragma: no cover - needs PIL
        raise NotImplementedError("PIL resize over Arrow batches")

    return media_df.select("doc_id", "media").mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(media_df: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every Nth video frame. STUB: raises unless a video codec
    (pyav) is importable."""
    try:
        import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "sample_frames needs pyav (absent in this image)") from exc

    def _sample(batches):  # pragma: no cover - needs pyav
        raise NotImplementedError("pyav frame iteration over Arrow batches")

    return media_df.select("doc_id", "media").mapInPandas(_sample, FRAME_SCHEMA)
