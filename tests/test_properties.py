"""Property tests (hypothesis): normalization invariants the pipeline
relies on. Each example batch evaluates in ONE Spark job over a literal
DataFrame, keeping runtime sane."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.functions import names as nm
from sanctions_data_pipeline_spark.operators.dedup import normalized_text

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

text_lists = st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=40),
    min_size=1, max_size=25)


def _eval(spark, strings, fn):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return [r["a"] for r in
            df.select(fn(F.col("s")).alias("a")).collect()]


@given(text_lists)
@settings(**_SETTINGS)
def test_clean_fullname_idempotent(spark, strings):
    once = _eval(spark, strings, nm.clean_fullname)
    twice = _eval(spark, once, nm.clean_fullname)
    assert twice == once


@given(text_lists)
@settings(**_SETTINGS)
def test_normalized_text_idempotent(spark, strings):
    once = _eval(spark, strings, normalized_text)
    twice = _eval(spark, once, normalized_text)
    assert twice == once


@given(text_lists)
@settings(**_SETTINGS)
def test_variant_keys_are_lowercase_and_ws_collapsed(spark, strings):
    rows = _eval(spark, strings, nm.variant_keys)
    for variants in rows:
        for v in variants:
            assert v == v.lower()
            assert "  " not in v
            # trim semantics are Java \s (NOT Python str.strip, which
            # also eats \x1c-\x1f separators)
            assert not v.startswith(" ") and not v.endswith(" ")


@given(text_lists)
@settings(**_SETTINGS)
def test_normalize_ws_output_has_no_runs(spark, strings):
    for s in _eval(spark, strings, nm.normalize_ws):
        assert "  " not in s
        assert not s.startswith(" ") and not s.endswith(" ")


@given(st.lists(st.lists(st.floats(min_value=-10, max_value=10,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=8),
                min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_quantization_error_bounded_by_half_step(spark, vecs):
    """floor(x*scale+0.5) must never be off by more than half a
    quantization step, and the extreme element must hit ±127."""
    vecs = [v for v in vecs if max(abs(x) for x in v) > 1e-6]
    if not vecs:
        return
    from pyspark.sql import functions as F
    from sanctions_data_pipeline_spark.functions.hof import let
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "vec_id long, embedding array<float>")
    absmax = F.array_max(F.transform("embedding",
                                     lambda x: F.abs(x.cast("double"))))
    qv = lambda scale: F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("bigint"))
    rows = df.select("vec_id", "embedding",
                     let(F.lit(127.0) / absmax, qv).alias("q")).collect()
    for r in rows:
        v = [float(x) for x in r.embedding]
        scale = 127.0 / max(abs(x) for x in v)
        for x, q in zip(v, r.q):
            assert -128 <= q <= 127
            assert abs(q / scale - x) <= (0.5 / scale) + 1e-9
        assert max(abs(q) for q in r.q) == 127
