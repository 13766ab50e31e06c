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
