"""Unit tests for name normalization — cases lifted from the reference's
semantics (clean_fullname_no_accents_final, is_latin_name, all_variants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.functions import names as nm


def _one(spark, col_fn, value):
    return spark.createDataFrame([(value,)], "x string").select(
        col_fn(F.col("x")).alias("r")).first().r


# NOTE: title-casing is whitespace-word initcap (engine semantics on both
# sides of the oracle); unlike Python str.title() it does not capitalize
# after hyphens/apostrophes ("O'neil-smith", not "O'Neil-Smith").
@pytest.mark.parametrize("raw,expected", [
    ("José  García-Moreno", "Jose Garcia-moreno"),
    ("MÜLLER, jürgen", "Muller, Jurgen"),
    ("O’Neil–Smith", "O'neil-smith"),           # curly quote/dash folded
    ("  plain   name  ", "Plain Name"),
    ("Ёлкин", ""),                               # Cyrillic dropped by charset filter
    ("Śliwińska", "Sliwinska"),
])
def test_clean_fullname(spark, raw, expected):
    assert _one(spark, nm.clean_fullname, raw) == expected


@pytest.mark.parametrize("raw,expected", [
    ("Ivan Petrenko", True),
    ("Іван Петренко", False),       # Cyrillic І folds to I but rest stays Cyrillic
    ("Мохаммед", False),
    ("O’Neil–Smith, Patrick", True),
    ("José García", True),
    ("", False),
    ("123-456", True),
])
def test_is_latin_name(spark, raw, expected):
    assert _one(spark, nm.is_latin_name, raw) == expected


def test_variant_keys(spark):
    got = _one(spark, nm.variant_keys, "José  García-Moreno")
    assert got == [
        "josé garcía-moreno",       # keep accents
        "josé garcía moreno",       # punctuation removed
        "jose garcia-moreno",       # accents stripped
    ]


def test_strip_accents_round_trip(spark):
    assert _one(spark, nm.strip_accents, "àéîõüñçšž") == "aeiouncsz"


def test_accent_table_consistency():
    assert len(nm.ACCENT_FROM) == len(nm.ACCENT_TO)
    assert len(nm.TYPO_FROM) == len(nm.TYPO_TO)
    assert len(set(nm.ACCENT_FROM)) == len(nm.ACCENT_FROM)
