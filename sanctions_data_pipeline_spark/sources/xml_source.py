"""EU-FSF-style sanctions XML source (reference main.py:149-180 splits
the feed into per-entity files; Spark's native XML data source reads
``<sanctionEntity>`` rows directly — one distributed scan, no driver
loop, no temp files).

An explicit schema keeps repeated elements as arrays regardless of how
many appear in a given entity (inference would flip single occurrences
to structs) and makes the scan column-prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_ALIAS = T.StructType([
    T.StructField("_wholeName", T.StringType()),
    T.StructField("_firstName", T.StringType()),
    T.StructField("_middleName", T.StringType()),
    T.StructField("_lastName", T.StringType()),
    T.StructField("_function", T.StringType()),
    T.StructField("_gender", T.StringType()),
    T.StructField("_title", T.StringType()),
    T.StructField("_strong", T.StringType()),
])
_BIRTH = T.StructType([
    T.StructField("_birthdate", T.StringType()),
    T.StructField("_year", T.StringType()),
    T.StructField("_yearRangeFrom", T.StringType()),
    T.StructField("_yearRangeTo", T.StringType()),
    T.StructField("_place", T.StringType()),
    T.StructField("_countryDescription", T.StringType()),
])
_CITIZEN = T.StructType([
    T.StructField("_countryIso2Code", T.StringType()),
    T.StructField("_countryDescription", T.StringType()),
])
_ADDRESS = T.StructType([
    T.StructField("_city", T.StringType()),
    T.StructField("_street", T.StringType()),
    T.StructField("_region", T.StringType()),
    T.StructField("_place", T.StringType()),
    T.StructField("_zipCode", T.StringType()),
    T.StructField("_countryDescription", T.StringType()),
])
_REGULATION = T.StructType([
    T.StructField("_numberTitle", T.StringType()),
    T.StructField("_regulationType", T.StringType()),
    T.StructField("publicationUrl", T.StringType()),
])
_SUBJECT = T.StructType([
    T.StructField("_code", T.StringType()),
    T.StructField("_classificationCode", T.StringType()),
])

ENTITY_SCHEMA = T.StructType([
    T.StructField("_euReferenceNumber", T.StringType()),
    T.StructField("_designationDate", T.StringType()),
    T.StructField("subjectType", _SUBJECT),
    T.StructField("nameAlias", T.ArrayType(_ALIAS)),
    T.StructField("birthdate", T.ArrayType(_BIRTH)),
    T.StructField("citizenship", T.ArrayType(_CITIZEN)),
    T.StructField("address", T.ArrayType(_ADDRESS)),
    T.StructField("regulation", T.ArrayType(_REGULATION)),
    T.StructField("remark", T.ArrayType(T.StringType())),
])


def read_entities(spark: SparkSession, path: str) -> DataFrame:
    """Scan sanctionEntity rows from one or many XML feed files."""
    return (
        spark.read.format("xml")
        .option("rowTag", "sanctionEntity")
        .schema(ENTITY_SCHEMA)
        .load(path)
    )


def entities_table(raw: DataFrame) -> DataFrame:
    """Canonical column layout (drops the XML-attribute underscores);
    entity_seq numbers entities like the reference's entity{N}.xml split
    (main.py:168-178) — by feed order within each input file."""
    return raw.select(
        F.monotonically_increasing_id().alias("entity_seq"),
        F.col("_euReferenceNumber").alias("eu_ref"),
        F.col("subjectType._classificationCode").alias("classification"),
        F.expr("transform(coalesce(nameAlias, array()), a -> struct("
               "a._wholeName AS whole_name, a._function AS function, "
               "a._gender AS gender, a._title AS title))").alias("aliases"),
        F.expr("transform(coalesce(birthdate, array()), b -> struct("
               "b._birthdate AS birthdate, b._year AS year, "
               "b._yearRangeFrom AS year_from, b._yearRangeTo AS year_to, "
               "b._place AS place))").alias("birthdates"),
        F.expr("transform(coalesce(citizenship, array()), "
               "c -> c._countryDescription)").alias("citizenships"),
        F.expr("transform(coalesce(address, array()), a -> struct("
               "a._city AS city, a._street AS street, a._region AS region, "
               "a._place AS place, a._zipCode AS zipcode, "
               "a._countryDescription AS country))").alias("addresses"),
        F.expr("transform(coalesce(regulation, array()), "
               "r -> r._numberTitle)").alias("regulation_titles"),
        F.coalesce(F.col("remark"), F.expr("array()")).alias("remarks"),
    )
