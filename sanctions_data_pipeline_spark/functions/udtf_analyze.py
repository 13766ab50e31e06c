"""Polymorphic Python UDTF (Spark 4 ``analyze`` API): output schema
computed at PLAN TIME from constant arguments.

``parse_kv(props, 'k1,k2,...')`` turns a JSON/key-value string column
into one typed column PER REQUESTED KEY — the schema the optimizer
sees is exactly the keys the caller named, so downstream pruning and
codegen work on real columns instead of a map blob. This is the
table-function analogue of ``variant_get`` paths: the dynamic-schema
machinery (static ``analyze`` -> AnalyzeResult) is the point; the
static-schema chunker UDTF (sources/pdf_source.py) covers the simpler
form.
"""

from __future__ import annotations

import json

from pyspark.sql.types import StringType, StructType
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult


class ParseKV:
    """SELECT * FROM parse_kv(TABLE(...) argument is not needed — the
    lateral form ``parse_kv(props, 'a,b')`` yields one row per input
    call with columns (a, b)."""

    @staticmethod
    def analyze(props: AnalyzeArgument, keys: AnalyzeArgument) -> AnalyzeResult:
        if not isinstance(keys.value, str) or not keys.value:
            raise ValueError("parse_kv: keys must be a constant "
                             "comma-separated string")
        schema = StructType()
        for k in keys.value.split(","):
            schema = schema.add(k.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def __init__(self) -> None:
        self._keys: list[str] | None = None

    def eval(self, props: str, keys: str):
        if self._keys is None:
            self._keys = [k.strip() for k in keys.split(",")]
        try:
            d = json.loads(props) if props else {}
        except (ValueError, TypeError):
            d = {}
        if not isinstance(d, dict):
            d = {}  # valid JSON scalar/array ('3', '[1]', 'true') has no keys
        yield tuple(None if d.get(k) is None else str(d.get(k))
                    for k in self._keys)


def register_parse_kv(spark) -> None:
    """Idempotently register ``parse_kv`` for the session's SQL."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("parse_kv", udtf(ParseKV))
