"""Address token cleaning (reference main.py:639-755).

Semantics (engine definition, = reference except one documented nuance):
split the ws-normalized value into tokens, strip ``,.;:-`` from each
token, drop empty tokens and the literal tokens ``city``/``province``
(case-insensitive), drop the token immediately BEFORE a ``province``
token, then case-insensitively dedupe keeping the first occurrence and
re-join. (The reference pops the previous *kept* token when it meets
``province``; this engine drops the previous *adjacent* token — the two
differ only when a dropped token sits between, which real EU addresses
don't produce.)

Everything is a per-row array expression — generated twice from the
same template: Spark SQL (0-based lambdas) and DuckDB SQL (1-based).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_PUNCT = "[,.;:\\-]"


def _spark_tokens(expr: str) -> str:
    ws = f"trim(regexp_replace({expr}, '\\\\s+', ' '))"
    return f"transform(split({ws}, ' '), w -> regexp_replace(w, '{_PUNCT}', ''))"


def spark_token_clean(expr: str) -> str:
    """Spark SQL string computing the cleaned token string of ``expr``."""
    c = _spark_tokens(expr)
    kept = (
        f"filter({c}, (w, i) -> w != '' AND lower(w) != 'city' "
        f"AND lower(w) != 'province' "
        f"AND (i + 1 >= size({c}) OR lower({c}[i + 1]) != 'province'))"
    )
    dedup = (
        f"filter({kept}, (w, i) -> NOT array_contains("
        f"transform(slice({kept}, 1, i), y -> lower(y)), lower(w)))"
    )
    return f"array_join({dedup}, ' ')"


def _sql_tokens(expr: str) -> str:
    ws = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    return (f"list_transform(string_split({ws}, ' '), "
            f"w -> regexp_replace(w, '{_PUNCT}', '', 'g'))")


def sql_token_clean(expr: str) -> str:
    """DuckDB SQL mirroring :func:`spark_token_clean` (1-based lambdas)."""
    c = _sql_tokens(expr)
    kept = (
        f"list_filter({c}, (w, i) -> w != '' AND lower(w) != 'city' "
        f"AND lower(w) != 'province' "
        f"AND (i + 1 > len({c}) OR lower({c}[i + 1]) != 'province'))"
    )
    dedup = (
        f"list_filter({kept}, (w, i) -> NOT list_contains("
        f"list_transform({kept}[1:i-1], y -> lower(y)), lower(w)))"
    )
    # array_to_string([]) is NULL in DuckDB v1.0 — coalesce to ''
    return f"coalesce(array_to_string({dedup}, ' '), '')"


def token_clean(col_name: str) -> Column:
    """Column form of the Spark-side token cleaner (takes a column name
    or SQL fragment, since the template references the input thrice)."""
    return F.expr(spark_token_clean(col_name))


def valid_field(col: Column) -> Column:
    """Reference valid() (main.py:648-649): non-null, non-blank, not
    the literal UNKNOWN."""
    return col.isNotNull() & (F.trim(col) != "") & (F.upper(F.trim(col)) != "UNKNOWN")


def sql_valid_field(expr: str) -> str:
    return (f"({expr} IS NOT NULL AND trim({expr}) != '' "
            f"AND upper(trim({expr})) != 'UNKNOWN')")
