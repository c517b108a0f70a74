"""SQL-defined text-analysis functions — the operators/text.py surface
exposed to pure ``spark.sql()`` users through Spark SQL UDFs
(``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>``).

Unlike the Python UDF/UDAF shims in functions/sql_api.py (which exist
for topn API parity and carry a documented performance contract), SQL
UDFs have NO Python anywhere: Catalyst inlines the RETURN expression
into the calling plan at analysis time, so
``SELECT quality_score(text) FROM docs`` plans as the same
whole-stage-codegen projection as the Column API — full scan speed on
a 1000-executor cluster, usable by BI tools and SQL-only consumers.

Every function body is a hand-translated twin of its Column
implementation in operators/text.py / operators/sampling.py, and
tests/test_sql_text.py pins SQL == Column VALUE EQUALITY over the
documents fixture plus the hostile edge rows (NULL, empty,
whitespace-only, tab/newline-led text) — the same twin-surface
discipline as the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Shared expression fragments (Spark SQL syntax). {t} is the argument.
_TOKS = r"filter(split(trim({t}), '\\s+'), x -> x != '')"
_NTOK = f"size({_TOKS})"
_STOP = (
    r"size(regexp_extract_all(lower({t}),"
    r" '\\b(the|a|and|of|to|is|in|it|on|for)\\b', 0))"
)
_PUNCT = r"size(regexp_extract_all({t}, '[^A-Za-z0-9\\s]', 0))"


def _marker(lang_pat: str) -> str:
    return (
        r"size(regexp_extract_all(lower({t}), '\\b("
        + lang_pat
        + r")\\b', 0))"
    )


_MARKERS = {
    "en": _marker("the|and|of|is|to"),
    "de": _marker("der|die|und|nicht|das"),
    "es": _marker("el|la|que|los|una"),
    "fr": _marker("le|les|des|est|une"),
}

_DEFS: dict[str, str] = {
    "ws_token_count": f"(t STRING) RETURNS INT RETURN {_NTOK}".replace(
        "{t}", "t"
    ),
    "bpe_token_count": (
        "(t STRING) RETURNS INT RETURN "
        r"size(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0))"
    ),
    "lang_id": (
        "(t STRING) RETURNS STRING RETURN CASE "
        + "WHEN greatest("
        + ", ".join(_MARKERS.values())
        + ") <= 0 THEN 'und' "
        + "".join(
            f"WHEN {m} = greatest(" + ", ".join(_MARKERS.values()) + f") THEN '{lang}' "
            for lang, m in _MARKERS.items()
        )
        + "ELSE 'und' END"
    ).replace("{t}", "t"),
    "quality_score": (
        "(t STRING) RETURNS DOUBLE RETURN CASE "
        f"WHEN t IS NULL OR char_length(t) = 0 OR {_NTOK} = 0 "
        "THEN CAST(NULL AS DOUBLE) "
        "ELSE round("
        f"least(CAST({_NTOK} AS DOUBLE) / 100.0, 1.0) * 0.5"
        f" + least(try_divide(CAST({_STOP} AS DOUBLE),"
        f" CAST({_NTOK} AS DOUBLE)) * 3.0, 1.0) * 0.3"
        f" + (1.0 - least(try_divide(CAST({_PUNCT} AS DOUBLE),"
        " CAST(char_length(t) AS DOUBLE)) * 10.0, 1.0)) * 0.2"
        ", 6) END"
    ).replace("{t}", "t"),
    "hash_uniform": (
        "(key STRING, seed INT) RETURNS DOUBLE RETURN "
        "CAST(conv(substr(md5(concat(cast(seed AS STRING), ':', key)),"
        " 1, 15), 16, 10) AS BIGINT)"
        " / CAST(1152921504606846976 AS DOUBLE)"
    ),
    "fingerprint_md5": (
        "(t STRING) RETURNS STRING RETURN "
        f"md5(array_join(array_sort(array_distinct({_TOKS})), ' '))"
    ).replace("{t}", "t"),
}


def register_text_sql_functions(spark: SparkSession) -> None:
    """CREATE OR REPLACE the text-analysis SQL functions on this
    session: ws_token_count, bpe_token_count, lang_id, quality_score,
    fingerprint_md5, hash_uniform. Idempotent; session-scoped
    (temporary functions, the register_sql_functions convention)."""
    for name, body in _DEFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
