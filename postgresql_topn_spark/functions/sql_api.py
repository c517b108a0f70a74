"""SQL-callable registration — the PG-like API for ``spark.sql()`` users.

The reference's users call ``topn(jsonb, n)``, ``topn_add``,
``topn_union`` directly in SQL (update/topn--2.0.0.sql:2-15). Spark's
equivalent registration surface for session-scoped functions is Python
UDF/UDTF registration, so that is what this module provides:

- ``topn(sketch, n)`` — a Python UDTF (SETOF topn_record, like the
  reference SRF topn.c:189-283), usable with LATERAL.
- ``topn_add(sketch, item)`` / ``topn_union(a, b)`` — scalar UDFs with
  the reference's NULL matrix and prune policies.
- ``topn_entries(sketch, n)`` — array<struct> form of topn for callers
  that prefer explode().

NOTE the performance contract: these registered forms cross the
Python/Arrow boundary per row and exist for SQL-surface parity and
scalar/ad-hoc use. The hot aggregation path for ``spark.sql()`` users is
still Column-API composition (suite.py shows every pattern), which stays
entirely JVM-side; registering does not slow anything else down.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udf, udtf

from postgresql_topn_spark.conf import INT64_MAX, resolve_counters
from postgresql_topn_spark.functions.sketch import SKETCH_TYPE
from postgresql_topn_spark.operators.sketch_state import truncate_key_bytes


def _sorted_items(sketch: dict) -> list[tuple[str, int]]:
    return sorted(sketch.items(), key=lambda kv: (-kv[1], kv[0]))


def _prune(sketch: dict, counters: int) -> dict:
    if len(sketch) <= counters:
        return sketch
    return dict(_sorted_items(sketch)[:counters])


def register_sql_functions(spark: SparkSession, *, counters: int | None = None) -> None:
    """Register the topn surface for ``spark.sql()`` sessions. The
    counter budget is resolved once at registration (the reference reads
    its GUC per call; re-register after changing the conf)."""
    c = resolve_counters(counters, spark)

    @udtf(returnType="item string, frequency bigint")
    class TopnUdtf:
        """topn(sketch, n) -> SETOF (item, frequency) — topn.c:189-283:
        NULL/empty sketch -> 0 rows; n > counters -> error; emits
        min(n, size) entries, frequency DESC, item ASC."""

        def eval(self, sketch: dict, n: int):  # noqa: D401
            if n is not None and n > c:
                raise ValueError(
                    f"requested n={n} is greater than the configured "
                    f"number of counters ({c})"
                )
            if sketch is None or n is None or n <= 0:
                return
            for item, freq in _sorted_items(sketch)[:n]:
                yield item, freq

    @udf(returnType=SKETCH_TYPE)
    def topn_add_udf(sketch: dict, item: str):
        # non-STRICT NULL matrix, topn.c:305-322
        if sketch is None and item is None:
            return {}
        if sketch is None:
            return {truncate_key_bytes(item): 1}
        if item is None:
            return sketch
        item = truncate_key_bytes(item)
        out = dict(sketch)
        if item in out:
            out[item] = min(out[item] + 1, INT64_MAX)
            return out  # prune only fires on insert (topn.c:350)
        out[item] = 1
        return _prune(out, c)

    @udf(returnType=SKETCH_TYPE)
    def topn_union_udf(a: dict, b: dict):
        # STRICT: NULL if either argument is NULL (update/topn--2.0.0.sql:12-15)
        if a is None or b is None:
            return None
        out = dict(a)
        for k, v in b.items():
            out[k] = min(out.get(k, 0) + v, INT64_MAX)
        return _prune(out, c)

    @udf(returnType="array<struct<item:string,frequency:bigint>>")
    def topn_entries_udf(sketch: dict, n: int):
        if n is not None and n > c:
            raise ValueError(
                f"requested n={n} is greater than the configured "
                f"number of counters ({c})"
            )
        if sketch is None or n is None:
            return None
        return _sorted_items(sketch)[:n]

    spark.udtf.register("topn", TopnUdtf)
    spark.udf.register("topn_add", topn_add_udf)
    spark.udf.register("topn_union", topn_union_udf)
    spark.udf.register("topn_entries", topn_entries_udf)
