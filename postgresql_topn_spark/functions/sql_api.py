"""SQL-callable registration — the PG-like API for ``spark.sql()`` users.

The reference's users call ``topn(jsonb, n)``, ``topn_add``,
``topn_union`` directly in SQL (update/topn--2.0.0.sql:2-15) and — the
flagship pattern — ``SELECT keys, topn_add_agg(item) … GROUP BY keys``
(update/topn--2.3.0--2.3.1.sql:34-51, README.md:84-96). Spark's
registration surface for session-scoped functions is Python UDF/UDTF/
pandas-UDAF registration, so that is what this module provides:

- ``topn(sketch, n)`` — a Python UDTF (SETOF topn_record, like the
  reference SRF topn.c:189-283), usable with LATERAL.
- ``topn_add(sketch, item)`` / ``topn_union(a, b)`` — scalar UDFs with
  the reference's NULL matrix and prune policies.
- ``topn_entries(sketch, n)`` — array<struct> form of topn for callers
  that prefer explode().
- ``topn_add_agg(item)`` / ``topn_union_agg(sketch)`` /
  ``topn_weighted_agg(item, weight)`` — GROUPED_AGG pandas UDAFs so the
  reference's primary aggregate API works verbatim in ``GROUP BY``
  queries (Arrow-batched; the whole group's items stream through one
  Python worker).

NOTE the performance contract: these registered forms cross the
Python/Arrow boundary and exist for SQL-surface parity and scalar/ad-hoc
use. Unlike the Column-API aggregates (functions/aggregates.py), a
GROUPED_AGG pandas UDAF gets no Catalyst partial aggregation: every raw
row shuffles to its group's reducer before Python sees it. The hot
aggregation path for ``spark.sql()`` users is still Column-API
composition (suite.py shows every pattern), which stays entirely
JVM-side; registering does not slow anything else down.

GUC parity: the reference reads ``topn.number_of_counters`` at every
call (topn.c:229-233). Worker-side Python cannot read the session conf
(no SparkSession exists in UDF/UDTF workers or the UDTF analyze
process), so per-call semantics are provided one level up, two ways:

- :func:`postgresql_topn_spark.conf.set_number_of_counters`
  re-registers the SQL functions of every session that registered
  without an explicit ``counters=`` — the Spark analogue of
  PostgreSQL's GUC assign hook.
- a raw ``spark.conf.set("spark.topn.numberOfCounters", …)`` is ALSO
  honored: registering with ``counters=None`` installs a per-call conf
  check on that session's ``sql()`` entry point (one ``conf.get`` py4j
  round-trip per call, ~0.1 ms) that lazily re-registers when the raw
  key changed — so, like the reference, the budget in effect is the one
  at call time, however it was set. Invalid values surface at the next
  ``sql()`` call rather than at SET time (Spark confs have no assign
  hook to validate in).
"""

from __future__ import annotations

import weakref

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import PandasUDFType, pandas_udf, udf, udtf

from postgresql_topn_spark.conf import (
    CONF_KEY,
    DEFAULT_COUNTERS,
    INT64_MAX,
    resolve_counters,
)
from postgresql_topn_spark.functions.sketch import SKETCH_TYPE
from postgresql_topn_spark.operators.sketch_state import truncate_key_bytes

# Sessions that registered with counters=None (follow-the-conf). A conf
# change through set_number_of_counters() re-registers these so the next
# spark.sql() call sees the new budget — PG's GUC assign-hook analogue.
_FOLLOW_CONF_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _sorted_items(sketch: dict) -> list[tuple[str, int]]:
    return sorted(sketch.items(), key=lambda kv: (-kv[1], kv[0]))


def _prune(sketch: dict, counters: int) -> dict:
    if len(sketch) <= counters:
        return sketch
    return dict(_sorted_items(sketch)[:counters])


def refresh_sql_registration(spark: SparkSession) -> None:
    """Re-register the SQL surface if *spark* follows the session conf.
    Called by conf.set_number_of_counters (the GUC assign hook)."""
    if spark in _FOLLOW_CONF_SESSIONS:
        register_sql_functions(spark)


def _raw_conf(spark: SparkSession) -> str:
    return str(spark.conf.get(CONF_KEY, str(DEFAULT_COUNTERS)))


def _install_conf_watch(spark: SparkSession) -> None:
    """Honor raw ``spark.conf.set(CONF_KEY, …)`` per ``sql()`` call.

    Wraps this session object's ``sql`` bound method with a cheap
    conf-version check: when the raw key differs from the value the
    current registration was built with, re-register first. Scoped to
    sessions that opted into the SQL surface via
    ``register_sql_functions(counters=None)``; explicit-counters
    registrations leave the wrapper installed but inert (the follow-set
    membership gates it). Idempotent."""
    if getattr(spark, "_topn_sql_conf_watch", False):
        return
    orig_sql = spark.sql

    def sql_with_guc_check(*args, **kwargs):
        if (
            spark in _FOLLOW_CONF_SESSIONS
            and _raw_conf(spark) != getattr(spark, "_topn_registered_conf", None)
        ):
            register_sql_functions(spark)
        return orig_sql(*args, **kwargs)

    spark.sql = sql_with_guc_check
    spark._topn_sql_conf_watch = True


def register_sql_functions(spark: SparkSession, *, counters: int | None = None) -> None:
    """Register the topn surface for ``spark.sql()`` sessions.

    With ``counters=None`` the budget follows the session conf: it is
    re-resolved whenever :func:`~postgresql_topn_spark.conf.
    set_number_of_counters` changes it (per-call GUC semantics,
    topn.c:229-233). An explicit ``counters=`` pins the budget until the
    next explicit registration."""
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

    # --- GROUPED_AGG aggregates: the reference's primary API surface ---
    # (update/topn--2.3.0--2.3.1.sql:34-51). Arrow ships each group's
    # column batch; Python counts/merges and returns one bounded map.
    # Semantics mirror functions/aggregates.py: NULL items/sketches are
    # skipped but an all-NULL group still yields {} (topn.c:655-661),
    # keys are byte-capped on entry, sums saturate at INT64_MAX, and the
    # result is pruned to the top `c` by (frequency DESC, item ASC).

    @pandas_udf(SKETCH_TYPE, PandasUDFType.GROUPED_AGG)
    def topn_add_agg_udaf(items: pd.Series) -> dict:
        counts: dict[str, int] = {}
        for it in items:
            if it is None:
                continue
            k = truncate_key_bytes(str(it))
            counts[k] = counts.get(k, 0) + 1
        return _prune(
            {k: min(v, INT64_MAX) for k, v in counts.items()}, c
        )

    @pandas_udf(SKETCH_TYPE, PandasUDFType.GROUPED_AGG)
    def topn_union_agg_udaf(sketches: pd.Series) -> dict:
        out: dict[str, int] = {}
        for sk in sketches:
            if sk is None:
                continue
            for k, v in sk.items():
                out[k] = min(out.get(k, 0) + v, INT64_MAX)
        return _prune(out, c)

    @pandas_udf(SKETCH_TYPE, PandasUDFType.GROUPED_AGG)
    def topn_weighted_agg_udaf(items: pd.Series, weights: pd.Series) -> dict:
        # beyond-reference additive-measure form (aggregates.py:189-213):
        # NULL weights contribute 0; items with total weight <= 0 drop.
        totals: dict[str, int] = {}
        for it, w in zip(items, weights):
            if it is None:
                continue
            k = truncate_key_bytes(str(it))
            # NULL weights arrive as NaN in pandas' float-promoted column
            wv = 0 if (w is None or pd.isna(w)) else int(w)
            totals[k] = min(totals.get(k, 0) + wv, INT64_MAX)
        return _prune({k: v for k, v in totals.items() if v > 0}, c)

    spark.udtf.register("topn", TopnUdtf)
    spark.udf.register("topn_add", topn_add_udf)
    spark.udf.register("topn_union", topn_union_udf)
    spark.udf.register("topn_entries", topn_entries_udf)
    spark.udf.register("topn_add_agg", topn_add_agg_udaf)
    spark.udf.register("topn_union_agg", topn_union_agg_udaf)
    spark.udf.register("topn_weighted_agg", topn_weighted_agg_udaf)

    if counters is None:
        _FOLLOW_CONF_SESSIONS.add(spark)
        spark._topn_registered_conf = _raw_conf(spark)
        _install_conf_watch(spark)
    else:
        _FOLLOW_CONF_SESSIONS.discard(spark)
