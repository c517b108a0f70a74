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
            return {truncate_key_bytes(str(item)): 1}
        if item is None:
            return sketch
        item = truncate_key_bytes(str(item))
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
            out[k] = out.get(k, 0) + v
        # exact Python-int sums, ONE both-direction clamp at emit: the
        # old min(..., INT64_MAX) per-add capped only upward, so a
        # hugely-negative merged total crashed the Arrow int64 return
        # (and for two operands exact-then-clamp equals the Column
        # lane's sign-aware _sat_add)
        return _prune(
            {k: max(min(v, INT64_MAX), -INT64_MAX - 1) for k, v in out.items()},
            c,
        )

    @udf(returnType="array<struct<item:string,frequency:bigint>>")
    def topn_entries_udf(sketch: dict, n: int):
        if n is not None and n > c:
            raise ValueError(
                f"requested n={n} is greater than the configured "
                f"number of counters ({c})"
            )
        if sketch is None or n is None:
            return None
        if n <= 0:
            return []
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
                # exact sums, one clamp at emit (matches the Column
                # lane's decimal-sum-then-clamp): the per-add upward
                # clamp was arrival-order dependent for mixed signs
                # and let negative totals under INT64_MIN crash Arrow
                out[k] = out.get(k, 0) + v
        return _prune(
            {k: max(min(v, INT64_MAX), -INT64_MAX - 1) for k, v in out.items()},
            c,
        )

    # Precision caveat (SQL surface only): a NULL weight in a group makes
    # Arrow ship the column as float64, so integer weights above 2^53
    # lose ulps before Python sees them. The Column API sums INTEGRAL
    # weight columns directly in Spark longs (exact for the full int64
    # range, aggregates.py topn_weighted_agg) — use it when weights can
    # exceed 2^53; fractional weights round-trip through double on every
    # surface (they already carry double precision at the source).
    @pandas_udf(SKETCH_TYPE, PandasUDFType.GROUPED_AGG)
    def topn_weighted_agg_udaf(items: pd.Series, weights: pd.Series) -> dict:
        # beyond-reference additive-measure form (aggregates.py:189-213):
        # NULL/NaN weights contribute 0; items with total weight <= 0
        # drop. Fractional weights round HALF-UP (away from zero) per
        # row — the Column API's F.round semantics — NOT int() truncation
        # (int(2.7) == 2 would silently disagree with the Column lane).
        # The rounding rule is SHARED with the Tier-2 sketch
        # (sketch_state.weight_to_long): Decimal on the shortest repr
        # because Spark's F.round is BigDecimal-based (naive wf + 0.5
        # diverges on edge doubles), saturation for infinities and
        # beyond-int64 magnitudes (a raw Decimal quantize of 1e30 would
        # blow the 28-digit context and kill the task).
        from postgresql_topn_spark.operators.sketch_state import (
            weight_to_long,
        )

        totals: dict[str, int] = {}
        for it, w in zip(items, weights):
            if it is None:
                continue
            k = truncate_key_bytes(str(it))
            wv = weight_to_long(w)
            # exact bigint running sum, ONE clamp at the end: a running
            # per-add clamp would make the total depend on row order,
            # which a distributed aggregate must never do
            totals[k] = totals.get(k, 0) + wv
        return _prune(
            {
                k: max(min(v, INT64_MAX), -INT64_MAX - 1)
                for k, v in totals.items()
                if v > 0
            },
            c,
        )

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


# ---------------------------------------------------------------------------
# Two-phase SQL surface — partial-combining aggregation for spark.sql users
# ---------------------------------------------------------------------------
#
# The registered GROUPED_AGG UDAFs above ship every raw row to one Python
# reducer per group — fine for parity/ad-hoc use, a wall for a hot group
# at scale. The reference's own aggregate is parallel-combining
# (topn.c:509-625, update/topn--2.3.0--2.3.1.sql:34-51). SQL users get
# that in two ways:
#
# 1. PURE-BUILT-IN SQL, generated by topn_add_agg_sql / topn_union_agg_sql
#    below: the Tier-1 composition (count -> window rank -> pack) compiled
#    to one SQL string. Zero Python stages; Catalyst supplies MAP-SIDE
#    partial aggregation on the (group, item) count, spill, and AQE —
#    identical plan to the Column API (functions/aggregates.py).
#
# 2. A one-line SALTED REWRITE of the UDAF form, when the UDAF API is
#    wanted verbatim. Replace
#        SELECT g, topn_add_agg(item) FROM t GROUP BY g
#    with
#        SELECT g, topn_union_agg(sk) AS sk FROM (
#          SELECT g, topn_add_agg(item) AS sk
#          FROM t GROUP BY g, pmod(xxhash64(coalesce(item, '')), 64)
#        ) GROUP BY g
#    Each item lands in exactly one salt bucket, so per-bucket counts are
#    exact and any global top-N item survives its bucket's top-N prune —
#    the merged result is IDENTICAL to the unsalted form (the same
#    lossless argument as aggregates.py's salt_buckets path), but a hot
#    group's rows spread over 64 reducers instead of one. (Caveat: salt
#    on the same byte-truncated form the aggregate keys on if items can
#    exceed 255 bytes.) Pinned by test_sql_api.py.


def _sql_ident_pairs(
    group_by: "Sequence[str | tuple[str, str]]",
) -> list[tuple[str, str]]:
    return [(g, g) if isinstance(g, str) else (g[0], g[1]) for g in group_by]


def _truncate_sql(s: str, limit: int = 255) -> str:
    """SQL-text twin of sketch._byte_truncate (same exact
    longest-fitting-prefix computation via the monotone filter count)."""
    k = (
        f"size(filter(sequence(1, greatest(least(char_length({s}), {limit}), 1)), "
        f"k -> octet_length(substring({s}, 1, k)) <= {limit}))"
    )
    return f"substring({s}, 1, {k})"


def _normalize_sql(item: str) -> str:
    """SQL-text twin of sketch.normalize_item (TEXT intake + byte cap).
    *item* should be a cheap expression (it is repeated in the text)."""
    s = f"cast(({item}) as string)"
    return (
        f"CASE WHEN octet_length({s}) <= 255 THEN {s} "
        f"ELSE {_truncate_sql(s)} END"
    )


# {cond} is the entry-keep rule: the counting/weighted builders drop
# non-positive totals (not heavy hitters); the UNION builder keeps any
# frequency the input sketches carry (scalar topn_union / MergeTopn
# parity — zero entries are producible via sketch_from_json).
_PACK_SQL = (
    "map_from_entries(coalesce(array_sort(collect_list("
    "CASE WHEN {cond} "
    "THEN named_struct('item', __i, 'frequency', __f) END), "
    "{cmp}), "
    "cast(array() as array<struct<item:string,frequency:bigint>>)))"
)
_DROP_NONPOS_COND = "__f > 0 AND __i IS NOT NULL"
_KEEP_ALL_COND = "__i IS NOT NULL"

_RANK_ORDER = "ORDER BY __f DESC, __i ASC NULLS LAST"


def topn_add_agg_sql(
    source: str,
    group_by: "Sequence[str | tuple[str, str]]",
    item: str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    salt_buckets: int | None = None,
    spark: SparkSession | None = None,
    where: str | None = None,
) -> str:
    """SQL text for ``SELECT keys, topn_add_agg(item) … GROUP BY keys``
    as a pure-built-in two-phase plan (no Python stages, map-side
    partial combine on the count — the reference's parallel aggregate,
    topn.c:509-625, expressed in Catalyst).

    *group_by* entries are either column names or ``(alias, sql_expr)``
    pairs; *item* is any SQL expression (kept cheap — it is repeated).
    Semantics match the Column API / registered UDAF exactly: NULL items
    skipped but all-NULL groups yield ``{}``, TEXT intake with 255-byte
    cap, prune to *counters* by (frequency DESC, item ASC).
    ``salt_buckets`` adds the lossless two-level rank for groups with
    millions of distinct items (see aggregates._rank_and_pack). *where*
    filters raw rows before the count (the original query's WHERE)."""
    from postgresql_topn_spark.conf import resolve_counters as _rc

    c = _rc(counters, spark)
    pairs = _sql_ident_pairs(group_by)
    sel_exprs = ", ".join(f"{e} AS {a}" for a, e in pairs)
    norm = _normalize_sql(item)
    wtext = f"WHERE {where} " if where else ""
    counted = (
        f"SELECT {sel_exprs + ', ' if pairs else ''}{norm} AS __i, "
        f"count({norm}) AS __f FROM {source} {wtext}"
        f"GROUP BY {', '.join(str(i + 1) for i in range(len(pairs) + 1))}"
    )
    return _two_phase_pack_sql(counted, pairs, c, out_col, salt_buckets)


def _two_phase_pack_sql(
    counted: str,
    pairs: list[tuple[str, str]],
    c: int,
    out_col: str,
    salt_buckets: int | None,
) -> str:
    """Shared rank+pack tail of the two-phase builders: optional
    lossless salted pre-rank, per-group top-c rank, entry pack (the
    non-positive-total drop rule of the counting/weighted builders)."""
    from postgresql_topn_spark.functions.sketch import ENTRY_CMP_SQL

    names = ", ".join(a for a, _ in pairs)
    prefix_names = f"{names}, " if pairs else ""
    part = f"PARTITION BY {names} " if pairs else ""
    if salt_buckets and salt_buckets > 1:
        salt_part = (
            f"PARTITION BY {prefix_names}"
            f"pmod(xxhash64(coalesce(__i, '')), {salt_buckets}) "
        )
        counted = (
            f"SELECT {prefix_names}__i, __f FROM ("
            f"SELECT {prefix_names}__i, __f, "
            f"row_number() OVER ({salt_part}{_RANK_ORDER}) AS __srn "
            f"FROM ({counted})) WHERE __srn <= {c} OR __i IS NULL"
        )
    pack = _PACK_SQL.format(cmp=ENTRY_CMP_SQL, cond=_DROP_NONPOS_COND)
    return (
        f"SELECT {prefix_names}{pack} AS {out_col} FROM ("
        f"SELECT {prefix_names}__i, __f, "
        f"row_number() OVER ({part}{_RANK_ORDER}) AS __rn "
        f"FROM ({counted})) WHERE __rn <= {c} OR __i IS NULL "
        + (f"GROUP BY {names}" if pairs else "")
    )


def topn_weighted_agg_sql(
    source: str,
    group_by: "Sequence[str | tuple[str, str]]",
    item: str,
    weight: str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    salt_buckets: int | None = None,
    spark: SparkSession | None = None,
    where: str | None = None,
) -> str:
    """SQL text for ``SELECT keys, topn_weighted_agg(item, weight) …
    GROUP BY keys`` as the two-phase built-in plan — the weighted twin
    of topn_add_agg_sql. Semantics match the Column API
    (aggregates.topn_weighted_agg): NULL items skipped (all-NULL groups
    yield ``{}``), NULL/NaN weights contribute 0, per-row round-half-up
    to int64 with sign saturation, exact decimal(38,0) sum clamped to
    the int64 range, items whose total is <= 0 dropped. SQL-text
    weights route through double (the >2^53 integral caveat — use the
    Column API when integer weights can exceed 2^53)."""
    from postgresql_topn_spark.conf import resolve_counters as _rc

    c = _rc(counters, spark)
    pairs = _sql_ident_pairs(group_by)
    sel_exprs = ", ".join(f"{e} AS {a}" for a, e in pairs)
    norm = _normalize_sql(item)
    wd = f"cast(({weight}) as double)"
    w_row = (
        f"CASE WHEN {wd} IS NULL OR isnan({wd}) THEN cast(0 as bigint) "
        f"ELSE coalesce(try_cast(round({wd}, 0) as bigint), "
        f"CASE WHEN round({wd}, 0) > 0 THEN {INT64_MAX}"
        f" ELSE {-INT64_MAX - 1} END) END"
    )
    freq = (
        f"cast(least(greatest(sum(cast({w_row} as decimal(38,0))), "
        f"cast({-INT64_MAX - 1} as decimal(38,0))), "
        f"cast({INT64_MAX} as decimal(38,0))) as bigint)"
    )
    wtext = f"WHERE {where} " if where else ""
    # a NULL-item group row must carry __f = 0 (not its weight sum):
    # it exists only as the keep-the-group marker, and a big __f would
    # let it consume a top-c rank slot from a real item
    counted = (
        f"SELECT {sel_exprs + ', ' if pairs else ''}{norm} AS __i, "
        f"CASE WHEN ({norm}) IS NULL THEN cast(0 as bigint) "
        f"ELSE {freq} END AS __f FROM {source} {wtext}"
        f"GROUP BY {', '.join(str(i + 1) for i in range(len(pairs) + 1))}"
    )
    return _two_phase_pack_sql(counted, pairs, c, out_col, salt_buckets)


def topn_union_agg_sql(
    source: str,
    group_by: "Sequence[str | tuple[str, str]]",
    sketch_col: str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    spark: SparkSession | None = None,
    where: str | None = None,
) -> str:
    """SQL text for ``SELECT keys, topn_union_agg(sketch) … GROUP BY``
    as a pure-built-in two-phase plan: explode the (bounded, <= counters
    entries) stored sketches, sum per item with map-side partial
    combine, rank, re-pack. Frequencies sum in decimal(38,0) and
    saturate at INT64_MAX like the reference (topn.c:997-1009) instead
    of erroring under ANSI mode. NULL / empty sketches keep their group
    alive with ``{}`` (LATERAL VIEW OUTER). *where* filters source rows
    before the explode (predicates see the source's columns only)."""
    from postgresql_topn_spark.conf import resolve_counters as _rc
    from postgresql_topn_spark.functions.sketch import ENTRY_CMP_SQL

    c = _rc(counters, spark)
    pairs = _sql_ident_pairs(group_by)
    names = ", ".join(a for a, _ in pairs)
    sel_exprs = ", ".join(f"{e} AS {a}" for a, e in pairs)
    prefix_names = f"{names}, " if pairs else ""
    part = f"PARTITION BY {names} " if pairs else ""
    wtext = f"WHERE {where} " if where else ""
    summed = (
        f"SELECT {sel_exprs + ', ' if pairs else ''}__t.__i AS __i, "
        # coalesce INSIDE least: Spark's least skips NULLs, so an
        # all-NULL (empty-sketch marker) group must become 0 before the
        # saturation clamp, not fall through to INT64_MAX. The clamp is
        # BOTH-direction: negative frequencies are first-class on the
        # union path, and a total under INT64_MIN would otherwise fail
        # the bigint cast under ANSI (review pin)
        f"cast(least(greatest(coalesce(sum(cast(__t.__fr as decimal(38,0))), "
        f"0), {-INT64_MAX - 1}), {INT64_MAX}) as bigint) AS __f "
        f"FROM {source} "
        f"LATERAL VIEW OUTER explode({sketch_col}) __t AS __i, __fr "
        f"{wtext}"
        f"GROUP BY {', '.join(str(i + 1) for i in range(len(pairs) + 1))}"
    )
    pack = _PACK_SQL.format(cmp=ENTRY_CMP_SQL, cond=_KEEP_ALL_COND)
    return (
        f"SELECT {prefix_names}{pack} AS {out_col} FROM ("
        f"SELECT {prefix_names}__i, coalesce(__f, 0) AS __f, "
        f"row_number() OVER ({part}{_RANK_ORDER}) AS __rn "
        f"FROM ({summed})) WHERE __rn <= {c} OR __i IS NULL "
        + (f"GROUP BY {names}" if pairs else "")
    )


# ---------------------------------------------------------------------------
# topn_sql: run the reference's flagship SQL verbatim WITHOUT the UDAF wall
# ---------------------------------------------------------------------------
#
# The registered GROUPED_AGG UDAFs above are single-reducer-per-group: a
# user who pastes the reference's flagship
#     SELECT keys, topn_add_agg(item) FROM t GROUP BY keys
# (update/topn--2.3.0--2.3.1.sql:34-51, README.md:84-96) into spark.sql()
# verbatim gets the slow lane. topn_sql() is the front door that fixes
# that: it pattern-matches topn_add_agg / topn_union_agg aggregate calls
# in the statement (including inside WITH-CTE bodies) and rewrites each
# matched SELECT onto the pure-built-in two-phase plan above — zero
# Python stages, map-side partial combine, identical results (the
# rewritten form is the same count->rank->pack composition the Column
# API plans, equivalence pinned in tests). Shapes the rewriter cannot
# prove safe fall back to the registered UDAF verbatim, with a runtime
# warning naming the scale caveat.

import re as _re
import warnings as _warnings

_TOPN_AGG_RE = _re.compile(
    r"^(topn_add_agg|topn_union_agg|topn_weighted_agg)\s*\(", _re.I
)
_AGG_ARITY = {"topn_add_agg": 1, "topn_union_agg": 1, "topn_weighted_agg": 2}
_IDENT_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_CLAUSE_RE = _re.compile(
    r"\b(select|from|where|group\s+by|having|order\s+by|limit|union|"
    r"intersect|except|window|qualify|distribute\s+by|sort\s+by|"
    r"cluster\s+by|pivot|unpivot|tablesample)\b",
    _re.I,
)
_ANY_TOPN_FN_RE = _re.compile(
    r"\btopn(_add|_union|_entries|_add_agg|_union_agg|_weighted_agg)?\s*\(",
    _re.I,
)


def _top_mask(s: str) -> list[bool]:
    """True at positions that sit at paren-depth 0 outside string/ident
    literals and comments — the only places clause keywords and list
    commas are structural."""
    mask = [False] * len(s)
    depth = 0
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"', "`"):
            q = ch
            i += 1
            while i < n:
                if s[i] == "\\" and q != "`":
                    i += 2
                    continue
                if s[i] == q:
                    if i + 1 < n and s[i + 1] == q:  # doubled-quote escape
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            continue
        if ch == "-" and i + 1 < n and s[i + 1] == "-":
            while i < n and s[i] != "\n":
                i += 1
            continue
        if ch == "/" and i + 1 < n and s[i + 1] == "*":
            j = s.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(depth - 1, 0)
        elif depth == 0:
            mask[i] = True
        i += 1
    return mask


def _strip_sql_comments(s: str) -> str:
    """Replace -- line comments and /* */ block comments with a space,
    string-literal-aware. Rewritten statements are emitted as ONE line,
    so a surviving line comment would swallow everything after it."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"', "`"):
            q = ch
            j = i + 1
            while j < n:
                if s[j] == "\\" and q != "`":
                    j += 2
                    continue
                if s[j] == q:
                    if j + 1 < n and s[j + 1] == q:
                        j += 2
                        continue
                    break
                j += 1
            out.append(s[i : min(j + 1, n)])
            i = j + 1
            continue
        if ch == "-" and i + 1 < n and s[i + 1] == "-":
            nl = s.find("\n", i)
            out.append(" ")
            i = n if nl < 0 else nl + 1
            continue
        if ch == "/" and i + 1 < n and s[i + 1] == "*":
            e = s.find("*/", i + 2)
            out.append(" ")
            i = n if e < 0 else e + 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _split_top_commas(s: str) -> list[str]:
    mask = _top_mask(s)
    parts, start = [], 0
    for i, ch in enumerate(s):
        if ch == "," and mask[i]:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _norm_expr(s: str) -> str:
    """Case-folded and whitespace-collapsed OUTSIDE quoted spans only:
    folding a literal's case (or collapsing its internal whitespace)
    would falsely equate GROUP BY f('A') / f('a  b') with a select key
    f('a') / f('a b') and rewrite to the wrong grouping."""
    out: list[str] = []
    seg: list[str] = []  # pending non-quoted run
    i, n = 0, len(s)

    def flush() -> None:
        if seg:
            # collapse whitespace within the non-quoted run; single
            # spaces at the run edges keep token separation stable
            txt = "".join(seg)
            collapsed = " ".join(txt.split())
            if txt[:1].isspace() and collapsed:
                collapsed = " " + collapsed
            if txt[-1:].isspace() and collapsed.strip():
                collapsed = collapsed + " "
            out.append(collapsed)
            seg.clear()

    while i < n:
        ch = s[i]
        if ch in ("'", '"', "`"):
            flush()
            j = i + 1
            while j < n:
                if s[j] == ch:
                    if j + 1 < n and s[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            out.append(s[i : min(j + 1, n)])
            i = j + 1
            continue
        seg.append(ch.lower())
        i += 1
    flush()
    return "".join(out).strip()


def _clause_spans(s: str):
    """Ordered top-level clause keyword matches, or None if the text
    contains a clause the rewriter does not model."""
    mask = _top_mask(s)
    out = []
    for m in _CLAUSE_RE.finditer(s):
        if all(mask[i] for i in range(m.start(), m.end())):
            out.append(m)
    return out


def _rewrite_select(
    sql: str, *, counters: int | None, spark, salt_buckets: int | None
) -> str | None:
    """Rewrite ONE bare SELECT statement of the flagship shape
    (SELECT keys..., topn_{add,union}_agg(x) AS a FROM src [WHERE p]
    [GROUP BY keys]) onto the two-phase built-in SQL. Returns None when
    the shape is not provably that pattern (caller falls back)."""
    s = sql.strip().rstrip(";").strip()
    # drop leading comments so the SELECT-at-position-0 check sees code
    while True:
        if s.startswith("--"):
            nl = s.find("\n")
            s = "" if nl < 0 else s[nl + 1 :].lstrip()
        elif s.startswith("/*"):
            e = s.find("*/")
            s = "" if e < 0 else s[e + 2 :].lstrip()
        else:
            break
    spans = _clause_spans(s)
    if not spans:
        return None
    kinds = [_norm_expr(m.group(1)) for m in spans]
    if kinds[0] != "select" or spans[0].start() != 0:
        return None
    order = [
        "select",
        "from",
        "where",
        "group by",
        "having",
        "order by",
        "limit",
    ]
    allowed = set(order)
    if any(k not in allowed for k in kinds) or kinds.count("select") != 1:
        return None
    if kinds != sorted(kinds, key=order.index):
        return None  # clauses out of order (e.g. a second SELECT)
    if len(set(kinds)) != len(kinds):
        # a duplicated clause keyword (invalid SQL): rewriting would
        # silently DROP the earlier clause's text — let the engine
        # produce its parse error instead
        return None
    bounds = {k: None for k in allowed}
    for idx, m in enumerate(spans):
        k = _norm_expr(m.group(1))
        end = spans[idx + 1].start() if idx + 1 < len(spans) else len(s)
        bounds[k] = s[m.end() : end].strip()
    select_text = bounds["select"]
    from_text = bounds["from"]
    if select_text is None or from_text is None or not from_text:
        return None
    if _re.match(r"^\s*(distinct|all)\b", select_text, _re.I):
        return None
    items = _split_top_commas(select_text)
    agg = None  # (index, fn, arg, alias)
    keys = []  # (alias, expr) in select order
    for idx, it in enumerate(items):
        m = _TOPN_AGG_RE.match(it)
        if m:
            # whole item must be the call plus an alias: find the
            # matching close paren of the call's open paren
            open_i = it.index("(", m.start(1))
            depth, close_i = 0, -1
            j = open_i
            it_mask_src = it
            while j < len(it_mask_src):
                c = it_mask_src[j]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        close_i = j
                        break
                elif c in ("'", '"', "`"):
                    q = c
                    j += 1
                    while j < len(it_mask_src) and it_mask_src[j] != q:
                        j += 1
                j += 1
            if close_i < 0:
                return None
            rest = it[close_i + 1 :].strip()
            am = _re.match(r"^as\s+([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)$", rest, _re.I)
            if am is None:
                return None  # nested expression or missing alias
            fn_name = m.group(1).lower()
            args = _split_top_commas(it[open_i + 1 : close_i])
            if len(args) != _AGG_ARITY[fn_name] or not all(args):
                return None
            if agg is not None:
                return None  # two agg calls in one list: fall back
            agg = (idx, fn_name, args, am.group(1))
            continue
        if _ANY_TOPN_FN_RE.search(it):
            return None  # some other topn call mixed in: fall back
        tm = _re.match(
            r"^(.*?)\s+as\s+([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)$",
            it,
            _re.I | _re.S,
        )
        if tm and _top_mask(it)[len(tm.group(1)) + 1]:
            keys.append((tm.group(2), tm.group(1).strip()))
        elif _IDENT_RE.match(it):
            keys.append((it, it))
        else:
            return None  # unaliased expression key
    if agg is None:
        return None
    group_text = bounds["group by"]
    if group_text is None:
        if keys:
            return None  # non-aggregated columns without GROUP BY
    else:
        gitems = [_norm_expr(g) for g in _split_top_commas(group_text)]
        covered = set()
        for g in gitems:
            hit = None
            for ki, (a, e) in enumerate(keys):
                if g in (
                    _norm_expr(a),
                    _norm_expr(e),
                    str(ki + 1 if agg[0] > ki else ki + 2),
                ):
                    hit = ki
                    break
            if hit is None:
                return None  # grouping by something not in the select list
            covered.add(hit)
        if covered != set(range(len(keys))):
            return None  # a select key is not grouped (invalid / unsafe)
    where_text = bounds["where"]
    fn, args, out_alias = agg[1], agg[2], agg[3]
    if fn == "topn_add_agg":
        rewritten = topn_add_agg_sql(
            from_text,
            keys,
            args[0],
            counters=counters,
            out_col=out_alias,
            salt_buckets=salt_buckets,
            spark=spark,
            where=where_text,
        )
    elif fn == "topn_weighted_agg":
        rewritten = topn_weighted_agg_sql(
            from_text,
            keys,
            args[0],
            args[1],
            counters=counters,
            out_col=out_alias,
            salt_buckets=salt_buckets,
            spark=spark,
            where=where_text,
        )
    else:
        rewritten = topn_union_agg_sql(
            from_text,
            keys,
            args[0],
            counters=counters,
            out_col=out_alias,
            spark=spark,
            where=where_text,
        )
    # The builders emit keys-then-sketch; restore the original column
    # order when the agg was not the last select item.
    col_order = [a for a, _ in keys]
    col_order.insert(agg[0], out_alias)
    if agg[0] != len(keys):
        rewritten = f"SELECT {', '.join(col_order)} FROM ({rewritten})"
    # HAVING on the GROUP KEYS only (a post-agg filter on key values)
    # == WHERE over the rewritten aggregate's output. Provable subset:
    # every identifier in the predicate must RESOLVE IDENTICALLY on
    # both lanes. Spark resolves HAVING identifiers against SOURCE
    # columns FIRST, aliases second — so an identifier is safe when it
    # is (a) a BARE key (alias == expr == the identifier: both lanes
    # see the same source column), or (b) a key alias provably NOT
    # shadowing a source column (FROM is a resolvable plain table/view
    # whose schema lacks the name — then Spark falls back to the alias,
    # i.e. the key expr, which IS the output column). An alias that
    # shadows a different source column (SELECT d2 AS d ... HAVING d)
    # would filter on the wrong values — decline. Aggregates
    # (count(*)) and function calls also decline to the UDAF lane.
    having_text = bounds["having"]
    if having_text is not None:
        if group_text is None:
            return None  # HAVING without GROUP BY: not the flagship
        bare_keys = {
            _norm_expr(a)
            for a, e in keys
            if _norm_expr(a) == _norm_expr(e)
        }
        alias_keys = {_norm_expr(a) for a, _ in keys} - bare_keys
        src_cols: "set[str] | None" = None
        if alias_keys and spark is not None:
            fm = _re.fullmatch(
                r"([A-Za-z_][A-Za-z0-9_.]*)"
                r"(\s+(as\s+)?[A-Za-z_][A-Za-z0-9_]*)?",
                from_text.strip(),
                _re.I,
            )
            if fm:
                try:
                    src_cols = {
                        c.lower() for c in spark.table(fm.group(1)).columns
                    }
                except Exception:
                    src_cols = None
        stripped = _re.sub(r"'(?:[^'\\]|\\.)*'", " ", having_text)
        sql_words = {
            "and", "or", "not", "in", "between", "like", "rlike",
            "ilike", "is", "null", "true", "false", "escape", "exists",
        }
        for im in _re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", stripped):
            w = im.group(0).lower()
            if w in sql_words:
                continue
            after = stripped[im.end() :].lstrip()
            if after.startswith("("):
                return None  # function call
            if w in bare_keys:
                continue
            if w in alias_keys and src_cols is not None and w not in src_cols:
                continue  # alias provably unshadowed
            return None
        rewritten = f"SELECT * FROM ({rewritten}) WHERE {having_text}"
    # ORDER BY / LIMIT re-attach on top of the rewrite when every sort
    # item provably names an output KEY column (alias or select-list
    # ordinal — ordinals stay valid because column order is preserved).
    # Sorting by the sketch or an arbitrary expression: fall back.
    order_text, limit_text = bounds["order by"], bounds["limit"]
    if order_text is not None:
        key_names = {_norm_expr(a) for a, _ in keys}
        key_ords = {
            str(i + 1) for i in range(len(col_order)) if col_order[i] != out_alias
        }
        for ob in _split_top_commas(order_text):
            obm = _re.match(
                r"^(.*?)(?:\s+(?:asc|desc))?(?:\s+nulls\s+(?:first|last))?$",
                ob.strip(),
                _re.I | _re.S,
            )
            ref = _norm_expr(obm.group(1)) if obm else ""
            if ref not in key_names and ref not in key_ords:
                return None
        rewritten = f"SELECT * FROM ({rewritten}) ORDER BY {order_text}"
    if limit_text is not None:
        if not _re.fullmatch(r"\d+", limit_text.strip()):
            return None
        if order_text is None:
            rewritten = f"SELECT * FROM ({rewritten})"
        rewritten = f"{rewritten} LIMIT {limit_text.strip()}"
    return rewritten


def _split_ctes(sql: str):
    """Parse an optional top-level WITH prefix. Returns
    (ctes: list[(name, body)], main: str) or None on shapes the scanner
    does not model (RECURSIVE, column lists)."""
    s = sql.strip().rstrip(";").strip()
    m = _re.match(r"^with\b", s, _re.I)
    if not m:
        return [], s
    if _re.match(r"^with\s+recursive\b", s, _re.I):
        return None
    i = m.end()
    ctes = []
    n = len(s)
    while True:
        mm = _re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+as\s*\(", s[i:], _re.I)
        if not mm:
            return None
        name = mm.group(1)
        body_start = i + mm.end()  # position just after '('
        depth = 1
        j = body_start
        while j < n and depth:
            c = s[j]
            if c in ("'", '"', "`"):
                q = c
                j += 1
                while j < n:
                    # mirror _top_mask's escape handling — the two
                    # scanners must agree on where strings end
                    if s[j] == "\\" and q != "`":
                        j += 2
                        continue
                    if s[j] == q:
                        if j + 1 < n and s[j + 1] == q:
                            j += 2
                            continue
                        break
                    j += 1
            elif c == "-" and j + 1 < n and s[j + 1] == "-":
                # line comment: a stray paren inside would desync depth
                while j < n and s[j] != "\n":
                    j += 1
                continue
            elif c == "/" and j + 1 < n and s[j + 1] == "*":
                e = s.find("*/", j + 2)
                j = n if e < 0 else e + 2
                continue
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if not depth:
                    break
            j += 1
        if depth:
            return None
        ctes.append((name, s[body_start:j]))
        k = j + 1
        while k < n and s[k].isspace():
            k += 1
        if k < n and s[k] == ",":
            i = k + 1
            continue
        return ctes, s[k:]


def rewrite_topn_sql(
    sql: str,
    *,
    counters: int | None = None,
    spark: SparkSession | None = None,
    salt_buckets: int | None = None,
) -> str | None:
    """Rewrite every flagship ``topn_add_agg`` / ``topn_union_agg`` /
    ``topn_weighted_agg`` aggregate SELECT in *sql* (top level, inside
    WITH-CTE bodies, and under an ``INSERT INTO … SELECT`` — the
    reference's own rollup-maintenance statement, README.md:84-88) onto
    the two-phase pure-built-in plan. Returns the rewritten statement,
    or None when nothing could be rewritten."""
    # strip comments once, statement-wide: clause texts are interpolated
    # into ONE-LINE generated SQL, where a surviving -- comment would
    # swallow the rest of the statement
    s = _strip_sql_comments(sql).strip()
    ins = _re.match(
        r"^(insert\s+(?:into|overwrite)\s+(?:table\s+)?"
        r"[A-Za-z_][\w.]*\s*(?:\([^)]*\)\s*)?)",
        s,
        _re.I,
    )
    if ins:
        body = rewrite_topn_sql(
            s[ins.end() :],
            counters=counters,
            spark=spark,
            salt_buckets=salt_buckets,
        )
        return None if body is None else f"{ins.group(1)}{body}"
    parsed = _split_ctes(s)
    if parsed is None:
        return None
    ctes, main = parsed
    changed = False
    new_ctes = []
    for name, body in ctes:
        nb = _rewrite_select(
            body, counters=counters, spark=spark, salt_buckets=salt_buckets
        )
        if nb is not None:
            changed = True
            new_ctes.append((name, nb))
        else:
            new_ctes.append((name, body))
    nm = _rewrite_select(
        main, counters=counters, spark=spark, salt_buckets=salt_buckets
    )
    if nm is not None:
        changed = True
        main = nm
    if not changed:
        return None
    if new_ctes:
        cte_text = ",\n".join(f"{n} AS ({b})" for n, b in new_ctes)
        return f"WITH {cte_text}\n{main}"
    return main


def topn_sql(
    spark: SparkSession,
    sql: str,
    *,
    counters: int | None = None,
    salt_buckets: int | None = None,
):
    """Run a topn SQL statement with the scale-safe plan: the flagship
    ``SELECT keys, topn_add_agg(item) … GROUP BY keys`` (and the
    ``topn_union_agg`` merge form) is rewritten onto the two-phase
    pure-built-in composition — zero Python stages, map-side partial
    combine, the reference's parallel aggregate (topn.c:509-625) as
    Catalyst plans it. Everything else in the statement (LATERAL
    ``topn()`` extraction, scalar ``topn_add``/``topn_union``,
    unrecognized aggregate shapes) runs through the registered SQL
    functions unchanged.

    This is the recommended ``spark.sql`` entry point for aggregate
    queries; calling ``spark.sql`` directly on a UDAF aggregate still
    works but ships every raw row to one Python reducer per group."""
    rewritten = rewrite_topn_sql(
        sql, counters=counters, spark=spark, salt_buckets=salt_buckets
    )
    text = rewritten if rewritten is not None else sql
    # Scan the FINAL text, not just the rewrite's all-or-nothing result:
    # a partially-rewritten statement (one CTE rewritten, another
    # aggregate not provable) leaves the surviving aggregate on the
    # UDAF lane and owes the same scale caveat (ADVICE r4).
    if _re.search(r"\btopn_(add|union|weighted)_agg\s*\(", text, _re.I):
        _warnings.warn(
            "topn_sql could not rewrite this aggregate onto the two-phase "
            "plan; it will run as a GROUPED_AGG pandas UDAF (every raw row "
            "shuffles to one Python reducer per group). For hot groups use "
            "the flagship shape `SELECT keys, topn_add_agg(item) FROM t "
            "GROUP BY keys`, the Column API, or the documented salted "
            "rewrite.",
            stacklevel=2,
        )
    if _ANY_TOPN_FN_RE.search(text):
        register_sql_functions(spark, counters=counters)
    return spark.sql(text)
