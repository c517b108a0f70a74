"""Aggregate surface — ``topn_add_agg`` / ``topn_union_agg`` and the
window-frame merge, Tier-1 composition path.

Everything here is built from native groupBy / window / higher-order-map
expressions, so Catalyst supplies partial aggregation (the reference's
serialize/combine parallel-agg plumbing, topn.c:509-625, is free), spill,
AQE and codegen. Results are exact whenever distinct items per group stay
within the counter budget — exactly the regime where the reference is
also exact (SURVEY.md §1.2). For strictly-bounded-memory semantics under
huge per-group cardinality use operators/sketch_state.py (Tier 2).

Scale notes (100 TB design):
- `topn_add_agg` shuffles once on (keys, item) for the exact per-item
  count (map-side partial combine collapses duplicate items before the
  exchange — for skewed heavy-hitter data this is a massive reduction),
  then once on (keys) for the window rank; the final groupBy(keys)
  reuses the window's hash partitioning, so no third exchange.
- Sketch size is bounded (<= counters entries, default 1000) before any
  `collect_list`, so per-group state in the final aggregation is small
  and bounded regardless of input cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from postgresql_topn_spark.conf import INT64_MAX, resolve_counters
from postgresql_topn_spark.functions.sketch import (
    _col,
    empty_sketch,
    merge_sketches,
    normalize_item,
    prune_sketch,
)

_ITEM, _FREQ, _RN = "__topn_item", "__topn_freq", "__topn_rn"


def _restore_group_names(
    out: DataFrame, df: DataFrame, group_cols: Sequence[Column | str]
) -> DataFrame:
    """Rename the internal __gN group columns back to caller-facing
    names. String cols need no lookup; Column expressions are resolved
    in ONE batched select (one analysis round-trip, not one per col)."""
    col_objs = [_col(c) for c in group_cols if not isinstance(c, str)]
    resolved = iter(df.select(*col_objs).columns if col_objs else ())
    for i, c in enumerate(group_cols):
        name = c if isinstance(c, str) else next(resolved)
        out = out.withColumnRenamed(f"__g{i}", name)
    return out


def _pack_entries_agg(drop_nonpositive: bool = True) -> Column:
    """Final per-group packing: collect the (bounded) surviving entries
    into a map, dropping the group-preserving NULL marker rows. Entries
    are pre-sorted (frequency DESC, item ASC) so the map's entry order —
    and therefore its JSON rendering — is deterministic. Empty groups
    (all-NULL items / all-NULL sketches) become ``{}`` like the
    reference's finalizer on a never-initialized state (topn.c:655-661,
    expected/null_tests.out:35-40). One expr-string parse: the Column-API
    form of this tree cost ~60ms of py4j round-trips per query build.

    ``drop_nonpositive`` applies the counting/weighted drop rule (a
    non-positive total is not a heavy hitter). The UNION path passes
    False: the reference's MergeTopn keeps whatever frequencies the
    input sketches carry (zero/negative entries are producible via
    sketch_from_json), matching the scalar topn_union."""
    from postgresql_topn_spark.functions.sketch import ENTRY_CMP_SQL

    cond = f"{_ITEM} IS NOT NULL"
    if drop_nonpositive:
        cond = f"{_FREQ} > 0 AND " + cond
    return F.expr(
        "map_from_entries(coalesce(array_sort(collect_list("
        f"CASE WHEN {cond} "
        f"THEN named_struct('item', {_ITEM}, 'frequency', {_FREQ}) END), "
        f"{ENTRY_CMP_SQL}), "
        "cast(array() as array<struct<item:string,frequency:bigint>>)))"
    )


def _rank_and_pack(
    counted: DataFrame,
    group_cols: Sequence[str],
    counters: int,
    out_col: str,
    salt_buckets: int | None = None,
    drop_nonpositive: bool = True,
) -> DataFrame:
    """Shared tail of both aggregates: window-rank the per-(group,item)
    counts, keep the top *counters* per group, re-group into a map.

    *salt_buckets* enables a lossless two-level rank for skewed groups:
    first keep the top *counters* within (group, hash(item) % salt)
    sub-buckets, then run the global per-group rank over the survivors.
    Any item in a group's true top-N is also in its sub-bucket's top-N
    (the sub-bucket holds a subset of its competitors), so the
    pre-filter drops no winners — but the final per-group sort handles
    at most salt_buckets x counters rows instead of every distinct item
    of a hot group on a single reducer. Use when groups can have
    millions of distinct items (100 TB regime); leave None for the
    default two-exchange plan."""
    # rank expressions as single-parse expr strings (same plan as the
    # Window-API form; a fraction of the construction round-trips)
    order_sql = f"ORDER BY {_FREQ} DESC, {_ITEM} ASC NULLS LAST"
    if salt_buckets and salt_buckets > 1:
        salt_part = ", ".join(
            list(group_cols)
            + [f"pmod(xxhash64(coalesce({_ITEM}, '')), {salt_buckets})"]
        )
        counted = (
            counted.withColumn(
                _RN,
                F.expr(
                    f"row_number() OVER (PARTITION BY {salt_part} {order_sql})"
                ),
            )
            .where((F.col(_RN) <= counters) | F.col(_ITEM).isNull())
            .drop(_RN)
        )
    part_sql = (
        f"PARTITION BY {', '.join(group_cols)} " if group_cols else ""
    )
    ranked = counted.withColumn(
        _RN, F.expr(f"row_number() OVER ({part_sql}{order_sql})")
    )
    # NULL-item marker rows keep otherwise-empty groups alive
    # (reference: all-NULL group still yields a {} sketch); real entries
    # — whatever their sign — obey the rank prune.
    kept = ranked.where((F.col(_RN) <= counters) | F.col(_ITEM).isNull())
    return kept.groupBy(*group_cols).agg(
        _pack_entries_agg(drop_nonpositive).alias(out_col)
    )


def topn_add_agg(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    salt_buckets: int | None = None,
) -> DataFrame:
    """``SELECT keys, topn_add_agg(item) FROM df GROUP BY keys``
    (reference aggregate: update/topn--2.3.0--2.3.1.sql:34-42,
    transition topn.c:393-449).

    Returns a DataFrame of ``group_cols + [out_col sketch]``. NULL items
    are skipped (topn.c:424-427) but all-NULL groups still produce ``{}``.
    Items are cast to string and byte-capped on entry (TEXT-only intake).
    Exact counts (no eviction) — Tier-1 contract.
    """
    counters = resolve_counters(counters, df.sparkSession)
    gcols = [_col(c).alias(f"__g{i}") for i, c in enumerate(group_cols)]
    gnames = [f"__g{i}" for i in range(len(group_cols))]
    # TEXT-only intake, but WHERE the cast happens is a plan choice:
    # for types whose string cast is injective (integrals, date, bool)
    # group on the RAW value and cast per distinct group afterwards —
    # the count shuffle then carries fixed-width keys instead of
    # strings and the cast runs once per group, not once per row. The
    # rank still orders by the post-cast STRING (tie order must match
    # the string item ordering). Strings themselves must normalize
    # before grouping (255-byte truncation can merge items).
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
    )

    raw = _col(item)
    if isinstance(item, str) and item in df.columns:
        dtype = df.schema[item].dataType  # no extra analysis round-trip
    else:
        dtype = df.select(raw).schema[0].dataType
    if isinstance(
        dtype, (ByteType, ShortType, IntegerType, LongType, DateType, BooleanType)
    ):
        counted = (
            df.select(*gcols, raw.alias(_ITEM))
            .groupBy(*gnames, _ITEM)
            # count(col) skips NULLs: a NULL-item group row survives with 0.
            .agg(F.count(F.col(_ITEM)).alias(_FREQ))
            .withColumn(_ITEM, F.col(_ITEM).cast("string"))
        )
    else:
        counted = (
            df.select(*gcols, normalize_item(item).alias(_ITEM))
            .groupBy(*gnames, _ITEM)
            .agg(F.count(F.col(_ITEM)).alias(_FREQ))
        )
    out = _rank_and_pack(counted, gnames, counters, out_col, salt_buckets)
    return _restore_group_names(out, df, group_cols)


def topn_weighted_agg(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    weight: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Beyond-reference: top-N items by an ADDITIVE MEASURE instead of
    row count — ``frequency = saturating int64 sum of weight`` per item
    (top products by revenue, top hosts by bytes, top tokens by
    tf-weight). The reference can only count occurrences (topn_add adds
    1, topn.c:340-351); weighting is the first thing real rollups need
    beyond that, and it reuses the identical sketch type, extraction,
    union and window machinery — a weighted sketch merges with counted
    sketches transparently.

    Semantics: NULL items are skipped (group still yields ``{}``), NULL
    and NaN weights contribute 0; an INTEGRAL weight column (byte/short/
    int/long/boolean) sums directly in int64 — exact for the full int64
    range, no float round-trip. A fractional weight column is rounded
    half-up to int64 per row (saturating at the int64 bounds — no ANSI
    crash on out-of-range weights) BEFORE the exact integer sum, which
    keeps the aggregate summation-order independent and engine-portable
    — pre-scale fractional weights (cents, milli-units) when sub-unit
    resolution matters; note a fractional (double) weight above 2^53 has
    already lost ulps at the source. Items whose total weight is <= 0
    are dropped from the sketch (a zero-weight item is not a heavy
    hitter). Same two-exchange plan + optional lossless salted rank as
    topn_add_agg."""
    from pyspark.sql.types import (
        BooleanType as _B,
        ByteType as _Y,
        IntegerType as _I,
        LongType as _L,
        ShortType as _S,
    )

    counters = resolve_counters(counters, df.sparkSession)
    gcols = [_col(c).alias(f"__g{i}") for i, c in enumerate(group_cols)]
    gnames = [f"__g{i}" for i in range(len(group_cols))]
    wraw = _col(weight)
    if isinstance(weight, str) and weight in df.columns:
        wtype = df.schema[weight].dataType
    else:
        wtype = df.select(wraw).schema[0].dataType
    if isinstance(wtype, (_Y, _S, _I, _L, _B)):
        # Integral weights: exact int64 path, no double round-trip
        # (a bigint weight of 2^53+1 must not collapse to 2^53).
        w = F.coalesce(wraw.cast("long"), F.lit(0).cast("long")).alias("__w")
    else:
        wd = wraw.cast("double")
        rounded = F.round(wd, 0)
        w = (
            # NaN would sail through try_cast to the saturation branch
            # where NaN > 0 is TRUE (Spark NaN-is-largest) -> INT64_MAX;
            # treat NaN like NULL: contributes 0.
            F.when(wd.isNull() | F.isnan(wd), F.lit(0).cast("long"))
            .otherwise(
                F.coalesce(
                    rounded.try_cast("long"),  # NULL only when out of range
                    F.when(rounded > 0, F.lit(INT64_MAX)).otherwise(
                        F.lit(-INT64_MAX - 1)
                    ),
                )
            )
            .alias("__w")
        )
    # sum in decimal(38,0) (cannot overflow below ~10^19 addends of
    # int64 magnitude) and clamp to the int64 range: positive overflow
    # saturates at INT64_MAX, NEGATIVE overflow at INT64_MIN — the old
    # try_sum+coalesce form mapped a negative overflow to +INT64_MAX,
    # turning a hugely-negative item into the top heavy hitter.
    freq = (
        F.when(F.col(_ITEM).isNull(), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.greatest(
                    F.sum(F.col("__w").cast("decimal(38,0)")),
                    F.lit(-INT64_MAX - 1).cast("decimal(38,0)"),
                ),
                F.lit(INT64_MAX).cast("decimal(38,0)"),
            ).cast("long")
        )
        .alias(_FREQ)
    )
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
    )

    raw = _col(item)
    if isinstance(item, str) and item in df.columns:
        dtype = df.schema[item].dataType
    else:
        dtype = df.select(raw).schema[0].dataType
    if isinstance(
        dtype, (ByteType, ShortType, IntegerType, LongType, DateType, BooleanType)
    ):
        counted = (
            df.select(*gcols, raw.alias(_ITEM), w)
            .groupBy(*gnames, _ITEM)
            .agg(freq)
            .withColumn(_ITEM, F.col(_ITEM).cast("string"))
        )
    else:
        counted = (
            df.select(*gcols, normalize_item(item).alias(_ITEM), w)
            .groupBy(*gnames, _ITEM)
            .agg(freq)
        )
    out = _rank_and_pack(counted, gnames, counters, out_col, salt_buckets)
    return _restore_group_names(out, df, group_cols)


def topn_union_agg(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    sketch: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    salt_buckets: int | None = None,
) -> DataFrame:
    """``SELECT keys, topn_union_agg(sketch) FROM df GROUP BY keys``
    (update/topn--2.3.0--2.3.1.sql:43-51, transition topn.c:457-503).

    Merges a column of sketches per group: explode -> saturating sum per
    item -> rank-prune to *counters* -> repack. NULL sketches are skipped
    (topn.c:489) but groups of only-NULL sketches still yield ``{}``.
    The explode->re-aggregate shape is the idiomatic, shuffle-parallel
    Spark "merge maps at scale" (no per-group state larger than the
    counter budget).
    """
    counters = resolve_counters(counters, df.sparkSession)
    gcols = [_col(c).alias(f"__g{i}") for i, c in enumerate(group_cols)]
    gnames = [f"__g{i}" for i in range(len(group_cols))]
    exploded = df.select(*gcols, _col(sketch).alias("__sk")).select(
        *gnames, F.explode_outer("__sk").alias(_ITEM, "__v")
    )
    counted = exploded.groupBy(*gnames, _ITEM).agg(
        # saturating int64 sum at native long speed: try_sum yields NULL
        # exact decimal(38,0) sum, ONE clamp to the int64 range — the
        # weighted path's idiom. The old try_sum+coalesce(INT64_MAX)
        # form had two union-only defects (negative frequencies are
        # first-class here — sketch_from_json admits them and
        # drop_nonpositive=False keeps them): a NEGATIVE overflow
        # surfaced as +INT64_MAX (the top heavy-hitter slot), and a
        # TRANSIENT mixed-sign overflow whose exact total fits int64
        # still read as saturation, making the result depend on
        # aggregation order (review pin).
        # NULL-item marker rows (from explode_outer of NULL sketches) get
        # frequency 0 so they survive as group-preserving placeholders.
        # NULL map VALUES (a nullable-value sketch column, e.g. built
        # with create_map) contribute 0 like the scalar merge_sketches
        # coalesce.
        F.when(F.col(_ITEM).isNull(), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.greatest(
                    F.sum(
                        F.coalesce(F.col("__v"), F.lit(0)).cast(
                            "decimal(38,0)"
                        )
                    ),
                    F.lit(-INT64_MAX - 1).cast("decimal(38,0)"),
                ),
                F.lit(INT64_MAX).cast("decimal(38,0)"),
            ).cast("long")
        )
        .alias(_FREQ)
    )
    out = _rank_and_pack(
        counted, gnames, counters, out_col, salt_buckets,
        drop_nonpositive=False,  # union keeps the sketches' frequencies as-is
    )
    return _restore_group_names(out, df, group_cols)


def topn_union_agg_global(
    df: DataFrame,
    sketch: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Grand-total union (no GROUP BY), e.g. the reference's
    ``overall_result`` step (sql/customer_reviews_query.sql:25-34).

    This is the single-group shape where the final rank would otherwise
    sort EVERY distinct item on one reducer — at high cardinality pass
    ``salt_buckets`` (lossless pre-filter, see ``_rank_and_pack``)."""
    counters = resolve_counters(counters, df.sparkSession)
    with_g = df.select(F.lit(1).alias("__g0"), _col(sketch).alias("__sk"))
    out = topn_union_agg(
        with_g,
        ["__g0"],
        "__sk",
        counters=counters,
        out_col=out_col,
        salt_buckets=salt_buckets,
    )
    return out.drop("__g0")


def topn_union_over_window(
    sketch: Column | str,
    window: WindowSpec,
    *,
    counters: int | None = None,
) -> Column:
    """``topn_union_agg(sketch) OVER (ORDER BY ... ROWS k PRECEDING)`` —
    the sliding-frame merge of sql/customer_reviews_query.sql:59-68
    (fixed in the reference by v2.0.1, CHANGELOG.md:46-48).

    Spark has no native "sum maps over frame" aggregate; we collect the
    frame's sketches (already bounded to <= counters entries each) and
    fold them with ``map_zip_with`` saturating sums. O(frame) per row,
    which is the reference's cost too (it re-runs the transition per
    frame row).
    """
    counters = resolve_counters(counters)
    frame = F.collect_list(_col(sketch)).over(window)
    merged = F.aggregate(frame, empty_sketch(), merge_sketches)
    return prune_sketch(merged, counters)


def topn_add_agg_grouping_sets(
    df: DataFrame,
    grouping_sets: Sequence[Sequence[str]],
    item: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    gid_col: str = "gid",
) -> DataFrame:
    """``topn_add_agg(item)`` under ``GROUP BY GROUPING SETS (...)`` —
    one sketch per (grouping set, key combination) from ONE scan.

    The reference never composes its aggregate with grouping sets (no
    pg_regress test touches them; SURVEY.md §2.2 "not present"), but a
    rollup-table builder wants exactly this: day/month/all-time sketch
    grains in a single pass instead of one scan per grain. Spark's
    native ``DataFrame.groupingSets`` drives the count stage, so the
    multi-grain expansion happens inside one hash aggregate with
    map-side partial combine — the same two-exchange shape as
    ``topn_add_agg``, with the grain id riding the group key.

    ``grouping_sets`` are lists of column NAMES drawn from one ordered
    universe (their union, in first-appearance order). The output gets
    ``gid_col``: an explicit engine-agnostic bitmap — for universe
    columns c1..ck (left to right), bit 2^(k-1-i) is set iff ci is
    ROLLED UP in the row's set — computed from ``F.grouping`` so ANSI
    engines replay it as ``GROUPING(c1)*2^(k-1) + ...``. Rolled-up key
    columns are NULL in their rows (distinguish real-NULL keys by
    ``gid``, the standard grouping-sets discipline)."""
    universe: list[str] = []
    for s in grouping_sets:
        for c in s:
            if c not in universe:
                universe.append(c)
    for s in grouping_sets:
        if len(set(s)) != len(s):
            raise ValueError(f"duplicate column in grouping set {s!r}")
    # a REPEATED set shares one gid bitmap, so its duplicate rank rows
    # crash the final map_from_entries with a duplicate-map-key error
    # at runtime (or silently double-count past the budget) — refuse at
    # the API boundary instead (review pin)
    canon = [tuple(sorted(s)) for s in grouping_sets]
    if len(set(canon)) != len(canon):
        dup = next(s for s in canon if canon.count(s) > 1)
        raise ValueError(f"grouping set {list(dup)!r} appears more than once")
    counters = resolve_counters(counters, df.sparkSession)

    base = df.select(
        *[_col(c).alias(f"__g{i}") for i, c in enumerate(universe)],
        normalize_item(item).alias(_ITEM),
    )
    gnames = [f"__g{i}" for i in range(len(universe))]
    name_of = {c: f"__g{i}" for i, c in enumerate(universe)}
    sets_internal = [
        [name_of[c] for c in s] + [_ITEM] for s in grouping_sets
    ]
    k = len(universe)
    gid = sum(
        (F.grouping(g).cast("long") * F.lit(1 << (k - 1 - i)))
        for i, g in enumerate(gnames)
    ) if k else F.lit(0).cast("long")
    counted = (
        base.groupingSets(sets_internal, *gnames, F.col(_ITEM))
        .agg(F.count(F.col(_ITEM)).alias(_FREQ), gid.alias("__gid"))
    )
    out = _rank_and_pack(counted, ["__gid"] + gnames, counters, out_col)
    out = out.withColumnRenamed("__gid", gid_col)
    for i, c in enumerate(universe):
        out = out.withColumnRenamed(f"__g{i}", c)
    return out
