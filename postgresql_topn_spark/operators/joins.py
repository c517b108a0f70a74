"""Skew-hardened join helpers.

AQE's skew-join handles most hot-key joins automatically (splitting
oversized partitions at runtime), but two cases still want the
explicit salting recipe: (a) a SINGLE key so hot that even a split
partition's build side overflows, and (b) engines/paths where AQE
cannot rewrite (streaming joins, some DSv2 scans). `salted_join` is
that recipe as an operator: the skewed side gets a uniform salt, the
other side is replicated once per salt, and the join key becomes
(key, salt) — the hot key's rows spread over `n_salts` tasks instead
of one straggler.

Cost model (why this is opt-in, not default): the non-skewed side is
multiplied by n_salts on the wire, so use it when
|other| * n_salts << |skewed partition of the hot key|. Result-set
equality with the plain join is pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 0,
) -> DataFrame:
    """Equi-join `skewed` with `other` on column `on`, spreading each
    join key over `n_salts` sub-keys. The salt is `rand(seed)`-derived:
    exact-duplicate hot-key rows still spread uniformly (a row-hash
    salt would send identical rows — the common post-projection log
    shape — to one salt and silently no-op the mitigation). rand is
    per-partition-seeded, so task retries recompute identical salts
    within a job; the JOIN RESULT is salt-independent anyway (every
    salt joins the same replicated other-side row), only the spread
    varies. Supported `how`: inner / left — shapes where the skewed
    side drives the result."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if "__salt" in skewed.columns or "__salt" in other.columns:
        # withColumn would silently REPLACE a caller's __salt column
        # (it would vanish from the output and the join would run on
        # the synthetic salt instead) — refuse loudly.
        raise ValueError(
            "column '__salt' is reserved by salted_join; rename it first"
        )
    s = skewed.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = s.join(o, [on, "__salt"], how)
    return out.drop("__salt")


def bloom_pruned_join(
    large: DataFrame,
    small: DataFrame,
    on: "str | list[str]",
    *,
    m_bits: int = 1 << 20,
    depth: int = 3,
    how: str = "inner",
    portable: bool = False,
) -> DataFrame:
    """Semi-join reduction — the classic big-data shuffle cut: build a
    Bloom filter over the SMALL side's join keys (one bounded
    aggregation; the filter is m_bits/8 bytes total), broadcast its
    single row, and filter the LARGE side BEFORE its shuffle. Rows
    whose key cannot possibly match die at the scan stage, so only
    matches + false positives pay the exchange — at 100 TB the
    difference between shuffling the whole fact table and shuffling
    the ~matching slice. Bloom filters have NO false negatives, so the
    result is EXACTLY the plain join (pytest- and oracle-pinned); a
    false positive merely rides to the join and is dropped there.

    Spark's runtime bloom pruning
    (``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``)
    automates this for joins the optimizer can see through; the
    explicit operator is for the shapes it declines — pruning before
    an intermediate aggregation, across separately-built pipelines, or
    against a key set read from a rollup — and makes the reduction
    deterministic and md5-portable (functions/bloom.py) rather than
    engine-internal.

    ``on`` may name several columns (same names both sides). The probe
    key is the unit-separator concat of the parts — an encoding
    collision can only ADD a false positive, never lose a match, so
    correctness is unaffected. Rows with a NULL key part never match a
    plain join; whether the prune drops them early or the join drops
    them later is equivalence-invisible.

    ``how``: ``inner`` (default) or ``left_semi`` (the pruned
    EXISTS-filter — only large-side columns come back). Shapes that
    keep unmatched large rows (left outer) cannot be pruned this way.

    Sizing: keep set-bit load (n_small_keys * depth / m_bits) under
    ~0.3; past that the filter saturates toward all-true and the prune
    degrades to a no-op (still correct, just useless).

    ``portable=False`` (default) hashes slots with xxhash64 — several
    times cheaper per fact-row probe than the md5-portable form, and
    the RESULT is hash-independent anyway (no false negatives under
    any hash; a different hash only moves which non-matches survive to
    the join, where they drop). Pass ``portable=True`` only when an
    external ANSI engine must replay the pruned INTERMEDIATE
    exactly."""
    from postgresql_topn_spark.functions.bloom import (
        bloom_add_agg,
        bloom_might_contain,
    )

    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be inner/left_semi, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("on must name at least one join column")

    def probe_key(df: DataFrame) -> "F.Column":
        parts = [F.col(k).cast("string") for k in keys]
        return parts[0] if len(parts) == 1 else F.concat_ws("\x1f", *parts)

    filt = bloom_add_agg(
        small.select(probe_key(small).alias("__k")),
        [],
        "__k",
        m_bits=m_bits,
        depth=depth,
        out_col="__bloom_prune",
        portable=portable,
        # the build feeds a broadcast the probe scan BLOCKS on — a
        # starved-scan spread of the slim key projection only delays it
        spread=False,
    )
    pruned = (
        large.crossJoin(F.broadcast(filt))
        .where(
            bloom_might_contain(
                "__bloom_prune",
                probe_key(large),
                m_bits=m_bits,
                depth=depth,
                portable=portable,
            )
        )
        .drop("__bloom_prune")
    )
    return pruned.join(small, keys, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str]",
    *,
    left_time: str = "ts",
    right_time: str = "ts",
    payload: "list[str] | None" = None,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """AS-OF join: each left row gains the payload of one right row
    with the same key, chosen by ``direction`` —

    - ``"backward"`` (default): the LATEST right row with
      right_time <= left_time (``strict=True``: ``<``) — "the config
      in effect when this event happened".
    - ``"forward"``: the EARLIEST right row with right_time >=
      left_time (``strict=True``: ``>``) — "the next deploy after this
      alert".
    - ``"nearest"``: whichever of the two candidates has the smaller
      absolute time distance; a tie picks the backward row (pandas
      ``merge_asof(direction='nearest')``). ``strict`` is not
      supported for nearest.

    The operator relational engines grow special syntax for (DuckDB
    ``ASOF JOIN`` with ``>=``/``<=``, Pandas ``merge_asof``, kdb
    ``aj``); Spark has none, and the naive range-join (equi-key +
    inequality + per-row extremum) explodes into an O(n*m) candidate
    space per key.

    Spark-first shape: UNION the two streams with a side tag, one
    window per key ordered by (time, side) carrying the last right ROW
    forward, keep the left rows — exactly ONE key exchange, no range
    explosion, whole-stage codegen end to end (zero Python). Right rows
    sort before left rows at equal time, which gives the inclusive
    (<=) semantics; ``strict`` flips the tag order.

    The payload rides as ONE struct column and the window fill is
    ``last(struct, ignorenulls=True)``: the struct is non-NULL on every
    right row (even when all its FIELDS are NULL) and NULL on left
    rows, so the fill skips only rows that are entirely absent — the
    matched row's values come back intact, NULL fields included,
    matching DuckDB ``ASOF JOIN`` / pandas ``merge_asof``. (Filling
    each column independently would back-fill a NULL field from an
    OLDER right row and emit a row that never existed.)

    Among right rows tied on (key, time) the row sorting LAST by its
    payload struct wins (FIRST for the forward direction) —
    deterministic — when every payload type is
    orderable; a payload containing an unorderable type (a map) keeps
    working but falls back to engine-order ties (pass pre-deduplicated
    right input when tie identity matters there). NULL join keys group
    together (window-partition semantics, like pandas), not
    SQL-equality semantics — pre-filter NULL keys for SQL parity.
    NULL times never match (engine semantics: a NULL inequality is
    never true): right rows with NULL time are ignored, left rows with
    NULL time come back with NULL payload.

    Returns every left row + ``payload`` columns (NULL when no right
    row qualifies). Column-name collisions between payload and left
    columns must be resolved by the caller (alias before calling)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if direction == "nearest" and strict:
        raise ValueError("strict=True is not supported with nearest")
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"__t", "__side", "__pay", "__ff"} & set(keys)
    if reserved:
        # the union stream selects keys unaliased next to these
        # internal columns — a key with one of these names would
        # produce duplicate/ambiguous columns deep in the plan;
        # fail with an actionable message instead.
        raise ValueError(
            f"join keys {sorted(reserved)} collide with asof_join's "
            "internal columns; rename them first"
        )
    shadow = {f"__l_{c}" for c in left.columns} & set(keys)
    if shadow:
        # left columns ride the union stream prefixed "__l_"; a key
        # named "__l_<left column>" would duplicate that name and fail
        # with an opaque ambiguity error deep in the plan — refuse
        # loudly instead (same discipline as the reserved names above).
        raise ValueError(
            f"join keys {sorted(shadow)} collide with asof_join's "
            "prefixed left columns; rename them first"
        )
    payload = list(payload) if payload is not None else [
        c for c in right.columns if c not in keys and c != right_time
    ]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"payload columns {sorted(overlap)} collide with left columns; "
            "alias them on the right side first"
        )
    if not payload:
        return left
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    rfields = {f.name: f for f in right.schema.fields}
    missing = [c for c in payload if c not in rfields]
    if missing:
        raise ValueError(f"payload columns {missing} not in right side")
    # nearest needs the matched row's time to compare distances: a
    # leading numeric-axis field rides in the fill struct (it is
    # constant among same-time ties, so tie ordering is unchanged).
    # The axis stays EXACT: timestamps/dates -> unix_micros (long),
    # integral types -> themselves (long) — a double cast would round
    # ns-epoch longs to ~256 ns granularity and could pick the farther
    # side; only genuinely fractional axes use double.
    def _axis_of(dt):
        if isinstance(
            dt, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            return T.LongType(), lambda c: F.unix_micros(
                c.cast("timestamp")
            )
        if isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            return T.LongType(), lambda c: c.cast("long")
        return T.DoubleType(), lambda c: c.cast("double")

    with_rt = direction == "nearest"
    if with_rt:
        axis_type, axis_fn = _axis_of(rfields[right_time].dataType)
        l_axis_type, _ = _axis_of(
            {f.name: f for f in left.schema.fields}[left_time].dataType
        )
        if l_axis_type != axis_type:
            # mixed integral/fractional axes: fall back to double both
            axis_type = T.DoubleType()
            axis_fn = lambda c: c.cast("double")  # noqa: E731
    pay_fields = (
        [T.StructField("__rtd", axis_type, True)] if with_rt else []
    ) + [T.StructField(c, rfields[c].dataType, True) for c in payload]
    pay_type = T.StructType(pay_fields)
    # side tag: for BACKWARD, right must sort BEFORE left at equal time
    # for inclusive semantics (after when strict) — the preceding-frame
    # fill then sees equal-time right rows. FORWARD mirrors it: right
    # sorts AFTER left when inclusive (before when strict) so the
    # following frame sees them. NEAREST uses the backward-inclusive
    # layout: the forward candidate is then strict-at-equal-time, but a
    # distance-0 backward candidate wins every comparison anyway.
    if direction == "forward":
        r_tag, l_tag = (0, 1) if strict else (1, 0)
    else:
        r_tag, l_tag = (1, 0) if strict else (0, 1)
    pay_struct = F.struct(
        *([axis_fn(F.col(right_time)).alias("__rtd")] if with_rt else []),
        *[F.col(c).alias(c) for c in payload],
    )
    # a NULL right time matches nothing on any reference engine
    # (NULL inequality): drop those rows from the fill stream
    right = right.where(F.col(right_time).isNotNull())
    r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(r_tag).alias("__side"),
        pay_struct.alias("__pay"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    left_cols = [F.col(c).alias(f"__l_{c}") for c in left.columns]
    lf = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast(pay_type).alias("__pay"),
        *left_cols,
    )
    # __pay as the final sort key makes right-side (key, time) ties
    # deterministic (left rows carry NULL __pay but never tie with
    # right rows: __side differs) — but only orderable payload types
    # can sort; a map-bearing payload falls back to (time, side) with
    # engine-order ties instead of failing the whole join.
    def _orderable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    order = ["__t", "__side"] + (["__pay"] if _orderable(pay_type) else [])
    base = Window.partitionBy(*keys).orderBy(*order)
    back = F.last("__pay", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("__pay", ignorenulls=True).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        fill = back
    elif direction == "forward":
        fill = fwd
    else:  # nearest: both fills share one exchange and one sort
        td = axis_fn(F.col("__t"))
        b, f = back, fwd
        fill = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            # tie (equal distance) picks backward, like merge_asof
            .when((td - b["__rtd"]) <= (f["__rtd"] - td), b)
            .otherwise(f)
        )
    # a left row with NULL time matches nothing (engine semantics:
    # NULL inequality is never true) — NULL-time rows would otherwise
    # sort nulls-first and see every right row in the following frame
    fill = F.when(F.col("__t").isNull(), F.lit(None).cast(pay_type)).otherwise(
        fill
    )
    merged = r.unionByName(lf).select("*", fill.alias("__ff"))
    out = merged.where(F.col("__side") == F.lit(l_tag)).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__ff")[c].alias(c) for c in payload],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_time: str = "ts",
    start: str = "start",
    end: str = "end",
    on: "str | list[str] | None" = None,
    bucket_width: "float | str",
    long_multiple: int = 64,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval (range) join: every (point, interval) pair with
    the same key (optional) and ``start <= point_time < end`` —
    half-open, the time-window convention. The third join relational
    engines special-case (DuckDB/Postgres run it as a plain range
    predicate; Spark's naive form is a cross join + filter that
    explodes at scale).

    Scale shape — bucketize-and-split:

    - Both sides map onto a grid of ``bucket_width``-sized buckets on
      the time axis (doubles only GENERATE candidates; the exact typed
      predicate decides, and casts are monotonic so a contained point
      can never land outside its interval's bucket range — no false
      negatives). An interval covers its start..end buckets via one
      `sequence` explode; the equi-join on (keys, bucket) replaces the
      cross join. A pair matches in exactly ONE bucket (the point's),
      so no dedup pass is needed.
    - Intervals spanning more than ``long_multiple`` buckets (the
      degenerate tail that would explode the grid) take a BROADCAST
      range join instead — correct for any span, cheap while long
      intervals are rare, which is the regime that makes bucketing the
      right default. Pick ``bucket_width`` near the typical interval
      length: ~1-2 exploded rows per interval, candidates ~= matches.
      ``bucket_width="auto"`` measures it: the median interval span via
      one approxQuantile pass over the (usually small) intervals side.

    ``how="left"`` keeps points that fall in no interval (interval
    columns NULL). The unmatched set is computed by ANTI-joining the
    points against both interval paths with the SAME predicates as the
    match — no row id needed (a synthesized id would be
    recomputation-unstable on retries, and a caller id column can be
    NULL, which equality anti-joins silently keep). Cost note: the
    left form probes the grid twice (one inner pass for pairs, one
    anti pass for survivors) — the anti probe produces at most one row
    per point and short-circuits on first match, so it is the cheaper
    of the two; callers who already carry a unique non-NULL id can
    instead run ``how="inner"`` and left-join the result back
    themselves if one probe matters.

    Timestamps/dates bucket via their epoch seconds (unix_micros-based
    — TIMESTAMP_NTZ included; the same monotonic transform applies to
    both sides, so bucket assignment can never disagree with the typed
    predicate); numeric axes use their value, and ``bucket_width`` is
    in seconds for time axes. Column names must be disjoint across the
    two frames except
    the join keys. Returns points.* + the intervals' non-key columns:
    one row per matching pair; under the default ``how="inner"``
    points matching nothing drop, under ``how="left"`` they survive
    null-extended."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    auto_width = bucket_width == "auto"
    if not auto_width and (
        isinstance(bucket_width, bool)
        or not isinstance(bucket_width, (int, float))
        or bucket_width <= 0
    ):
        raise ValueError(f"bucket_width must be > 0 or 'auto', got {bucket_width!r}")
    if long_multiple < 1:
        raise ValueError(f"long_multiple must be >= 1, got {long_multiple}")
    keys = (
        []
        if on is None
        else ([on] if isinstance(on, str) else list(on))
    )
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} exist on both sides; alias them "
            "(only join keys may be shared)"
        )
    reserved = {"__pb", "__sb", "__eb"} & (
        set(points.columns) | set(intervals.columns)
    )
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} are reserved by interval_join; "
            "rename them first"
        )
    from functools import reduce
    from operator import and_

    from pyspark.sql import types as T

    def _axis(df: DataFrame, col: str):
        dt = df.schema[col].dataType
        if isinstance(
            dt, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            return F.unix_micros(F.col(col).cast("timestamp")) / F.lit(1e6)
        return F.col(col).cast("double")

    if auto_width:
        med = (
            intervals.select(
                (_axis(intervals, end) - _axis(intervals, start)).alias("__s")
            )
            .where(F.col("__s") > 0)
            .approxQuantile("__s", [0.5], 0.01)
        )
        bucket_width = med[0] if med and med[0] > 0 else 1.0
    w = float(bucket_width)
    pb = F.floor(_axis(points, point_time) / F.lit(w)).cast("long")
    p2 = points.withColumn("__pb", pb)
    sb = F.floor(_axis(intervals, start) / F.lit(w)).cast("long")
    eb = F.floor(_axis(intervals, end) / F.lit(w)).cast("long")
    iv2 = intervals.withColumn("__sb", sb).withColumn("__eb", eb).where(
        F.col(end) > F.col(start)
    )
    is_long = (F.col("__eb") - F.col("__sb")) >= F.lit(long_multiple)
    short = iv2.where(~is_long).withColumn(
        "__pb", F.explode(F.sequence("__sb", "__eb"))
    )
    long_ = iv2.where(is_long)

    out_cols = [F.col(f"__p.{c}") for c in points.columns] + [
        F.col(f"__i.{c}")
        for c in intervals.columns
        if c not in keys
    ]

    def _match(iv_side: DataFrame, with_bucket: bool) -> DataFrame:
        conds = [F.col(f"__p.{k}") == F.col(f"__i.{k}") for k in keys]
        if with_bucket:
            conds.append(F.col("__p.__pb") == F.col("__i.__pb"))
        conds += [
            F.col(f"__p.{point_time}") >= F.col(f"__i.{start}"),
            F.col(f"__p.{point_time}") < F.col(f"__i.{end}"),
        ]
        return (
            p2.alias("__p")
            .join(iv_side.alias("__i"), reduce(and_, conds), "inner")
            .select(*out_cols)
        )

    def _anti(pts: DataFrame, iv_side: DataFrame, with_bucket: bool) -> DataFrame:
        conds = [F.col(f"__p.{k}") == F.col(f"__i.{k}") for k in keys]
        if with_bucket:
            conds.append(F.col("__p.__pb") == F.col("__i.__pb"))
        conds += [
            F.col(f"__p.{point_time}") >= F.col(f"__i.{start}"),
            F.col(f"__p.{point_time}") < F.col(f"__i.{end}"),
        ]
        return pts.alias("__p").join(
            iv_side.alias("__i"), reduce(and_, conds), "left_anti"
        )

    matched = _match(short, with_bucket=True).unionByName(
        # the long tail is broadcast by construction (rare rows)
        _match(F.broadcast(long_), with_bucket=False)
    )
    if how == "inner":
        return matched
    # survivors = points matching NEITHER path; each anti pass uses the
    # exact match predicates, so a point is null-extended iff it joined
    # nothing — NULL keys/times match nothing and survive, like SQL LEFT
    unmatched = _anti(
        _anti(p2, short, with_bucket=True),
        F.broadcast(long_),
        with_bucket=False,
    ).select(
        *[F.col(c) for c in points.columns],
        *[
            F.lit(None).cast(intervals.schema[c].dataType).alias(c)
            for c in intervals.columns
            if c not in keys
        ],
    )
    return matched.unionByName(unmatched)
