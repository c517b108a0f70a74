"""Tier-2 "faithful sketch" mode: bounded-memory per-group top-n state
with the reference's exact prune policies, for groups whose item
cardinality is too large to count exactly.

The reference's algorithm (SURVEY.md §1.2, topn.c):

1. plain hash upsert per item, saturating int64 add (topn.c:997-1009);
2. when the table exceeds an itemLimit, sort all entries by frequency
   DESC and delete everything beyond a keep-count (topn.c:869-908);
3. the (limit, keep) pair differs by call site:
   - aggregate add/merge paths: limit = 3 x counters ("UnionFactor",
     topn.c:50), keep = current_size / 2   (topn.c:440-446, 984-988)
   - scalar add/union + finalizer: limit = counters, keep = counters
     (topn.c:350, 380, 652)

Evicted items lose their whole count (re-inserted items restart), so
reported frequencies are lower bounds — unlike textbook Space-Saving,
which overestimates. Counts are exact while no eviction fires.

Spark execution model: a two-phase distributed aggregation that mirrors
the reference's parallel aggregation (worker partial states + leader
combine via serialize/deserialize/union_internal, topn.c:509-625):

- phase 1 (`mapInPandas`): one bounded state per group per input
  partition — the map-side partial combine, before any shuffle; emits
  each partial state's entries as plain rows.
- phase 2 (shuffle on group keys + `applyInPandas`): MergeTopn-style
  merge of partial entries, final prune to `counters`.

Only the entries of bounded sketches cross the wire (<= 3 x counters
rows per group per input partition), never raw items — at 100 TB this
is the difference between shuffling billions of raw rows and shuffling
O(groups x counters) pre-reduced pairs. Merge order is made
deterministic (frequency DESC, item ASC) so eviction decisions do not
depend on shuffle arrival order — the reference is order-dependent and
nondeterministic here; we pin determinism as a documented deviation.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator, Sequence
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgresql_topn_spark.conf import INT64_MAX, resolve_counters
from postgresql_topn_spark.functions.sketch import _col

UNION_FACTOR = 3  # topn.c:50


def clamp64(v: int) -> int:
    """Saturate an exact integer total into int64 — applied ONCE at
    each egress (JSON/state-store materialization), never per add:
    a running per-add clamp would make mixed-sign weighted totals
    depend on partition arrival order, which a distributed aggregate
    must never do (Tier-1 sums exactly in decimal(38,0) and clamps
    once; Tier-2 matches)."""
    return max(min(v, INT64_MAX), -INT64_MAX - 1)


def truncate_key_bytes(s: str, limit: int = 255) -> str:
    """Exact encoding-aware byte truncation (topn.c:338 semantics)."""
    b = s.encode("utf-8")
    if len(b) <= limit:
        return s
    return b[:limit].decode("utf-8", errors="ignore")


class TopnState:
    """The reference's TopnAggState (topn.c:100-117): a dict standing in
    for the PG HTAB of FrequentTopnItem entries."""

    __slots__ = ("counts", "counters")

    def __init__(self, counters: int):
        self.counts: dict[str, int] = {}
        self.counters = counters

    def _prune(self, keep: int) -> None:
        if keep >= len(self.counts):
            return
        top = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:keep]
        self.counts = dict(top)

    def add(self, item: str, amount: int = 1, *, aggregate_path: bool = True) -> None:
        """Upsert + conditional prune. aggregate_path=True is the
        transition/merge policy (limit 3c, keep size/2, topn.c:440-446,
        984-988); False is the scalar policy (limit c, keep c,
        topn.c:350)."""
        cur = self.counts.get(item)
        if cur is None:
            # exact (unbounded) Python-int totals; int64 saturation is
            # applied once at egress via clamp64 — see its docstring
            self.counts[item] = amount
            if aggregate_path:
                if len(self.counts) > self.counters * UNION_FACTOR:
                    self._prune(len(self.counts) // 2)
            elif len(self.counts) > self.counters:
                self._prune(self.counters)
        else:
            self.counts[item] = cur + amount

    def finalize(self) -> dict[str, int]:
        """topn_pack: prune to counters (topn.c:652)."""
        self._prune(self.counters)
        return self.counts


def weight_to_long(w) -> int:
    """The THREE-SURFACE fractional-weight rule (Column lane's F.round
    == SQL UDAF == Tier-2 sketch): NULL/NaN -> 0; finite values round
    HALF-UP away from zero via Decimal on the shortest repr (naive
    wf + 0.5 diverges on edge doubles); infinities and magnitudes
    beyond int64 saturate like Spark's non-ANSI double->long cast."""
    # pd.isna, not `isinstance(w, float) and w != w`: missing markers
    # arrive as np.float32 NaN (not a Python-float subclass) or pd.NA
    # depending on the Arrow dtype, and Decimal(repr(nan)) raises
    # (review pin)
    if w is None or pd.isna(w):
        return 0
    wf = float(w)
    if math.isinf(wf) or abs(wf) >= 9.3e18:
        return INT64_MAX if wf > 0 else -INT64_MAX - 1
    wv = int(Decimal(repr(wf)).quantize(Decimal(1), rounding=ROUND_HALF_UP))
    return max(min(wv, INT64_MAX), -INT64_MAX - 1)


def weights_to_long_vec(a) -> "np.ndarray":
    """Vectorized weight_to_long over a float64 array — bit-identical
    results, ~100x faster on the common case. Fast path: |w| < 2^30
    (double ulp ~2.4e-7, far under the guard band) and fractional part
    at least 1e-6 away from .5 — there floor(w + 0.5) provably equals
    the Decimal HALF_UP of the shortest repr. Everything else (NaN/inf,
    near-half fractions where binary +0.5 can cross the boundary, big
    magnitudes where ulp swamps the guard) takes the exact scalar
    path."""
    a = np.asarray(a, dtype=np.float64)
    out = np.zeros(len(a), dtype=np.int64)
    with np.errstate(invalid="ignore"):  # NaN rows route to slow path
        finite = np.isfinite(a)
        frac = a - np.floor(a)
        near_half = np.abs(frac - 0.5) < 1e-6
        fast = finite & (np.abs(a) < float(1 << 30)) & ~near_half
    af = a[fast]
    out[fast] = np.where(
        af >= 0, np.floor(af + 0.5), np.ceil(af - 0.5)
    ).astype(np.int64)
    for i in np.nonzero(~fast)[0]:
        v = a[i]
        out[i] = weight_to_long(None if np.isnan(v) else float(v))
    return out


def _group_ddl(df: DataFrame, gnames: Sequence[str]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    ddl = ", ".join(f"{g} {fields[g]}" for g in gnames)
    return ddl + ", " if ddl else ""


def _merge_fn(
    gnames: Sequence[str],
    counters: int,
    out_json: str,
    *,
    drop_nonpositive: bool = False,
):
    """Phase-2 reducer: MergeTopn over partial entries, final prune,
    JSON materialization (the reference also materializes through a JSON
    string, topn.c:914-939). drop_nonpositive applies the weighted
    aggregate's "total weight <= 0 is not a heavy hitter" rule after
    the merge (aggregates.py topn_weighted_agg semantics)."""

    def merge_keyed(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        st = TopnState(counters)
        live = pdf[pdf["__item"].notna()]
        live = live.sort_values(["__freq", "__item"], ascending=[False, True])
        for it, freq in zip(live["__item"], live["__freq"]):
            st.add(it, int(freq), aggregate_path=True)
        # single egress clamp (see clamp64) — sign is preserved, so the
        # nonpositive drop is clamp-order independent
        out = {k: clamp64(v) for k, v in st.finalize().items()}
        if drop_nonpositive:
            out = {k: v for k, v in out.items() if v > 0}
        row = dict(zip(gnames, key))
        row[out_json] = json.dumps(out)
        return pd.DataFrame([row])

    return merge_keyed


def _partial_fn(gnames: Sequence[str], counters: int, *, weighted: bool):
    """Phase-1 mapInPandas partial for BOTH the counting and weighted
    lanes: one bounded state per (group, input partition). Shared on
    purpose — the NaN group-key normalization (NaN != NaN would
    fragment NULL numeric group keys into one state PER ROW, unbounded
    memory), the NULL-item skip and the group-preserving ``(key, None,
    0)`` marker row must live in exactly one place (review pin: two
    hand-kept copies drifted).

    Weighted lane: per-row rounding FIRST (the three-surface
    semantics), then a per-batch pre-combine — one exact int sum per
    (group, item) and ONE state add per pair, the same map-side combine
    the reference's per-worker partials do. Identical in the
    no-eviction regime; under eviction arrival batching was already
    arbitrary (partition splits). Emitted ``__freq`` values are EXACT
    Python ints (the weighted mid-schema is decimal(38,0), so partials
    never clamp — parity with Tier-1's sum-exact-clamp-once)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict[tuple, TopnState] = {}
        for pdf in batches:
            keys = [
                tuple(
                    None if (isinstance(k, float) and k != k) else k
                    for k in key
                )
                for key in zip(*[pdf[g] for g in gnames])
            ]
            if weighted:
                wvs = weights_to_long_vec(
                    pd.to_numeric(pdf["__w"], errors="coerce").to_numpy(
                        dtype=float, na_value=float("nan")
                    )
                )
                batch_acc: dict[tuple, dict[str, int]] = {}
                for key, it, wv in zip(keys, pdf["__item"], wvs):
                    if key not in states:
                        states[key] = TopnState(counters)
                    if it is None or (isinstance(it, float) and pd.isna(it)):
                        continue  # NULL items skipped, group preserved
                    if wv:
                        acc = batch_acc.setdefault(key, {})
                        k = truncate_key_bytes(it)
                        acc[k] = acc.get(k, 0) + int(wv)
                for key, items in batch_acc.items():
                    st = states[key]
                    for it, v in items.items():
                        if v != 0:
                            st.add(it, v, aggregate_path=True)
            else:
                for key, it in zip(keys, pdf["__item"]):
                    st = states.get(key)
                    if st is None:
                        st = states[key] = TopnState(counters)
                    if it is None or (isinstance(it, float) and pd.isna(it)):
                        continue  # NULL items skipped, group preserved
                    st.add(truncate_key_bytes(it), 1, aggregate_path=True)
        rows = []
        for key, st in states.items():
            if not st.counts:
                rows.append((*key, None, 0))  # group-preserving marker
            rows.extend((*key, it, fr) for it, fr in st.counts.items())
        yield pd.DataFrame(rows, columns=gnames + ["__item", "__freq"])

    return partial


def _decimal_ride_keys(src: DataFrame, gnames: Sequence[str]):
    """Cast INTEGRAL group-key columns to decimal(20,0) for the
    mapInPandas leg and return (frame, restore-type map).

    Why: a nullable int64 Arrow column coerces to FLOAT64 in pandas, so
    an integral group key above 2^53 sharing an input partition with
    NULL keys would come back with its low bits rounded off (the same
    coercion class as the union-path __freq fix above). decimal(20,0)
    arrives as exact Python Decimal whatever the null mix; _pack casts
    the survivors back to the original type."""
    from pyspark.sql import types as T

    restore: dict[str, str] = {}
    out = src
    for f in src.schema.fields:
        if f.name in set(gnames) and isinstance(
            f.dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            restore[f.name] = f.dataType.simpleString()
            out = out.withColumn(f.name, F.col(f.name).cast("decimal(20,0)"))
    return out, restore


def _pack(
    merged: DataFrame,
    df: DataFrame,
    group_cols,
    gnames,
    out_col: str,
    restore: "dict[str, str] | None" = None,
) -> DataFrame:
    def name_of(c):
        return c if isinstance(c, str) else df.select(_col(c)).columns[0]

    def gcol(g):
        c = F.col(g)
        return c.cast(restore[g]) if restore and g in restore else c

    return merged.select(
        *[gcol(g).alias(name_of(c)) for g, c in zip(gnames, group_cols)],
        F.from_json(F.col(f"__{out_col}_json"), "map<string,bigint>").alias(out_col),
    )


def topn_add_agg_sketch(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    spread: bool = True,
) -> DataFrame:
    """Bounded-memory ``topn_add_agg``: per-group sketch state never
    exceeds 3 x counters entries, whatever the item cardinality.

    Returns group_cols + a ``map<string,bigint>`` sketch column. NULL
    items are skipped (topn.c:424-427); groups with only NULL items
    still emit ``{}``.
    """
    counters = resolve_counters(counters, df.sparkSession)
    gnames = [f"__g{i}" for i in range(len(group_cols))]
    gexprs = [_col(c).alias(g) for c, g in zip(group_cols, gnames)]
    if not gnames:
        # global aggregate: applyInPandas needs a grouping key, so ride
        # an internal constant one (dropped again by _pack)
        gnames, gexprs = ["__gall"], [F.lit(1).alias("__gall")]
    src = df.select(
        *gexprs,
        _col(item).cast("string").alias("__item"),
    )
    # the mapInPandas partial runs at the input's partitioning — spread
    # a starved single-file scan so the Tier-1-style partial pass uses
    # the whole cluster (no-op when the scan already splits).
    # `spread=False` opts out for callers that fan MANY lanes over the
    # same small source in one query: each lane's projection differs,
    # so the per-lane repartition exchanges don't dedupe and cost more
    # than the starved partial saves (measured on topn_tier2_eviction).
    if spread:
        from postgresql_topn_spark.operators.dedup import spread_small_scan

        src = spread_small_scan(df, src)
    src, restore = _decimal_ride_keys(src, gnames)
    mid_schema = _group_ddl(src, gnames) + "__item string, __freq bigint"
    partial_df = src.mapInPandas(
        _partial_fn(gnames, counters, weighted=False), schema=mid_schema
    )
    final_schema = _group_ddl(src, gnames) + f"__{out_col}_json string"
    merged = partial_df.groupBy(*gnames).applyInPandas(
        _merge_fn(gnames, counters, f"__{out_col}_json"), schema=final_schema
    )
    return _pack(merged, df, group_cols, gnames, out_col, restore)


def topn_weighted_agg_sketch(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    weight: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
    spread: bool = True,
) -> DataFrame:
    """Bounded-memory ``topn_weighted_agg``: the additive-measure
    aggregate under the Tier-2 sketch policy — per-group state never
    exceeds 3 x counters entries whatever the item cardinality, weights
    folded with the three-surface rounding rule (weight_to_long).

    Parity contract: EXACT equality with the Tier-1 Column lane in the
    no-eviction regime (counter budget >= distinct items — the regime
    the reference is exact in), including the NULL-weight-is-0 and
    total<=0-drops rules. Under eviction the usual sketch caveat
    applies, plus one weighted-only caveat: NEGATIVE weights make
    evicted mass unrecoverable in either direction, so prefer
    non-negative weights when the budget can actually evict.

    NULL items are skipped (group still emits {}); zero-valued weights
    add nothing and do not create entries."""
    counters = resolve_counters(counters, df.sparkSession)
    gnames = [f"__g{i}" for i in range(len(group_cols))]
    gexprs = [_col(c).alias(g) for c, g in zip(group_cols, gnames)]
    if not gnames:
        gnames, gexprs = ["__gall"], [F.lit(1).alias("__gall")]
    src = df.select(
        *gexprs,
        _col(item).cast("string").alias("__item"),
        _col(weight).cast("double").alias("__w"),
    )
    # same starved-scan spread (and opt-out rationale) as
    # topn_add_agg_sketch
    if spread:
        from postgresql_topn_spark.operators.dedup import spread_small_scan

        src = spread_small_scan(df, src)
    src, restore = _decimal_ride_keys(src, gnames)
    # decimal(38,0), not bigint: partial totals stay EXACT across the
    # shuffle so the int64 saturation happens exactly once, at the
    # merge's JSON egress — two near-max same-sign partials would
    # otherwise clamp per partition and make the merged total depend on
    # partition arrival (review pin). 38 digits hold any realistic sum
    # of int64 terms.
    mid_schema = _group_ddl(src, gnames) + "__item string, __freq decimal(38,0)"
    partial_df = src.mapInPandas(
        _partial_fn(gnames, counters, weighted=True), schema=mid_schema
    )
    final_schema = _group_ddl(src, gnames) + f"__{out_col}_json string"
    merged = partial_df.groupBy(*gnames).applyInPandas(
        _merge_fn(
            gnames, counters, f"__{out_col}_json", drop_nonpositive=True
        ),
        schema=final_schema,
    )
    return _pack(merged, df, group_cols, gnames, out_col, restore)


def topn_union_agg_sketch(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    sketch: Column | str,
    *,
    counters: int | None = None,
    out_col: str = "topn",
) -> DataFrame:
    """Bounded-memory ``topn_union_agg``: merge a column of sketches per
    group under the MergeTopn prune policy (topn.c:955-990). NULL
    sketches are skipped (topn.c:489); all-NULL groups yield {}."""
    counters = resolve_counters(counters, df.sparkSession)
    gnames = [f"__g{i}" for i in range(len(group_cols))]
    gexprs = [_col(c).alias(g) for c, g in zip(group_cols, gnames)]
    if not gnames:
        gnames, gexprs = ["__gall"], [F.lit(1).alias("__gall")]
    # __freq rides as decimal(38,0), NOT bigint: explode_outer's NULL
    # marker rows (NULL/empty sketches keeping their group alive) make
    # the column nullable, and Arrow->pandas coerces nullable int64 to
    # FLOAT64 — a frequency near 2^63 then loses its low bits BEFORE
    # the merge's exact Python sum (found by the randomized four-surface
    # test: a group holding both a NULL sketch and an INT64_MAX-adjacent
    # count came back off by one). Decimal converts to exact Python
    # Decimal objects whatever the null mix — same rule as the weighted
    # partial mid-schema.
    exploded = df.select(
        *gexprs,
        F.explode_outer(_col(sketch)).alias("__item", "__freq"),
    ).withColumn("__freq", F.col("__freq").cast("decimal(38,0)"))
    final_schema = _group_ddl(exploded, gnames) + f"__{out_col}_json string"
    merged = exploded.groupBy(*gnames).applyInPandas(
        _merge_fn(gnames, counters, f"__{out_col}_json"), schema=final_schema
    )
    return _pack(merged, df, group_cols, gnames, out_col)
