"""Mergeable Count-Min sketch rollups — point-frequency estimates for
ARBITRARY items, complementing the topn sketches (which keep only the
heavy hitters' identities).

The reference's rollup pattern again (README.md: per-bucket sketches
built once, merged at read time): a topn sketch answers "what are the
top k items?", an HLL answers "how many distinct?", a KMV adds set
algebra — CMS (Cormode & Muthukrishnan 2005) answers "about how often
did THIS item occur?" for any item, in O(d*w) space per bucket, with
the one-sided guarantee est >= true and est <= true + (e/w)*N w.h.p.
Merge is element-wise addition, so rollups re-bucket freely
(daily -> monthly -> all-time) and the merged estimate equals the
sketch built over the raw union EXACTLY (addition is associative) —
the merge law the suite oracle replays.

Representation: one dense array<long> of length d*w (row-major d
hash rows). Hashing is the repo's portable md5 form — row i slots an
item at conv(substr(md5(i || ':' || item), 1, 15), 16, 10) % w — so a
DuckDB oracle reproduces every cell and every estimate bit-for-bit.

100 TB shape, all JVM-side expressions (no Python anywhere):
build = one (group, slot) hash-agg exchange with map-side combine
(key space bounded at d*w per group) + one per-group pack whose
reduce state is <= d*w (slot, count) entries; merge = collect_list
fold of fixed-size arrays (state = #sub-buckets * d * w longs);
estimates are a d-element array_min projection over pre-built
sketches — the read path never touches raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 128


def cms_slot(item: Column | str, row: int, width: int) -> Column:
    """Row-`row` slot index of `item` (0..width-1), md5-portable."""
    salted = F.concat(F.lit(f"{row}:"), _col(item))
    h = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def cms_add_agg(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    out_col: str = "cms",
) -> DataFrame:
    """Per-group CMS (dense array<long>, length depth*width) counting
    occurrences of `item`. NULL items are skipped (SQL COUNT(col)
    discipline, matching topn_add_agg)."""
    if depth < 1 or width < 2:
        raise ValueError(f"cms needs depth >= 1, width >= 2; got {depth}x{width}")
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    it = _col(item)
    # spread a starved single-file scan before the depth-way slot
    # explode (one md5 per row per depth — the per-row hot leg); no-op
    # whenever the scan already splits
    from postgresql_topn_spark.operators.dedup import spread_small_scan

    base = spread_small_scan(df, df.where(it.isNotNull()))
    # __-prefixed working names: bare 'slot'/'cnt' collided with
    # same-named user group columns at analysis time (review pin;
    # kmv.py's __h/__salt convention)
    slots = base.select(
        *gcols,
        F.explode(
            F.array(
                *[
                    (F.lit(i * width) + cms_slot(it, i, width)).alias("s")
                    for i in range(depth)
                ]
            )
        ).alias("__slot"),
    )
    names = [f.name for f in slots.schema.fields[:-1]]
    sparse = slots.groupBy(*names, "__slot").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    packed = sparse.groupBy(*names).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__slot"), F.col("__cnt")))
        ).alias("__m")
    )
    dw = depth * width
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dw - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i.cast("int")), F.lit(0)),
    )
    return packed.select(*names, dense.alias(out_col))


def cms_merge(a: Column | str, b: Column | str) -> Column:
    """Scalar two-sketch merge: element-wise sum (the `+` of the CMS
    algebra). NULL-tolerant: a NULL side acts as the zero sketch.
    Different-LENGTH sketches (two rollups built with different
    depth/width) raise instead of zip_with silently padding the short
    side with NULL cells and summing mismatched layouts (review
    pin)."""
    ca, cb = _col(a), _col(b)
    return (
        F.when(ca.isNull(), cb)
        .when(cb.isNull(), ca)
        .when(
            F.size(ca) != F.size(cb),
            F.raise_error(
                F.concat(
                    F.lit("cms_merge: sketch shapes differ ("),
                    F.size(ca).cast("string"),
                    F.lit(" vs "),
                    F.size(cb).cast("string"),
                    F.lit(" cells) — built with different depth/width"),
                )
            ).cast("array<bigint>"),
        )
        .otherwise(F.zip_with(ca, cb, lambda x, y: x + y))
    )


def _merge_collected(lst) -> "Column":
    """Element-wise sum across a collected list of sketches — THE merge
    fold, shared by the grouped rollup and the window fold so the merge
    law (incl. the all-NULL/empty-frame zero handling) lives in exactly
    one place."""
    zero = F.transform(
        F.try_element_at(lst, F.lit(1)), lambda v: F.lit(0).cast("bigint")
    )
    return F.aggregate(
        lst, zero, lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q)
    )


def cms_union_rollup(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    sketch_col: str = "cms",
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Merge pre-built sketches to a coarser grain: a collect_list fold
    of fixed-size arrays — per-group state is #sub-buckets * d * w
    longs, rows shuffled are sketches, never raw items."""
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    out = out_col or sketch_col
    merged = _merge_collected(F.collect_list(_col(sketch_col)))
    return df.groupBy(*gcols).agg(merged.alias(out))


def cms_union_over_window(
    sketch: Column | str, window
) -> Column:
    """Merge CMS sketches across a window FRAME (e.g. ROWS 6 PRECEDING
    for trailing-week point-frequency estimates) — the sliding-frame
    composition (the reference's hardest host composition) carried to
    the counting algebra. Element-wise addition folds the collected
    frame; per-row work is frame_size * d * w adds, and associativity
    makes the frame merge EXACTLY the sketch over the frame's raw
    rows."""
    return _merge_collected(F.collect_list(_col(sketch)).over(window))


def cms_estimate(
    sketch: Column | str,
    item: Column | str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> Column:
    """Point estimate of `item`'s count: min over the d rows' cells.
    Guarantees est >= true count; est <= true + (e/width)*N w.h.p.
    Probing a sketch whose cell count does not match depth*width reads
    unrelated cells and can UNDER-estimate (violating the one-sided
    guarantee), so a shape mismatch raises instead (review pin)."""
    s = _col(sketch)
    cells = F.array(
        *[
            F.element_at(s, F.lit(i * width + 1) + cms_slot(item, i, width))
            for i in range(depth)
        ]
    )
    return F.when(
        F.size(s) != depth * width,
        F.raise_error(
            F.concat(
                F.lit(f"cms_estimate(depth={depth}, width={width}): "),
                F.lit("sketch has "),
                F.size(s).cast("string"),
                F.lit(f" cells, expected {depth * width} — read it with "),
                F.lit("the depth/width it was built with"),
            )
        ).cast("bigint"),
    ).otherwise(F.array_min(cells))
