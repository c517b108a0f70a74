"""Mergeable Bloom-filter membership rollups — "has this key EVER been
seen in these buckets?" in a fixed number of bits per bucket.

The incremental-ingest question every dedup pipeline asks before an
expensive verify join: a new batch arrives and most keys are fresh, so
a compact per-bucket membership sketch that answers "definitely new"
(no false negatives) screens out the bulk of the batch for the cost of
d hash probes. Bloom filters (CACM 1970) are the canonical answer, and
they are mergeable by bitwise OR — per-day filters roll up to month /
all-time exactly (OR is associative), the same algebra as every other
rollup family here (topn, HLL, KMV, CMS, KLL).

Representation: array<long> of 32-bit words (packed little-endian by
slot index; 32 bits per word keeps every mask exactly representable
through the pow(2,b)->long path, no 64-bit shift expressions needed).
Hashing is the portable md5 row-hash (row i slots an item at
conv(substr(md5(i ':' item),1,15),16,10) % m_bits), so an ANSI oracle
replays membership decisions — INCLUDING false positives — exactly:
"might contain x" <=> every row-i slot of x is in the bucket's
inserted-slot set, which is pure set logic, no bit arithmetic needed
on the oracle side.

100 TB shape, all JVM expressions: build = one (group, word) hash-agg
exchange (BIT_OR partial-combines map-side; key space <= m_bits/32 per
group) + a per-group pack bounded at m_bits/32 entries; merge = a
collect_list fold of fixed-size arrays; probes are d AND-mask lookups
against a broadcast sketch — the read path never rescans raw history.

Sizing: keep set-bit load (n_keys * depth / m_bits) under ~0.3 or the
filter saturates toward all-true. The dense pack's map lookups cost
O(words * set_words) per group, comfortable to m_bits ~ 10^5-10^6; for
bigger key universes use the standard partitioned-filter layout (split
the key space across several buckets, each with its own filter row —
which is exactly what per-(day, shard) rollup rows already are).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col

DEFAULT_M_BITS = 4096
DEFAULT_DEPTH = 3
_WORD = 32


def bloom_slot(
    item: Column | str, row: int, m_bits: int, *, portable: bool = True
) -> Column:
    """Row-`row` bit index of `item` (0..m_bits-1).

    ``portable=True`` (default): md5-60bit — an ANSI oracle replays
    every membership decision INCLUDING false positives, the contract
    the rollup family's gate queries rest on. ``portable=False``:
    xxhash64 — several times cheaper per probe; use it when only the
    no-false-negative guarantee matters (semi-join pruning, where the
    RESULT is hash-independent), not the exact bit pattern."""
    if portable:
        salted = F.concat(F.lit(f"{row}:"), _col(item))
        h = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
        return F.pmod(h, F.lit(m_bits)).cast("int")
    return F.pmod(F.xxhash64(F.lit(row), _col(item)), F.lit(m_bits)).cast(
        "int"
    )


def _mask(bit: Column) -> Column:
    # 2^bit for bit in 0..31 — exact through double, no shift-by-column
    return F.pow(F.lit(2.0), bit.cast("double")).cast("long")


def bloom_add_agg(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    item: Column | str,
    *,
    m_bits: int = DEFAULT_M_BITS,
    depth: int = DEFAULT_DEPTH,
    out_col: str = "bloom",
    portable: bool = True,
    spread: bool = True,
) -> DataFrame:
    """Per-group Bloom filter (array<long> of m_bits/32 words) over
    `item`. NULL items are skipped. ``portable`` picks the slot hash
    (see bloom_slot) — build and probe MUST agree on it."""
    if m_bits % _WORD != 0 or m_bits < _WORD:
        raise ValueError(f"m_bits must be a positive multiple of {_WORD}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    it = _col(item)
    # starved-scan spread before the depth-way slot explode (one hash
    # per row per depth); no-op whenever the scan already splits.
    # spread=False opts out for broadcast-critical-path builds over
    # slim key projections (bloom_pruned_join), where the exchange
    # only delays the broadcast
    base = df.where(it.isNotNull())
    if spread:
        from postgresql_topn_spark.operators.dedup import spread_small_scan

        base = spread_small_scan(df, base)
    slots = base.select(
        *gcols,
        F.explode(
            F.array(
                *[
                    bloom_slot(it, i, m_bits, portable=portable)
                    for i in range(depth)
                ]
            )
        ).alias("__slot"),
    )
    names = [f.name for f in slots.schema.fields[:-1]]
    # __-prefixed working names: bare 'word'/'bits' collided with
    # same-named user group columns at analysis time (review pin)
    sparse = slots.select(
        *names,
        (F.col("__slot") / _WORD).cast("int").alias("__word"),
        _mask(F.pmod(F.col("__slot"), F.lit(_WORD))).alias("__bits"),
    ).groupBy(*names, "__word").agg(F.bit_or("__bits").alias("__bits"))
    nwords = m_bits // _WORD
    if nwords <= 4096:
        # small filters (the rollup-family default, 4096 bits = 128
        # words): one per-index map lookup each — O(words * set_words)
        # per group is trivial here and keeps the build at exactly two
        # exchanges
        packed = sparse.groupBy(*names).agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__word"), F.col("__bits")))
            ).alias("__m")
        )
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("int")), F.lit(0)
            ),
        )
        return packed.select(*names, dense.alias(out_col))
    # big filters (bloom_pruned_join's 2^20-bit default = 32k words):
    # Spark's map lookup is a LINEAR scan, so the transform pack is
    # O(words * set_words) ~ 10^9 comparisons and takes tens of seconds
    # (measured). Pack via a dense word GRID instead: groups x
    # sequence-explode -> left join the sparse words -> sort-collect.
    # O(nwords) rows through small exchanges, still zero Python.
    groups = sparse.select(*names).distinct() if names else None
    grid_words = F.explode(
        F.sequence(F.lit(0), F.lit(nwords - 1))
    ).alias("__word")
    if names:
        grid = groups.select(*names, grid_words)
        # NULL group keys: distinct() keeps a NULL-keyed grid row, but a
        # null-UNSAFE equi-join would never match it to its own sparse
        # words — that group's filter would pack all-zero and every
        # probe against it would return FALSE, a false negative (the
        # one guarantee the structure exists for; the small-filter map
        # lane is immune because groupBy treats NULL keys as a group).
        # Join with eqNullSafe per key column instead (review pin).
        rnames = [f"__r{i}" for i in range(len(names))]
        rsparse = sparse.select(
            *[F.col(c).alias(r) for c, r in zip(names, rnames)],
            F.col("__word").alias("__rword"),
            "__bits",
        )
        cond = grid["__word"] == rsparse["__rword"]
        for c, r in zip(names, rnames):
            cond = cond & grid[c].eqNullSafe(rsparse[r])
        joined = grid.join(rsparse, cond, "left").drop(
            "__rword", *rnames
        )
    else:
        grid = slots.sparkSession.range(1).select(grid_words)
        joined = grid.join(sparse, ["__word"], "left")
    dense_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__word"), F.coalesce("__bits", F.lit(0)).alias("__bits"))
            )
        ),
        lambda e: e["__bits"],
    )
    if names:
        return joined.groupBy(*names).agg(dense_sorted.alias(out_col))
    return joined.groupBy().agg(dense_sorted.alias(out_col))


def bloom_merge(a: Column | str, b: Column | str) -> Column:
    """Scalar two-filter merge: element-wise bitwise OR (the `+` of the
    membership algebra). NULL-tolerant: NULL acts as the empty filter.
    Different-LENGTH filters (built with different m_bits) raise
    instead of zip_with silently padding NULL words — a NULL word makes
    bloom_might_contain return NULL, which a NOT-probe caller reads as
    'seen' and silently drops fresh rows (review pin)."""
    ca, cb = _col(a), _col(b)
    return (
        F.when(ca.isNull(), cb)
        .when(cb.isNull(), ca)
        .when(
            F.size(ca) != F.size(cb),
            F.raise_error(
                F.concat(
                    F.lit("bloom_merge: filter shapes differ ("),
                    F.size(ca).cast("string"),
                    F.lit(" vs "),
                    F.size(cb).cast("string"),
                    F.lit(" words) — built with different m_bits"),
                )
            ).cast("array<bigint>"),
        )
        .otherwise(F.zip_with(ca, cb, lambda x, y: x.bitwiseOR(y)))
    )


def bloom_union_rollup(
    df: DataFrame,
    group_cols: Sequence[Column | str],
    sketch_col: str = "bloom",
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Merge pre-built filters to a coarser grain: a collect_list fold
    of fixed-size word arrays (per-group state = #sub-buckets * words).
    OR is associative, so the rollup equals the filter built over the
    raw union exactly."""
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    out = out_col or sketch_col
    lst = F.collect_list(_col(sketch_col))
    # try_element_at: all-NULL groups collect empty -> NULL merge, no crash
    zero = F.transform(
        F.try_element_at(lst, F.lit(1)), lambda v: F.lit(0).cast("bigint")
    )
    merged = F.aggregate(
        lst, zero, lambda acc, x: F.zip_with(acc, x, lambda p, q: p.bitwiseOR(q))
    )
    return df.groupBy(*gcols).agg(merged.alias(out))


def bloom_might_contain(
    sketch: Column | str,
    item: Column | str,
    *,
    m_bits: int = DEFAULT_M_BITS,
    depth: int = DEFAULT_DEPTH,
    portable: bool = True,
) -> Column:
    """Membership probe: TRUE iff all `depth` bits are set. No false
    negatives ever; false-positive rate ~= (set-bit fraction)^depth.
    Probing a filter whose word count does not match m_bits reads the
    wrong bit positions (false negatives — the one guarantee this
    structure exists for), so a shape mismatch raises instead (review
    pin). A depth or slot-hash (``portable``) mismatch is not
    structurally detectable: keep build/read parameters in one place
    (stream_bloom_dedup stores and checks geometry)."""
    s = _col(sketch)
    checks = []
    for i in range(depth):
        slot = bloom_slot(item, i, m_bits, portable=portable)
        word = F.element_at(s, (slot / _WORD).cast("int") + F.lit(1))
        mask = _mask(F.pmod(slot, F.lit(_WORD)))
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    nwords = m_bits // _WORD
    return F.when(
        F.size(s) != nwords,
        F.raise_error(
            F.concat(
                F.lit(f"bloom_might_contain(m_bits={m_bits}): filter has "),
                F.size(s).cast("string"),
                F.lit(f" words, expected {nwords} — probe with the m_bits "),
                F.lit("it was built with"),
            )
        ).cast("boolean"),
    ).otherwise(out)
