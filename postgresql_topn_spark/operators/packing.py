"""Token-stream packing: assign every document a byte-exact position in
the concatenated token stream and the training-context bins it lands in
— the concat-and-chunk step that turns a curated corpus into
fixed-length LLM training contexts.

Semantics (the standard "concatenate everything, cut every
`context_len` tokens" regime): documents are laid out in ascending
`id_col` order; a document's `start_offset` is the total token count of
every earlier document; `first_bin`/`last_bin` are the context indices
its tokens straddle. The whole mapping is a prefix sum over a total
order.

Scale design — the naive form is a window cumsum with NO partition key,
which Spark executes on a single reducer (the entire corpus through one
task: the textbook scale-killer). Instead a two-level prefix sum:

1. documents bucket by `floor(id / bucket_width)` — an ORDER-PRESERVING
   key (id ranges don't interleave across buckets), so bucket-local
   cumsums ordered by id are correct within each bucket and run
   fully parallel;
2. per-bucket token totals (one tiny combine-heavy aggregate — one row
   per bucket) get THEIR prefix sum on a single partition, which is
   fine because it's #buckets rows, not #documents;
3. bucket prefix broadcast-joins back: global offset = bucket prefix +
   local cumsum - own tokens.

The only single-partition work is over #buckets rows (bounded by
id-range / bucket_width — pick bucket_width so that's ~10^5 at your
corpus size), and the oracle can still be the naive one-window SQL
because the results are identical by associativity of +.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from postgresql_topn_spark.functions.sketch import _col


def pack_token_stream(
    docs: DataFrame,
    id_col: str,
    n_tokens: Column | str,
    *,
    context_len: int = 2048,
    bucket_width: int = 100_000,
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, first_bin, last_bin): position
    of each document in the concatenated token stream cut into
    `context_len`-token training contexts.

    `n_tokens` is a Column (or column name) giving the document's token
    count — pass `ws_token_count("text")` or a pre-computed column.
    Zero-token documents get first_bin = last_bin = the bin of their
    offset (they occupy no tokens but keep a well-defined position).
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _col(n_tokens).cast("long").alias("n_tokens"),
    ).withColumn("__bkt", F.floor(F.col("doc_id") / bucket_width))

    # 1. bucket-local cumsum (parallel across buckets)
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__cum", F.sum("n_tokens").over(w_local))

    # 2. per-bucket totals -> prefix over buckets (tiny: one row/bucket)
    w_bkt = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bkt_prefix = (
        base.groupBy("__bkt")
        .agg(F.sum("n_tokens").alias("__tot"))
        .withColumn("__prefix", F.sum("__tot").over(w_bkt) - F.col("__tot"))
        .select("__bkt", "__prefix")
    )

    # 3. broadcast the bucket prefixes back
    out = local.join(F.broadcast(bkt_prefix), "__bkt").select(
        "doc_id",
        "n_tokens",
        (F.col("__prefix") + F.col("__cum") - F.col("n_tokens")).alias(
            "start_offset"
        ),
    )
    end_tok = F.col("start_offset") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / context_len)
        .cast("long")
        .alias("first_bin"),
        F.floor(end_tok / context_len).cast("long").alias("last_bin"),
    )
