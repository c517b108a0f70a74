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

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from postgresql_topn_spark.functions.sketch import _col


def pack_token_stream(
    docs: DataFrame,
    id_col: str,
    n_tokens: Column | str,
    *,
    context_len: int = 2048,
    bucket_width: int = 100_000,
    keep: "Sequence[str]" = (),
) -> DataFrame:
    """(`id_col`, n_tokens, *keep, start_offset, first_bin, last_bin):
    position of each document in the concatenated token stream cut into
    `context_len`-token training contexts. The id keeps its own name
    (historically it was re-aliased to ``doc_id``; every caller used
    ``doc_id`` ids, so nothing observed the alias).

    `n_tokens` is a Column (or column name) giving the document's token
    count — pass `ws_token_count("text")` or a pre-computed column.
    Zero-token documents get first_bin = last_bin = the bin of their
    offset (they occupy no tokens but keep a well-defined position).

    `keep` lists extra input columns to carry through — they ride the
    bucket-local window untouched, so a caller that needs the packed
    row NEXT TO its payload (chunk text, source tags) pays ZERO extra
    shuffles instead of a post-pack join back on the id (the
    chunk->pack gates' shape).

    BREAKING (r11): `id_col` must be a NUMERIC column. Digit-string
    ids, which previously implicit-cast to double and packed under
    numeric order, now raise TypeError — cast them to long at the call
    site (`F.col("doc_id").cast("long")`) to keep the old behavior
    explicitly. Non-numeric string ids previously returned a silently
    EMPTY packing; they raise too.
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keep = list(keep)
    # outputs AND the internal working names: a keep column named like
    # __bkt/__cum would be silently overwritten by the withColumns
    # below (and __prefix hits an ambiguous-column crash at the join)
    reserved = {
        id_col,
        "n_tokens",
        "start_offset",
        "first_bin",
        "last_bin",
        "__bkt",
        "__cum",
        "__prefix",
        "__tot",
    }
    clash = [c for c in keep if c in reserved]
    if clash:
        raise ValueError(
            f"keep columns collide with outputs/internals: {clash}"
        )
    if len(set(keep)) != len(keep):
        raise ValueError(f"duplicate keep columns: {keep}")
    # round-11 review pin (rationale corrected r12): the bucket key is
    # floor(id / width), so the id must be numeric. A NON-numeric
    # string id implicit-casts to NULL buckets and the bucket-prefix
    # equi-join (NULL never equals NULL) silently returns an EMPTY
    # packing; a DIGIT-string id implicit-cast to double and packed
    # correctly, but under NUMERIC order, which silently diverges from
    # the lexical order a string column implies ("10" < "9"). Both
    # ambiguities fail loudly here — callers with digit-string ids
    # cast to long at the call site (a breaking change vs <= r10,
    # noted in the docstring).
    from pyspark.sql.types import NumericType

    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise TypeError(
            f"id_col {id_col!r} must be numeric (the stream order and "
            f"bucketing are arithmetic), got {id_type.simpleString()}"
        )

    base = docs.select(
        F.col(id_col).alias(id_col),
        _col(n_tokens).cast("long").alias("n_tokens"),
        *[F.col(c) for c in keep],
    ).where(
        # a NULL id has no position in the total order; it previously
        # vanished at the prefix join anyway — make the exclusion
        # explicit and scan-stage
        F.col(id_col).isNotNull()
    ).withColumn("__bkt", F.floor(F.col(id_col) / bucket_width))

    # 1. bucket-local cumsum (parallel across buckets)
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
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
        id_col,
        "n_tokens",
        *keep,
        (F.col("__prefix") + F.col("__cum") - F.col("n_tokens")).alias(
            "start_offset"
        ),
    )
    end_tok = F.col("start_offset") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    return out.select(
        id_col,
        "n_tokens",
        *keep,
        "start_offset",
        F.floor(F.col("start_offset") / context_len)
        .cast("long")
        .alias("first_bin"),
        F.floor(end_tok / context_len).cast("long").alias("last_bin"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    *,
    chunk_len: int = 256,
    overlap: int = 32,
    chunk_text: bool = True,
) -> DataFrame:
    """Sliding-window document chunking — the RAG / long-document
    pretraining splitter: each document becomes max(1, ceil((n-O)/(L-O)))
    chunks of up to `chunk_len` tokens, consecutive chunks sharing
    `overlap` tokens so no boundary context is lost and no chunk is a
    subset of its predecessor. Output rows:
    (id, chunk_idx, start_tok, n_tok[, chunk]) with chunk text
    re-joined on single spaces (whitespace runs are NOT preserved — the
    split is the same \\s+ tokenizer as the rest of the text stack;
    documented deviation, byte-exact slicing belongs to a tokenizer).

    All Catalyst expressions (sequence -> explode -> slice ->
    array_join): the explode multiplies rows, never materializes
    per-doc chunk arrays wider than the token split itself, and there
    is no shuffle at all — chunking stays in the scan stage, so a
    downstream groupBy/embedding stage sees perfectly partitioned
    input. Empty/whitespace-only documents yield zero chunks.
    """
    if chunk_len < 1:
        raise ValueError(f"chunk_len must be >= 1, got {chunk_len}")
    if not 0 <= overlap < chunk_len:
        raise ValueError(
            f"overlap must be in [0, chunk_len), got {overlap} vs {chunk_len}"
        )
    stride = chunk_len - overlap
    from postgresql_topn_spark.operators.text import tokens as _tokens

    toks = _tokens(_col(text_col))
    base = docs.select(
        id_col,
        toks.alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    nonempty = base.where(F.col("__n") > 0)
    # a start is emitted only while the PREVIOUS chunk did not already
    # reach the document's end (s <= n - overlap - 1): otherwise the
    # final chunk is a strict subset of its predecessor — duplicated
    # text that inflates and biases downstream training/retrieval data
    # (review pin; docs of length in (k*stride, k*stride + overlap]
    # used to emit one). s=0 always emits (greatest guard).
    starts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("__n") - overlap - 1, F.lit(0)),
            F.lit(stride),
        )
    ).alias("start_tok")
    out = nonempty.select(id_col, "__toks", "__n", starts)
    piece = F.slice(F.col("__toks"), F.col("start_tok") + 1, F.lit(chunk_len))
    cols = [
        F.col(id_col),
        ((F.col("start_tok") / stride).cast("int")).alias("chunk_idx"),
        F.col("start_tok"),
        F.least(F.lit(chunk_len), F.col("__n") - F.col("start_tok")).alias(
            "n_tok"
        ),
    ]
    if chunk_text:
        cols.append(F.array_join(piece, " ").alias("chunk"))
    return out.select(*cols)
