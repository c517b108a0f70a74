"""Distributed BPE (byte-pair-encoding) tokenizer training — the
"train a vocabulary on your own corpus" step of an LLM data pipeline
(Sennrich et al. 2016), run as Spark aggregations instead of a
single-machine counter.

Algorithm shape (the classic word-level BPE): collapse the corpus to
DISTINCT words with frequencies once (one hash-agg exchange — the only
pass over raw text; 100 TB of text is typically ~10^7-10^8 distinct
words), represent each word as a symbol array ending in the
end-of-word marker, then iterate: count adjacent symbol pairs
(weighted by word frequency, map-side combined), take the most
frequent pair (deterministic tie-break: lexicographic), rewrite every
word's symbol array with that pair merged, repeat. Every iteration is
one small job over the distinct-words DataFrame; the words DF is
checkpoint-persisted every few rounds so the plan doesn't grow
unboundedly (the connected-components pattern).

The in-array pair merge is a pure Catalyst fold (aggregate over the
symbol array carrying a (prev-symbol, out-array) state), so training
never ships word arrays through Python. `bpe_encode` applies a learned
merge list to new text via an Arrow-batched pandas UDF (the classic
apply loop — Python, but per-batch and only over the text being
tokenized).

Training is iterative and engine-specific (argmax ties + fixpoint), so
it carries pytest pins (hand-computed merges on a known corpus,
determinism across partitionings) rather than a DuckDB twin — the same
scope as the xxhash64 SimHash form (STATUS.md).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col
from postgresql_topn_spark.operators.text import tokens

EOW = "</w>"  # end-of-word sentinel: multi-char, so it can never collide
# with the single-character start symbols, and \s+ tokens cannot contain it


def _word_table(docs: DataFrame, text_col: Column | str) -> DataFrame:
    """(symbols array<string>, cnt) distinct-word table: the ONLY scan
    of raw text in training."""
    words = (
        docs.select(F.explode(tokens(_col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    symbols = F.concat(
        F.split(F.col("w"), ""),  # per-character symbols
        F.array(F.lit(EOW)),
    )
    return words.select(symbols.alias("syms"), "cnt")


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Rewrite a symbol array with every adjacent (a, b) merged to a+b
    — a single left fold, JVM-side. Overlapping runs merge
    left-to-right (aaa + merge(a,a) -> [aa, a]), matching the
    reference BPE implementations."""
    merged = F.lit(a + b)
    step = lambda acc, s: (  # noqa: E731
        F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))
    )
    empty = F.array().cast("array<string>")
    return F.aggregate(
        syms,
        empty,
        lambda acc, s: F.when(F.size(acc) == 0, F.array(s)).otherwise(
            step(acc, s)
        ),
    )


def train_bpe(
    docs: DataFrame,
    text_col: Column | str = "text",
    *,
    n_merges: int = 40,
    min_pair_count: int = 2,
    persist_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merge rules from the corpus. Returns the
    ordered merge list (apply order = learn order). Stops early when no
    pair reaches `min_pair_count`."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    base = _word_table(docs, text_col).persist()
    base.count()  # materialize the single raw-text scan
    words = base
    merges: list[tuple[str, str]] = []
    try:
        for i in range(n_merges):
            pairs = words.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
                "cnt",
            )
            top = (
                pairs.groupBy("p")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_pair_count:
                break
            a, b = top[0]["p"]["a"], top[0]["p"]["b"]
            merges.append((a, b))
            words = words.select(
                _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "cnt"
            )
            if (i + 1) % persist_every == 0:
                # cut plan growth: localCheckpoint truncates lineage
                # (swap for reliable checkpoints on a cluster, like
                # connected_components' checkpoint_dir mode)
                words = words.localCheckpoint(eager=True)
    finally:
        base.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    *,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a learned merge list: per word, start from
    characters + EOW and apply every merge in learn order (the
    classic greedy BPE apply). Arrow-batched pandas UDF — Python runs
    only over the text being encoded, merge rules ride the closure."""
    from pyspark.sql.functions import pandas_udf

    rules = list(merges)

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        ranks = {pair: i for i, pair in enumerate(rules)}

        def enc_word(w: str) -> list[str]:
            syms = list(w) + [EOW]
            while len(syms) > 1:
                best, best_rank = None, None
                for j in range(len(syms) - 1):
                    r = ranks.get((syms[j], syms[j + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = j, r
                if best is None:
                    break
                syms = (
                    syms[:best]
                    + [syms[best] + syms[best + 1]]
                    + syms[best + 2 :]
                )
            return syms

        def enc(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.split():
                out.extend(
                    t
                    for t in (s.removesuffix(EOW) for s in enc_word(w))
                    if t  # a standalone EOW symbol strips to empty: drop
                )
            return out

        return texts.map(enc)

    return docs.select(id_col, encode(_col(text_col)).alias(out_col))
