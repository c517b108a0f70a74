"""Keyword search and term-weighting operators for training-data
pipelines: BM25 ranked retrieval and per-document TF-IDF salient terms.

Why these live next to the dedup/ANN operators: curation pipelines use
keyword retrieval to audit corpora (pull the top documents for probe
queries, e.g. contamination phrases or quality markers) and TF-IDF to
surface what a document is "about" for mixing/reporting. Both are pure
relational dataflows — tokenize, aggregate, join, rank — so they run
JVM-side at scan speed with no Python in the row path.

Scale notes (100 TB):
- :func:`bm25_topk` never shuffles the token stream. Query terms are a
  small literal list, so per-document term frequencies come from array
  expressions over the tokenized column (zero-shuffle map stage); only
  (doc, query-term) hit rows — a tiny fraction of the corpus — reach
  the ranking exchange. Spark plans the per-term top-k with a Partial
  WindowGroupLimit (each map task forwards at most k rows per term
  before the exchange — plan-asserted in tests/test_plans.py), so a
  query term matching half the corpus never lands a full posting list
  on one reducer; ``salt_buckets`` adds the same lossless two-level
  pre-rank explicitly for engines/versions without that pushdown.
- :func:`tfidf_top_terms` shuffles (doc, term) pairs once with map-side
  partial combine; document-frequency rides a second combine-heavy
  aggregate keyed by term (vocabulary-sized, zipfian — AQE handles the
  skewed join side, or pass ``broadcast_df=True`` when the vocabulary
  fits an executor, which it does for natural-language corpora).

Both emit scores rounded to ``round_to`` decimals and rank over the
ROUNDED score so results are hash-comparable across engines (ln/sqrt
may differ in the last ulp between libm implementations).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from postgresql_topn_spark.operators.text import tokens


def _ranked_topk(
    scored: DataFrame,
    part_col: str,
    k: int,
    order_cols: list,
    salt_buckets: int | None,
    tie_col: str,
) -> DataFrame:
    """Top-k per *part_col* with an optional lossless salted pre-rank
    (same argument as functions/aggregates.py: any row in the true
    top-k is also in its hash-sub-bucket's top-k, so pre-filtering to
    salt_buckets*k survivors drops no winners while bounding the rows
    any single reducer sorts)."""
    if salt_buckets and salt_buckets > 1:
        sub = F.pmod(F.xxhash64(F.col(tie_col).cast("string")), salt_buckets)
        w_pre = F.row_number().over(
            Window.partitionBy(F.col(part_col), sub).orderBy(*order_cols)
        )
        scored = (
            scored.withColumn("__prn", w_pre)
            .where(F.col("__prn") <= k)
            .drop("__prn")
        )
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    salt_buckets: int | None = None,
) -> DataFrame:
    """(term, doc_id, score, rank): top-*k* documents per query term
    under Okapi BM25 (Robertson idf with the Lucene +1 floor:
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``).

    Zero-shuffle scoring: *query_terms* is a literal list, so per-doc
    term frequency is ``size(filter(tokens, t -> t = term))`` — an
    array expression evaluated during the scan, no token explode, no
    (doc, term) shuffle. Corpus stats (N, avgdl) are a 1-row aggregate
    cross-joined back (broadcast); per-term document frequency is a
    |query_terms|-row aggregate joined back broadcast. Only documents
    that HIT a query term carry rows past the scan.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # dedupe (order-preserving): a repeated term would double its df
    # (understating idf) and emit duplicate hit rows occupying two
    # ranks (review pin)
    qt = list(dict.fromkeys(str(t) for t in query_terms))

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("__t"),
    ).select("doc_id", "__t", F.size("__t").alias("dl"))

    # stack (term, tf) per doc from array expressions — literal fan-out,
    # evaluated map-side; tf=0 rows die immediately.
    pairs = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.size(
                    F.filter("__t", lambda x: x == F.lit(t))  # noqa: B023
                ).alias("tf"),
            )
            for t in qt
        ]
    )
    hits = (
        base.select("doc_id", "dl", F.explode(pairs).alias("__p"))
        .select("doc_id", "dl", F.col("__p.term").alias("term"), F.col("__p.tf").alias("tf"))
        .where(F.col("tf") > 0)
    )

    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    df_t = hits.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    scored = (
        hits.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            F.round(
                F.log(
                    (F.col("n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (
                    F.col("tf") * F.lit(k1 + 1.0)
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0)
                            - F.lit(b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")
                        )
                    )
                ),
                round_to,
            ).alias("score"),
        )
    )
    return _ranked_topk(
        scored,
        "term",
        k,
        [F.col("score").desc(), F.col("doc_id").asc()],
        salt_buckets,
        tie_col="doc_id",
    ).select("term", "doc_id", "score", F.col("rank").cast("int").alias("rank"))


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    top: int = 3,
    round_to: int = 6,
    broadcast_df: bool = True,
) -> DataFrame:
    """(doc_id, term, score, rank): each document's *top* terms by
    smoothed TF-IDF — ``(tf / dl) * (ln((N + 1)/(df + 1)) + 1)``.

    Plan: one (doc, term) shuffle with map-side partial combine builds
    term frequencies; document length and per-term document frequency
    are both DERIVED from that aggregate (Catalyst reuses the exchange
    — no second pass over the token stream); the per-doc top-``top``
    rank partitions by doc_id, whose cardinality is the corpus itself,
    so no reducer hot spot exists by construction."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n_docs = dl.agg(F.count("*").cast("double").alias("n"))
    if broadcast_df:
        df_t = F.broadcast(df_t)

    scored = (
        tf.join(dl, "doc_id")
        .join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("tf") / F.col("dl"))
                * (F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
                round_to,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .select("doc_id", "term", "score", F.col("rank").cast("int").alias("rank"))
    )
