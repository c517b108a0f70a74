"""Trained quality classifier — the GPT-3 / LLaMA / RefinedWeb
"quality filter" stage: a logistic-regression classifier over hashed
n-gram features, trained to separate a REFERENCE ("high-quality")
corpus from the raw pool, then used to score every document (GPT-3
trained LR against WebText/Wikipedia/Books positives and Common Crawl
negatives; LLaMA and RefinedWeb run the same shape with fastText).
This is the supervised sibling of DSIR (operators/dsir.py): DSIR
derives per-document importance WEIGHTS from two bag-of-ngram
multinomials; the classifier fits a DISCRIMINATIVE boundary by
gradient descent and emits a calibrated probability.

The whole training loop is distributed AND deterministic — the
fixed-point discipline the repo's oracles depend on, applied to
gradient descent:

- features: the exact DSIR feature space (word unigrams + bigrams,
  md5-60bit mod n_buckets) — scan-stage explode, one hash-agg to
  per-doc counts; integer.
- forward pass: ``z_micro = b_micro + sum(cnt * w_micro)`` is an
  EXACT INTEGER sum (weights live in integer micro-units), so the
  logit is summation-order independent. The only float step is
  ``p = 1/(1+exp(-clamp(z_micro/1e6)))`` — one fixed expression
  evaluated per-row identically by any IEEE engine (the clamp to
  +/-30 keeps exp out of the denormal range); the residual is
  immediately re-fixed-pointed: ``r_micro = round((p - y) * 1e6)``.
- gradient: ``g(i) = sum_docs(cnt * r_micro)`` — exact integer again.
- update: ``w' = w - round(lr * g / n)`` — one double expression over
  exact integers, rounded back to integer micro-units. After every
  iteration the entire model state is integers, so T unrolled
  iterations replay bit-for-bit in ANSI SQL (the gate's DuckDB oracle
  does exactly that).

100 TB shape: per iteration, ONE doc-keyed hash-agg (the logit sum)
and ONE bucket-keyed hash-agg (the gradient, key space <= n_buckets),
both map-side combined; the n_buckets-row weight table and the 1-row
bias/count frames ride broadcasts. The feature frame is computed once
and lineage-cut (localCheckpoint), so T iterations cost T bounded
aggs over it — no Python stages, no driver-side data, no global sort.
Model size is fixed at n_buckets+1 rows regardless of corpus size.

Reference-parity note: this module is beyond the reference's own
surface (citusdata/postgresql-topn is the sketch engine; SURVEY.md
mandates the LLM-pipeline operators as first-class additions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col
from postgresql_topn_spark.operators.dsir import (
    _bucket,
    hashed_ngrams,
)

_MICRO = 1_000_000
# |z|/1e6 is clamped here before exp(): sigmoid saturates to within
# 1e-13 of {0,1} by +/-30, and keeping exp() in a sane range avoids
# engine-dependent denormal handling.
_Z_CLAMP = 30.0


def lr_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    *,
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt) hashed-ngram multinomial counts — the shared
    feature representation of `lr_train` / `lr_score` (identical to
    DSIR's: word unigrams + bigrams, md5-60bit mod n_buckets). One
    scan-stage explode + one hash-agg; 'bucket'/'cnt' are reserved
    output names (the dsir_bucket_counts convention)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if id_col in ("bucket", "cnt"):
        raise ValueError(
            f"id_col may not be a reserved output name ({id_col!r})"
        )
    return (
        docs.select(
            _col(id_col).alias(id_col),
            F.explode(hashed_ngrams(text_col, bigrams=bigrams)).alias("__f"),
        )
        .select(id_col, _bucket(F.col("__f"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _sigmoid(z_micro: Column) -> Column:
    z = F.greatest(
        F.lit(-_Z_CLAMP),
        F.least(F.lit(_Z_CLAMP), z_micro.cast("double") / F.lit(float(_MICRO))),
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lr_train(
    pos: DataFrame,
    neg: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    n_buckets: int = 4096,
    iters: int = 3,
    lr: float = 0.5,
    bigrams: bool = True,
) -> DataFrame:
    """Train the classifier: `pos` is the reference ("high-quality")
    corpus, `neg` the raw pool sample. Full-batch gradient descent
    from a zero init, `iters` rounds at step size ``lr/n`` (per-doc
    normalized). Returns the model as (bucket, w_micro) with the BIAS
    stored at bucket = -1 (md5 buckets are non-negative, so -1 is
    free) — one bounded table, ready to persist and reuse across
    scoring runs like DSIR's model.

    The frames may share document ids (training identity is
    (label, id)); a document present in BOTH frames contributes one
    positive and one negative example — dedup upstream if that is not
    intended. Zero-token documents still train the bias (their logit
    is the bare bias term), matching what the scorer does to them;
    NULL-id documents behave the same way (a NULL training identity
    joins no features, so they contribute to the bias gradient only —
    they are counted in n, not silently dropped).

    No regularization / early stopping: full-batch GD on a convex
    loss with a fixed iteration count is the deterministic-replay
    form; at production scale the same loop runs on a deterministic
    subsample of each corpus (`deterministic_sample`) — the model is
    n_buckets rows either way.

    The returned frame is tagged (Python-side) with
    (n_buckets, bigrams); `lr_score` validates the tag so a model
    can't silently be scored in the wrong feature space (the DSIR
    model-tag convention)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be positive, got {lr}")

    def _labeled(df: DataFrame, y: int) -> DataFrame:
        return df.select(
            F.concat(
                F.lit(f"{y}:"), _col(id_col).cast("string")
            ).alias("__tid"),
            F.lit(y).alias("__y"),
            _col(text_col).alias("__text"),
        )

    train = _labeled(pos, 1).unionByName(_labeled(neg, 0))
    examples = train.select("__tid", "__y").localCheckpoint(eager=False)
    feats = lr_features(
        train, "__tid", "__text", n_buckets=n_buckets, bigrams=bigrams
    ).localCheckpoint(eager=False)
    n_row = examples.agg(F.count(F.lit(1)).alias("__n"))

    w = None  # (bucket, w_micro); None = the all-zero init
    b = None  # 1-row (b_micro);   None = zero bias
    for _ in range(iters):
        zsum = feats
        if w is not None:
            zsum = zsum.join(F.broadcast(w), "bucket", "left")
            zterm = F.col("cnt") * F.coalesce(F.col("w_micro"), F.lit(0))
        else:
            zterm = F.lit(0).cast("long")
        zsum = zsum.groupBy("__tid").agg(F.sum(zterm).alias("__z0"))
        z = examples.join(zsum, "__tid", "left")
        if b is not None:
            z = z.crossJoin(F.broadcast(b))
            z_micro = F.col("b_micro") + F.coalesce(F.col("__z0"), F.lit(0))
        else:
            z_micro = F.coalesce(F.col("__z0"), F.lit(0))
        resid = z.select(
            "__tid",
            F.round(
                (_sigmoid(z_micro) - F.col("__y").cast("double"))
                * F.lit(float(_MICRO)),
                0,
            )
            .cast("long")
            .alias("__r"),
        )
        grad = (
            feats.join(resid, "__tid")
            .groupBy("bucket")
            .agg(F.sum(F.col("cnt") * F.col("__r")).alias("__g"))
        )
        if w is not None:
            grad = grad.join(w, "bucket", "left")
            w_prev = F.coalesce(F.col("w_micro"), F.lit(0))
        else:
            w_prev = F.lit(0).cast("long")
        w = (
            grad.crossJoin(F.broadcast(n_row))
            .select(
                "bucket",
                (
                    w_prev
                    - F.round(
                        F.lit(float(lr))
                        * F.col("__g").cast("double")
                        / F.col("__n").cast("double"),
                        0,
                    ).cast("long")
                ).alias("w_micro"),
            )
            .localCheckpoint(eager=False)
        )
        bgrad = resid.agg(F.sum("__r").alias("__bg"))
        b_prev = F.col("b_micro") if b is not None else F.lit(0).cast("long")
        bnew = bgrad.crossJoin(F.broadcast(n_row))
        if b is not None:
            bnew = bnew.crossJoin(F.broadcast(b))
        b = bnew.select(
            (
                b_prev
                - F.round(
                    F.lit(float(lr))
                    * F.col("__bg").cast("double")
                    / F.col("__n").cast("double"),
                    0,
                ).cast("long")
            ).alias("b_micro")
        ).localCheckpoint(eager=False)

    model = w.unionByName(
        b.select(F.lit(-1).cast("long").alias("bucket"), F.col("b_micro").alias("w_micro"))
    )
    model._lr_params = (int(n_buckets), bool(bigrams))  # type: ignore[attr-defined]
    return model


def lr_score(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """Score documents under a trained model: (id, z_micro, prob) with
    ``z_micro`` the exact-integer logit and ``prob`` the sigmoid
    rounded to 6 decimals. Documents with no features get the bare
    bias logit (scored, not dropped — the curation pipeline judges
    every row). One broadcast join + one doc-keyed agg; the quality
    FILTER is then just ``.where(F.col('prob') >= t)`` — or keep the
    probability as a sampling weight (the GPT-3 Pareto trick is a
    downstream choice this operator doesn't hard-code)."""
    if id_col in ("z_micro", "prob", "bucket", "cnt"):
        raise ValueError(
            f"id_col may not be a reserved output name ({id_col!r})"
        )
    params = getattr(model, "_lr_params", None)
    if params is not None and params != (int(n_buckets), bool(bigrams)):
        raise ValueError(
            f"model was trained with (n_buckets, bigrams)={params}, "
            f"scored with ({n_buckets}, {bigrams}) — feature spaces "
            "must match"
        )
    bias = model.where(F.col("bucket") == -1).select(
        F.col("w_micro").alias("__b")
    )
    weights = model.where(F.col("bucket") != -1)
    feats = lr_features(
        docs, id_col, text_col, n_buckets=n_buckets, bigrams=bigrams
    )
    zsum = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("w_micro")).alias("__z0"))
    )
    z_micro = F.col("__b") + F.coalesce(F.col("__z0"), F.lit(0))
    return (
        docs.select(_col(id_col).alias(id_col))
        .join(zsum, id_col, "left")
        .crossJoin(F.broadcast(bias))
        .select(
            id_col,
            z_micro.alias("z_micro"),
            F.round(_sigmoid(z_micro), 6).alias("prob"),
        )
    )
