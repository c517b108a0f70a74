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

Features are MEAN-NORMALIZED (the fastText form): each document's
feature vector is its bucket-count distribution, not raw counts —
``m(d,i) = round(cnt(d,i) * 1e6 / n_feats(d))`` in integer micro
units, so every document carries ~1e6 total feature mass regardless
of length. This is what keeps full-batch GD well-conditioned: with
RAW counts a 600-gram document multiplies every weight 600x and
three lr=0.5 steps drive |z| to tens of nats — every probability
saturates to 0/1 and the "calibrated" output is a step function (the
first cut of this module did exactly that; the sf0.01 gate corpus,
whose labels are near-independent of the text, came back with every
prob < 0.01 instead of near the 0.44 base rate).

The whole training loop is distributed AND deterministic — the
fixed-point discipline the repo's oracles depend on, applied to
gradient descent:

- features: the exact DSIR feature space (word unigrams + bigrams,
  md5-60bit mod n_buckets) — scan-stage explode, one hash-agg to
  per-doc counts, one more double op for the micro-mean mass
  ``m = round(cnt * 1e6 / n_feats)``; integers thereafter.
- forward pass: ``z_micro = b_micro + round(sum(m * w_micro) / 1e6)``
  — the sum is EXACT INTEGER (weights live in integer micro-units),
  the division one double op on an exact integer, so the logit is
  summation-order independent. The only other float step is
  ``p = 1/(1+exp(-clamp(z_micro/1e6)))`` — one fixed expression
  evaluated per-row identically by any IEEE engine (the clamp to
  +/-30 keeps exp out of the denormal range); the residual is
  immediately re-fixed-pointed: ``r_micro = round((p - y) * 1e6)``.
- gradient: per-(doc, bucket) term ``t = round(m * r_micro / 1e6)``
  (re-fixed-pointed so the bucket sum ``g(i) = sum_docs(t)`` stays
  exact-integer AND int64-safe at any corpus size: |t| <= 1e6, so a
  billion-document gradient is ~1e15, nowhere near overflow — the
  raw product ``m * r`` is ~1e12 per doc and would overflow the
  bucket sum past ~1e7 docs). Alongside it, ``M(i) = sum_docs(m)`` —
  the feature's total observed mass (same exact-integer agg).
- update: DIAGONALLY PRECONDITIONED descent —
  ``w' = w - round(lr * g / M * 1e6)``: each coordinate's step is its
  feature-mass-weighted MEAN residual, not the n-normalized sum. Raw
  full-batch GD is hopelessly scaled here: a feature direction's
  curvature is ~||m||^2 ~ 1/n_distinct_buckets of the bias's, so any
  lr that moves the weights stalls or oscillates the bias (measured:
  lr=100 flips every probability 0 -> 1 between iterations — the
  bias diverging — while lr=2 moves mean separation 0.03 in 40
  rounds). Normalizing by M gives every coordinate the bias's own
  classic rule (the bias IS the mass-1 feature: M = n recovers
  ``lr * sum(r) / n`` exactly), and with mean-normalized features
  the preconditioned curvature is <= 1/4 per coordinate, so lr <= 2
  is stable for ANY corpus; default lr = 1. The division is one
  double expression over exact integers in a fixed parenthesization,
  rounded back to integer micro-units. After every iteration the
  entire model state is integers, so T unrolled iterations replay
  bit-for-bit in ANSI SQL (the gate's DuckDB oracle does exactly
  that).

100 TB shape: per iteration, ONE doc-keyed hash-agg (the logit sum)
and ONE bucket-keyed hash-agg (the gradient, key space <= n_buckets),
both map-side combined; the n_buckets-row weight table and the 1-row
bias/count frames ride broadcasts. The feature frame is computed once
and lineage-cut (localCheckpoint by default; pass ``checkpoint_dir``
for reliable shared-storage cuts that survive executor loss — see
operators/checkpointing.py), so T iterations cost T bounded
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

# Reserved model rows (md5 buckets are non-negative): -1 bias,
# -2/-3 the embedded (n_buckets, bigrams) feature-space parameters —
# the part of the model that must survive persistence for lr_score's
# mismatch validation to keep working on reloaded models.
_PARAM_NBUCKETS_ROW = -2
_PARAM_BIGRAMS_ROW = -3


def lr_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    *,
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt, m) hashed-ngram features — the shared
    representation of `lr_train` / `lr_score` (the feature space is
    DSIR's: word unigrams + bigrams, md5-60bit mod n_buckets). ``cnt``
    is the raw multinomial count; ``m`` is the MEAN-NORMALIZED micro
    mass ``round(cnt * 1e6 / n_feats)`` (n_feats = the document's
    total gram count), so every document carries ~1e6 total mass —
    the fastText-style conditioning the GD loop needs. One scan-stage
    explode + one hash-agg (n_feats rides the group keys: it is a
    scan-stage expression, constant per document); 'bucket'/'cnt'/'m'
    are reserved output names (the dsir_bucket_counts convention)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if id_col in ("bucket", "cnt", "m"):
        raise ValueError(
            f"id_col may not be a reserved output name ({id_col!r})"
        )
    grams = hashed_ngrams(text_col, bigrams=bigrams)
    # materialize the gram array in its own projection BELOW the
    # generator: referencing the array expression alongside explode()
    # makes Spark rebuild the whole array per EXPLODED row (the
    # projection collapses into the Generate output — measured 35s vs
    # 1.5s on 536k grams at sf0.1); a named column under the Generate
    # node is built once per document
    return (
        docs.select(_col(id_col).alias(id_col), grams.alias("__g"))
        .select(
            id_col,
            F.size("__g").cast("long").alias("__nf"),
            F.explode("__g").alias("__f"),
        )
        .select(
            id_col, "__nf", _bucket(F.col("__f"), n_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket", "__nf")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            id_col,
            "bucket",
            "cnt",
            F.round(
                F.col("cnt").cast("double")
                * F.lit(float(_MICRO))
                / F.col("__nf").cast("double"),
                0,
            )
            .cast("long")
            .alias("m"),
        )
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
    lr: float = 1.0,
    bigrams: bool = True,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """Train the classifier: `pos` is the reference ("high-quality")
    corpus, `neg` the raw pool sample. Full-batch gradient descent
    from a zero init, `iters` rounds at step size ``lr/n`` (per-doc
    normalized). Returns the model as (bucket, w_micro) with the BIAS
    stored at bucket = -1 and the feature-space parameters embedded at
    buckets -2/-3 (md5 buckets are non-negative, so negatives are
    free) — one bounded table, ready to persist and reuse across
    scoring runs like DSIR's model; `lr_score` validates the embedded
    parameters even on a model reloaded from storage, where a
    Python-side tag would have been lost.

    ``lr`` is in NATS under the mass preconditioner (module
    docstring): every coordinate's step is lr x its mass-weighted
    mean residual, so lr=1 moves a cleanly-separating feature's
    weight ~0.5 nats on the first round and lr <= 2 is stable for
    any corpus (preconditioned curvature <= 1/4).

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
    model-tag convention).

    Every GD iteration cuts lineage at its (w, b) state — otherwise
    iteration k's plan embeds iterations 1..k-1 and a re-executed
    branch replays the whole history. ``checkpoint_dir=None`` cuts
    with executor-local blocks (fastest; lost on executor death);
    pass an HDFS/S3 path for RELIABLE cuts — iteration state then
    persists to shared storage and a failed executor recomputes
    nothing upstream (operators/checkpointing.py; the
    `connected_components` plumbing applied to the training loop).
    Superseded iteration state is released as the loop advances, but
    the RETURNED model keeps reading the two FINAL w/b cut dirs —
    their paths are exposed as ``model._lr_cut_paths`` so callers can
    `release_cut` both once the model is persisted elsewhere
    (`sweep_cuts` reaps them otherwise)."""
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

    from postgresql_topn_spark.operators.checkpointing import (
        release_cut,
        stage_cut,
    )

    def _cut(df: DataFrame) -> DataFrame:
        return stage_cut(df, checkpoint_dir)

    train = _labeled(pos, 1).unionByName(_labeled(neg, 0))
    examples = _cut(train.select("__tid", "__y"))
    feats = _cut(
        lr_features(
            train, "__tid", "__text", n_buckets=n_buckets, bigrams=bigrams
        )
    )
    n_row = examples.agg(F.count(F.lit(1)).alias("__n"))

    w = None  # (bucket, w_micro); None = the all-zero init
    b = None  # 1-row (b_micro);   None = zero bias
    for _ in range(iters):
        zsum = feats
        if w is not None:
            zsum = zsum.join(F.broadcast(w), "bucket", "left")
            zterm = F.col("m") * F.coalesce(F.col("w_micro"), F.lit(0))
        else:
            zterm = F.lit(0).cast("long")
        zsum = zsum.groupBy("__tid").agg(F.sum(zterm).alias("__z0"))
        z = examples.join(zsum, "__tid", "left")
        zdot = F.round(
            F.coalesce(F.col("__z0"), F.lit(0)).cast("double")
            / F.lit(float(_MICRO)),
            0,
        ).cast("long")
        if b is not None:
            z = z.crossJoin(F.broadcast(b))
            z_micro = F.col("b_micro") + zdot
        else:
            z_micro = zdot
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
            .agg(
                F.sum(
                    F.round(
                        (F.col("m") * F.col("__r")).cast("double")
                        / F.lit(float(_MICRO)),
                        0,
                    ).cast("long")
                ).alias("__g"),
                F.sum("m").alias("__M"),
            )
        )
        if w is not None:
            grad = grad.join(w, "bucket", "left")
            w_prev = F.coalesce(F.col("w_micro"), F.lit(0))
        else:
            w_prev = F.lit(0).cast("long")
        # mass-preconditioned step: lr x the feature's mass-weighted
        # mean residual (M == 0 only for mass-rounded-to-zero buckets;
        # they carry no signal, leave them at their previous weight)
        step = F.when(
            F.col("__M") > 0,
            F.round(
                F.lit(float(lr))
                * F.col("__g").cast("double")
                / F.col("__M").cast("double")
                * F.lit(float(_MICRO)),
                0,
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        new_w = _cut(grad.select("bucket", (w_prev - step).alias("w_micro")))
        bgrad = resid.agg(F.sum("__r").alias("__bg"))
        b_prev = F.col("b_micro") if b is not None else F.lit(0).cast("long")
        bnew = bgrad.crossJoin(F.broadcast(n_row))
        if b is not None:
            bnew = bnew.crossJoin(F.broadcast(b))
        new_b = _cut(
            bnew.select(
                (
                    b_prev
                    - F.round(
                        F.lit(float(lr))
                        * F.col("__bg").cast("double")
                        / F.col("__n").cast("double"),
                        0,
                    ).cast("long")
                ).alias("b_micro")
            )
        )
        if checkpoint_dir is not None:
            # both new cuts are fully on disk (parquet cuts are eager)
            # and the bias lineage that read the OLD w/b has executed —
            # release the superseded iteration state so the checkpoint
            # dir stays O(1) in iterations, not O(iters)
            release_cut(pos.sparkSession, w)
            release_cut(pos.sparkSession, b)
        w, b = new_w, new_b

    if checkpoint_dir is not None:
        # the training working set (labeled examples + feature table)
        # is dead once the final w/b cuts exist — the returned model
        # reads only those; release the other two file sets now
        release_cut(pos.sparkSession, examples)
        release_cut(pos.sparkSession, feats)

    # bias + feature-space parameters live IN the frame at reserved
    # negative buckets (md5 buckets are non-negative), so a model
    # persisted to parquet and reloaded still carries — and lr_score
    # still validates — the (n_buckets, bigrams) it was trained under;
    # the Python-side tag alone dies at the store boundary (the DSIR
    # params-frame review item, applied here)
    spark = pos.sparkSession
    meta = spark.createDataFrame(
        [
            (_PARAM_NBUCKETS_ROW, int(n_buckets)),
            (_PARAM_BIGRAMS_ROW, 1 if bigrams else 0),
        ],
        "bucket long, w_micro long",
    )
    model = w.unionByName(
        b.select(F.lit(-1).cast("long").alias("bucket"), F.col("b_micro").alias("w_micro"))
    ).unionByName(meta)
    model._lr_params = (int(n_buckets), bool(bigrams))  # type: ignore[attr-defined]
    # In reliable mode the model still READS the final w/b cut dirs —
    # a union of two cuts can't ride the single-path adopt_cut handle,
    # so expose both paths for reclamation (ADVICE r9): after
    # persisting the model elsewhere, callers release them with
    #   for p in model._lr_cut_paths: release_cut(spark, p)
    # (or let sweep_cuts reap them). Empty tuple in localCheckpoint
    # mode.
    from postgresql_topn_spark.operators.checkpointing import cut_path

    model._lr_cut_paths = tuple(  # type: ignore[attr-defined]
        p for p in (cut_path(w), cut_path(b)) if p is not None
    )
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
    if id_col in ("z_micro", "prob", "bucket", "cnt", "m"):
        raise ValueError(
            f"id_col may not be a reserved output name ({id_col!r})"
        )
    params = getattr(model, "_lr_params", None)
    if params is None:
        # a persisted-and-reloaded model: read the embedded parameter
        # rows (a 2-row filter on a small stored table — no training
        # lineage exists to accidentally trigger)
        prow = {
            r["bucket"]: r["w_micro"]
            for r in model.where(
                F.col("bucket").isin(_PARAM_NBUCKETS_ROW, _PARAM_BIGRAMS_ROW)
            ).collect()
        }
        if prow:
            params = (
                int(prow[_PARAM_NBUCKETS_ROW]),
                bool(prow[_PARAM_BIGRAMS_ROW]),
            )
    if params is not None and params != (int(n_buckets), bool(bigrams)):
        raise ValueError(
            f"model was trained with (n_buckets, bigrams)={params}, "
            f"scored with ({n_buckets}, {bigrams}) — feature spaces "
            "must match"
        )
    bias = model.where(F.col("bucket") == -1).select(
        F.col("w_micro").alias("__b")
    )
    weights = model.where(F.col("bucket") >= 0)
    feats = lr_features(
        docs, id_col, text_col, n_buckets=n_buckets, bigrams=bigrams
    )
    zsum = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("m") * F.col("w_micro")).alias("__z0"))
    )
    z_micro = F.col("__b") + F.round(
        F.coalesce(F.col("__z0"), F.lit(0)).cast("double")
        / F.lit(float(_MICRO)),
        0,
    ).cast("long")
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
