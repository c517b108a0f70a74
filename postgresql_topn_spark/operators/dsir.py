"""DSIR-style data selection via importance resampling (Xie et al.
2023, arXiv:2302.03169): score every raw document by how much more
likely it is under a TARGET distribution than under the RAW
distribution — both estimated as bag-of-hashed-n-gram multinomials —
then resample toward the target with Gumbel top-k.

This is the data-SELECTION primitive the mixing/sampling operators
don't provide: `temperature_mix`/`stratified_sample` apply GIVEN
per-source rates; DSIR *computes* a per-document weight from the
target corpus itself (e.g. "make the pretraining mix look like
Wikipedia"), the standard recipe for quality-targeted pretraining
subsets.

Hashed n-gram features (unigrams + word bigrams, md5-60bit mod
n_buckets) keep both models at a fixed n_buckets-row table regardless
of corpus size — the paper's trick, and the reason everything here is
two hash-agg exchanges plus broadcast joins:

- feature stream: scan-stage explode (tokens + zip_with bigrams, pure
  Catalyst);
- each model: one groupBy(bucket) over its corpus (bounded key space
  = n_buckets), map-side combined;
- scoring: doc-feature counts broadcast-join the n_buckets-row
  log-ratio table; per-doc weight = exact integer sum of
  cnt * lr_micro (the repo's fixed-point micro-nat discipline —
  summation-order independent, so the DuckDB oracle hash-matches);
- resampling: Gumbel top-k with md5-uniform noise (deterministic,
  partition-invariant, SQL-replayable) — key = logw/T + Gumbel, top-k
  by key, which samples without replacement proportionally to
  w^(1/T). A global TakeOrderedAndProject, never a full sort.

Smoothing: add-alpha on both multinomials; buckets never seen in
either corpus score at the derivable floor (both counts 0), applied
via coalesce — no lookup can fail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col
from postgresql_topn_spark.operators.text import tokens

_MICRO = 1_000_000
_TWO_POW_60 = float(1 << 60)


def hashed_ngrams(text: Column | str, *, bigrams: bool = True) -> Column:
    """array<string> of word unigrams (+ ' '-joined bigrams): the raw
    feature stream before hashing. Pure expressions; empty/whitespace
    text yields []."""
    t = tokens(text)
    if not bigrams:
        return t
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    bg = F.zip_with(
        F.slice(t, F.lit(1), n1),
        F.slice(t, F.lit(2), n1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return F.concat(t, bg)


def _bucket(feature: Column, n_buckets: int) -> Column:
    h = F.conv(F.substring(F.md5(feature), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(int(n_buckets)))


def _feature_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: Column | str,
    n_buckets: int,
    bigrams: bool,
) -> DataFrame:
    """(id, bucket) one row per feature OCCURRENCE (duplicates kept —
    multinomial counts, not set membership)."""
    # spread a starved single-file scan before the gram explode (the
    # per-row hot leg); no-op when the scan already splits or the
    # input is a cut/persisted frame
    from postgresql_topn_spark.operators.dedup import spread_small_scan

    docs = spread_small_scan(docs, docs)
    return docs.select(
        _col(id_col).alias("__id"),
        F.explode(hashed_ngrams(text_col, bigrams=bigrams)).alias("__f"),
    ).select("__id", _bucket(F.col("__f"), n_buckets).alias("bucket"))


def dsir_model(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """(bucket, ct, cr, lr_micro): per-bucket target/raw counts and the
    fixed-point log importance ratio

        lr_micro = round(((ln(ct+a) - ln(Tt+a*B)) -
                          (ln(cr+a) - ln(Tr+a*B))) * 1e6)

    over the union of buckets observed in either corpus. Two hash-agg
    exchanges (one per corpus, key space <= n_buckets) + one join of
    two <=n_buckets-row sides; totals ride a 1-row broadcast.

    The returned frame is tagged (Python-side) with the (n_buckets,
    alpha) it was built under; `dsir_importance`/`dsir_resample`
    validate the tag against their own parameters so a precomputed
    model can't silently skew the unseen-bucket floor (the only place
    the scoring side re-derives anything from those parameters)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    rc = (
        _feature_buckets(raw, id_col, text_col, n_buckets, bigrams)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tc = (
        _feature_buckets(target, id_col, text_col, n_buckets, bigrams)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return dsir_model_from_counts(
        rc, tc, n_buckets=n_buckets, alpha=alpha
    )


def dsir_bucket_counts(
    docs: DataFrame,
    group_cols: "list[Column | str]",
    *,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    n_buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """(group..., bucket, cnt): per-group hashed-feature counts — the
    MERGEABLE rollup form of the DSIR model. Counts are additive, so
    per-(source, day) rollup rows sum to the model counts of ANY slice
    without rescanning text: build once, model everything — the same
    build-per-bucket / merge-at-read algebra as the topn/HLL/KMV/CMS/
    Bloom/KLL families. One hash-agg exchange, key space bounded by
    |groups| * n_buckets.

    'bucket' and 'cnt' are reserved output names — a group column with
    either name would make the derived columns ambiguous, so it is
    rejected up front (the bloom.py collision-review convention: derive
    under a __-prefixed working name, alias at the end)."""
    gcols = [_col(c) if isinstance(c, str) else c for c in group_cols]
    gnames = docs.select(*gcols).columns
    clash = [n for n in gnames if n in ("bucket", "cnt")]
    if clash:
        raise ValueError(
            f"group_cols may not produce reserved output names {clash}; "
            "alias the column(s) before calling dsir_bucket_counts"
        )
    # same starved-scan spread as _feature_buckets
    from postgresql_topn_spark.operators.dedup import spread_small_scan

    docs = spread_small_scan(docs, docs)
    return (
        docs.select(
            *gcols,
            F.explode(hashed_ngrams(text_col, bigrams=bigrams)).alias("__f"),
        )
        .select("*", _bucket(F.col("__f"), n_buckets).alias("__bucket"))
        .drop("__f")
        .groupBy(*gnames, "__bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("__bucket", "bucket")
    )


def dsir_model_from_counts(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    *,
    n_buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """Build the (bucket, ct, cr, lr_micro) model from pre-aggregated
    (bucket, cnt) frames — e.g. `dsir_bucket_counts` rollup rows summed
    over the slices of interest. `dsir_model(raw, target)` ==
    `dsir_model_from_counts(sum-of-rollups)` exactly (counts are
    additive; the law is pytest-pinned)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    rc = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("cr"))
    tc = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("ct"))
    m = (
        rc.join(tc, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    totals = m.agg(
        F.sum("ct").alias("__tt"), F.sum("cr").alias("__tr")
    )
    a = float(alpha)
    ab = a * n_buckets
    lr = (
        (
            F.log(F.col("ct").cast("double") + F.lit(a))
            - F.log(F.col("__tt").cast("double") + F.lit(ab))
        )
        - (
            F.log(F.col("cr").cast("double") + F.lit(a))
            - F.log(F.col("__tr").cast("double") + F.lit(ab))
        )
    ) * F.lit(float(_MICRO))
    out = m.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "ct",
        "cr",
        F.round(lr, 0).cast("long").alias("lr_micro"),
    )
    out._dsir_params = (int(n_buckets), float(alpha))
    return out


def _check_model_params(
    model: DataFrame, n_buckets: int, alpha: float
) -> None:
    """Guard the model/scoring parameter coupling: the unseen-bucket
    floor is re-derived from the CALLER's (n_buckets, alpha), so a
    precomputed model built under different parameters would skew
    scores for out-of-model buckets only — silently. Models built by
    `dsir_model`/`dsir_model_from_counts` in this process carry a tag;
    a model re-read from storage loses it (tag None → the caller owns
    the coupling, as documented)."""
    tag = getattr(model, "_dsir_params", None)
    if tag is not None and tag != (int(n_buckets), float(alpha)):
        raise ValueError(
            f"model was built with (n_buckets, alpha)={tag} but scoring "
            f"was called with ({int(n_buckets)}, {float(alpha)}); the "
            "unseen-bucket floor depends on these — pass matching values"
        )


def _floor_row(model: DataFrame, n_buckets: int, alpha: float) -> DataFrame:
    """1-row (__floor) frame: the log ratio of a bucket unseen in BOTH
    corpora (counts 0) — the coalesce fallback for scoring documents
    outside the modeled corpora. Same formula, cnt=0."""
    a = float(alpha)
    ab = a * n_buckets
    return model.agg(
        F.round(
            (
                (
                    F.log(F.lit(a))
                    - F.log(F.sum("ct").cast("double") + F.lit(ab))
                )
                - (
                    F.log(F.lit(a))
                    - F.log(F.sum("cr").cast("double") + F.lit(ab))
                )
            )
            * F.lit(float(_MICRO)),
            0,
        )
        .cast("long")
        .alias("__floor")
    )


def dsir_importance(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """(id, n_feats, logw_micro): per-document log importance weight =
    exact integer sum of feature-count * bucket log-ratio. Documents
    with no features (empty text) keep weight 0 (ratio 1) rather than
    vanishing.

    (n_buckets, alpha) MUST match the values the model was built with
    (they derive the unseen-bucket floor); in-process models carry a
    tag that is validated here, models re-read from storage are on the
    caller."""
    _check_model_params(model, n_buckets, alpha)
    feats = (
        _feature_buckets(docs, id_col, text_col, n_buckets, bigrams)
        .groupBy("__id", "bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    scored = (
        feats.join(
            F.broadcast(model.select("bucket", "lr_micro")), "bucket", "left"
        )
        .crossJoin(F.broadcast(_floor_row(model, n_buckets, alpha)))
        .groupBy("__id")
        .agg(
            F.sum("__cnt").alias("n_feats"),
            F.sum(
                F.col("__cnt") * F.coalesce("lr_micro", F.col("__floor"))
            ).alias("logw_micro"),
        )
    )
    ids = docs.select(_col(id_col).alias("__id")).distinct()
    return ids.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col if isinstance(id_col, str) else "id"),
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.coalesce("logw_micro", F.lit(0)).alias("logw_micro"),
    )


def gumbel_micro(key: Column | str, seed: int = 0) -> Column:
    """Fixed-point standard Gumbel noise from a stable key:
    g = -ln(-ln(u)) with u = (md5-60bit(seed ':' key) + 0.5) / 2^60
    (strictly inside (0,1), so neither ln can hit 0/inf), rounded to
    integer micro-nats. Deterministic across partitionings, retries
    and engines."""
    s = F.concat(F.lit(f"{seed}:"), _col(key).cast("string"))
    h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_TWO_POW_60)
    return F.round(-F.log(-F.log(u)) * F.lit(float(_MICRO)), 0).cast("long")


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: Column | str = "text",
    k: int,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = True,
    temperature: float = 1.0,
    seed: int = 0,
    model: DataFrame | None = None,
) -> DataFrame:
    """Gumbel top-k importance resampling of `docs` toward `target`:
    key_micro = round(logw_micro / T) + gumbel_micro(id); take the k
    largest keys (ties broken by id). Sampling without replacement
    with P(select) proportional to w^(1/T); T->0 approaches
    deterministic top-k by weight, T=1 is the paper's resampling.
    Returns (id, n_feats, logw_micro, key_micro) for the k sampled
    documents — integer columns end to end, exactly replayable.

    `model` overrides the (raw=docs, target) model build — pass a
    precomputed `dsir_model` output to score several candidate pools
    against one target."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if model is None:
        model = dsir_model(
            docs,
            target,
            id_col=id_col,
            text_col=text_col,
            n_buckets=n_buckets,
            alpha=alpha,
            bigrams=bigrams,
        )
    w = dsir_importance(
        docs,
        model,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        alpha=alpha,
        bigrams=bigrams,
    )
    key = (
        F.round(F.col("logw_micro").cast("double") / F.lit(float(temperature)), 0)
        .cast("long")
        + gumbel_micro(F.col(id_col), seed)
    )
    return (
        w.withColumn("key_micro", key)
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(int(k))
    )


def save_dsir_model(model: DataFrame, path: str) -> None:
    """Persist a `dsir_model`/`dsir_model_from_counts` frame WITH its
    (n_buckets, alpha) coupling: the model rows go to ``path/model``
    and the parameters to a 1-row ``path/params`` table (parquet both
    — engine-portable, object-store-safe; no driver-local files). The
    DSIR model schema can't embed parameters in-band the way the
    classifier's does (consumers SUM over ct/cr — a reserved row would
    poison the totals), so the sidecar is the safe store shape.
    Raises if the frame carries no tag (an untagged frame has no
    authoritative parameters to persist — rebuild it via dsir_model)."""
    tag = getattr(model, "_dsir_params", None)
    if tag is None:
        raise ValueError(
            "model carries no (n_buckets, alpha) tag — persist only "
            "frames built by dsir_model/dsir_model_from_counts in this "
            "process, or rebuild via dsir_model_from_counts"
        )
    spark = model.sparkSession
    # single-file layout for both tables (guide §6): the model is
    # bounded at n_buckets rows and params at 1 — letting the writer
    # fan them across the frame's partitioning just multiplies file
    # opens on every reload (repartition, not coalesce: coalesce(1)
    # inherits merged locality prefs and stalls on spark.locality.wait)
    model.repartition(1).write.mode("overwrite").parquet(f"{path}/model")
    spark.createDataFrame(
        [(int(tag[0]), float(tag[1]))], "n_buckets long, alpha double"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/params")


def load_dsir_model(spark, path: str) -> DataFrame:
    """Reload a model saved by `save_dsir_model`, RE-TAGGED — so
    `dsir_importance`/`dsir_resample` keep validating the
    unseen-bucket-floor coupling across the store boundary (a bare
    ``spark.read.parquet`` loses the tag and silently shifts the
    coupling burden to the caller; that documented escape hatch still
    exists, this is the safe default path)."""
    prow = spark.read.parquet(f"{path}/params").collect()[0]
    model = spark.read.parquet(f"{path}/model")
    model._dsir_params = (int(prow["n_buckets"]), float(prow["alpha"]))  # type: ignore[attr-defined]
    return model
