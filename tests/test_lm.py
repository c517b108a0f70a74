"""Unigram LM scoring: self-scoring exactness, external-model OOV
floors, fixed-point determinism."""

import math

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.lm import (
    unigram_logprob_scores,
    unigram_model,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the the the"),
        (3, "dog ran"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_self_scoring_matches_hand_computation(corpus):
    # token counts: the=4, cat=1, sat=1, dog=1, ran=1; total=8
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob_scores(corpus, "doc_id", "text").collect()
    }
    lp = {t: round((math.log(c) - math.log(8)) * 1e6) for t, c in
          {"the": 4, "cat": 1, "sat": 1, "dog": 1, "ran": 1}.items()}
    exp2 = round(3 * lp["the"] / (3 * 1e6), 6)
    assert got[2] == (3, exp2)
    exp3 = round((lp["dog"] + lp["ran"]) / (2 * 1e6), 6)
    assert got[3] == (2, exp3)


def test_external_model_oov_floor_below_rarest(spark, corpus):
    model = unigram_model(corpus, "text")
    new = spark.createDataFrame(
        [(10, "the cat"), (11, "zzz qqq")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob_scores(
            new, "doc_id", "text", model=model
        ).collect()
    }
    rarest = (math.log(1) - math.log(8)) * 1e6
    # all-OOV doc scores exactly 1e6 micro-nats below the rarest token
    assert got[11] == round((rarest - 1e6) / 1e6, 6)
    assert got[11] < got[10]


def test_external_model_explicit_oov(spark, corpus):
    model = unigram_model(corpus, "text")
    new = spark.createDataFrame([(20, "zzz")], "doc_id long, text string")
    got = unigram_logprob_scores(
        new, "doc_id", "text", model=model, oov_lp_micro=-7_000_000
    ).collect()[0]
    assert got["avg_logprob"] == -7.0


def test_blank_and_whitespace_tokens_dropped(spark):
    df = spark.createDataFrame(
        [(1, "  a   b  "), (2, "a")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_logprob_scores(df, "doc_id", "text").collect()
    }
    assert got == {1: 2, 2: 1}
