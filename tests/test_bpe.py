"""Distributed BPE training: hand-computed merge sequence, partition
invariance, encode consistency with training, edge discipline."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.bpe import EOW, bpe_encode, train_bpe


@pytest.fixture(scope="module")
def corpus(spark):
    # classic BPE toy corpus: low/lower/newest/widest with frequencies
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    return spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_hand_computed_merge_sequence(corpus):
    """First merges on the Sennrich toy corpus: 'es' (9 = 6+3), then
    'est' (9), then 'est</w>' (9), then 'lo' (7 = 5+2)."""
    merges = train_bpe(corpus, "text", n_merges=4)
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]


def test_partition_invariance(corpus):
    a = train_bpe(corpus, "text", n_merges=6)
    b = train_bpe(corpus.repartition(7), "text", n_merges=6)
    assert a == b


def test_encode_applies_learned_merges(spark, corpus):
    merges = train_bpe(corpus, "text", n_merges=4)
    out = bpe_encode(
        spark.createDataFrame(
            [(1, "lowest low"), (2, None)], "doc_id long, text string"
        ),
        merges,
    ).collect()
    got = {r["doc_id"]: r["bpe_tokens"] for r in out}
    # 'lowest' -> lo + w + est ; 'low' -> lo + w  (est</w> does not fire
    # mid-word; the est merge does)
    assert got[1] == ["lo", "w", "est", "lo", "w"]
    assert got[2] is None


def test_early_stop_when_pairs_exhaust(spark):
    tiny = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = train_bpe(tiny, "text", n_merges=50, min_pair_count=1)
    # 'ab' has pairs (a,b), (b,</w>): after enough merges one symbol
    # remains per word and training stops well before 50
    assert 0 < len(merges) <= 3


def test_rejects_bad_params(corpus):
    with pytest.raises(ValueError):
        train_bpe(corpus, "text", n_merges=0)
