"""Regression pins for the round-3 code-review findings: each test
reproduces the pre-fix failure shape."""

import pytest
from pyspark.sql import functions as F


def test_exact_dedup_quality_with_string_ids(spark):
    """String id columns must work in the quality path exactly as in
    the default path (pre-fix: ANSI cast crash / numeric reordering)."""
    from postgresql_topn_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [("doc10", "A", 1.0), ("doc2", "A", 1.0), ("doc3", "A", 9.0)],
        "doc_id string, k string, q double",
    )
    got = exact_dedup(df, "k", "doc_id", quality="q").collect()[0]
    assert got["keeper_id"] == "doc3"
    # tie on quality -> lexicographic min id, same as the default path
    df2 = spark.createDataFrame(
        [("doc10", "B", 1.0), ("doc2", "B", 1.0)],
        "doc_id string, k string, q double",
    )
    assert (
        exact_dedup(df2, "k", "doc_id", quality="q").collect()[0]["keeper_id"]
        == "doc10"  # string ordering: "doc10" < "doc2"
    )


def test_union_rollups_tolerate_all_null_groups(spark):
    """A group whose sketch column is entirely NULL (outer joins onto
    rollup tables) must merge to NULL, not crash the job."""
    from postgresql_topn_spark.functions.bloom import bloom_union_rollup
    from postgresql_topn_spark.functions.cms import cms_union_rollup
    from postgresql_topn_spark.functions.quantiles import kll_union_rollup

    df = spark.createDataFrame(
        [(1, None), (1, None)],
        "g int, sk array<bigint>",
    )
    for roll in (cms_union_rollup, bloom_union_rollup):
        out = roll(df, ["g"], "sk").collect()
        assert out[0]["sk"] is None
    dfb = spark.createDataFrame([(1, None)], "g int, sk binary")
    assert kll_union_rollup(dfb, ["g"], "sk").collect()[0]["sk"] is None


def test_temperature_mix_null_strata_do_not_deflate_rates(spark):
    """NULL-strata rows are excluded outright: they cannot join a rate
    row, so they must not inflate the normalizer either (pre-fix: a
    50% NULL population halved every real stratum's sample)."""
    from postgresql_topn_spark.operators.sampling import temperature_mix

    rows = [(i, "a") for i in range(100)] + [(i + 100, None) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(
        df, "source", "doc_id", temperature=1.0, target_rows=100, seed=3
    )
    n = out.count()
    assert out.where(F.col("source").isNull()).count() == 0
    assert n >= 85  # ~100 expected from stratum 'a'; pre-fix ~50


def test_auto_lsh_params_extreme_threshold_no_crash():
    from postgresql_topn_spark.operators.similarity import auto_lsh_params

    tables, planes = auto_lsh_params(10**9, -0.9)
    assert tables >= 1 and planes >= 1


def test_chunk_documents_tab_newline_whitespace(spark):
    """Leading tabs/newlines must not create a phantom empty token
    (offsets shifted, inflated n_tok), and tab/newline-only docs must
    yield zero chunks like space-only ones."""
    from postgresql_topn_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "\thello world"), (2, "\n\t"), (3, "a\n\nb")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_len=10, overlap=0)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tok"] == 2 and rows[1]["chunk"] == "hello world"
    assert 2 not in rows
    assert rows[3]["chunk"] == "a b"


def test_resize_pixels_bad_decoder_row_yields_null(spark):
    """A decoder returning inconsistent dims must produce a NULL row,
    not kill the scan."""
    from postgresql_topn_spark.operators.multimodal import (
        decode_image_pixels,
        resize_pixels,
    )

    def bad_decoder(buf):
        return (4, 4, 3, [1, 2, 3])  # claims 4x4x3 but gives 3 values

    blobs = spark.createDataFrame(
        [(0, bytearray(b"\x89PNGxxxx")), (1, bytearray(b"P5 2 1 255\n\x00\x07"))],
        "doc_id long, blob binary",
    )
    decoded = decode_image_pixels(blobs, decoder=bad_decoder)
    out = {r["doc_id"]: r["pixels"] for r in resize_pixels(decoded, 1, 1).collect()}
    assert out[0] is None
    assert out[1] == [7]  # the valid NetPBM row still resizes


def test_compact_parquet_partitioned_no_file_explosion(spark, tmp_path):
    from postgresql_topn_spark.sources.maintenance import compact_parquet
    import glob
    import os

    path = str(tmp_path / "pt")
    spark.range(10_000).select(
        (F.col("id") % 5).alias("p"), F.col("id")
    ).repartition(16).write.partitionBy("p").parquet(path)
    before = len(glob.glob(os.path.join(path, "p=*", "*.parquet")))
    assert before >= 40
    compact_parquet(spark, path, target_file_mb=64, partition_by=("p",))
    after = len(glob.glob(os.path.join(path, "p=*", "*.parquet")))
    assert after <= 5  # ~one file per partition value
    assert spark.read.parquet(path).count() == 10_000
