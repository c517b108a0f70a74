"""Sliding-window chunking: coverage/overlap law, edge docs, plan
shape."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.packing import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(25))),  # 25 tokens
        (2, "only four small tokens"),
        (3, ""),  # empty -> zero chunks
        (4, "   "),  # whitespace-only -> zero chunks
        (5, "single"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_bounds_and_overlap(docs):
    out = chunk_documents(docs, "doc_id", "text", chunk_len=10, overlap=3)
    rows = sorted(
        [r for r in out.collect() if r["doc_id"] == 1],
        key=lambda r: r["chunk_idx"],
    )
    # stride 7 over 25 tokens -> starts 0,7,14,21
    assert [r["start_tok"] for r in rows] == [0, 7, 14, 21]
    assert [r["n_tok"] for r in rows] == [10, 10, 10, 4]
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        ta, tb = a["chunk"].split(" "), b["chunk"].split(" ")
        assert ta[-3:] == tb[:3]


def test_every_token_covered_exactly_once_ignoring_overlap(docs):
    out = chunk_documents(docs, "doc_id", "text", chunk_len=10, overlap=0)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).extend(r["chunk"].split(" "))
    assert got[1] == [f"t{i}" for i in range(25)]
    assert got[2] == ["only", "four", "small", "tokens"]
    assert got[5] == ["single"]
    assert 3 not in got and 4 not in got


def test_short_doc_single_chunk(docs):
    out = chunk_documents(docs, "doc_id", "text", chunk_len=256, overlap=32)
    rows = [r for r in out.collect() if r["doc_id"] == 2]
    assert len(rows) == 1
    assert rows[0]["n_tok"] == 4 and rows[0]["chunk_idx"] == 0


def test_no_shuffle(spark, docs):
    from postgresql_topn_spark.plans.audit import hash_shuffles, python_stages

    out = chunk_documents(docs, "doc_id", "text")
    assert hash_shuffles(out) == 0
    assert python_stages(out) == 0


def test_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_len=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_len=10, overlap=10)


def test_no_subset_final_chunk(spark):
    """Review pin: a document whose length lands in
    (k*stride, k*stride + overlap] used to emit a final chunk that was
    a strict SUBSET of its predecessor — pure duplicated text. The
    start sequence now stops once the previous chunk reaches the end."""
    from postgresql_topn_spark.operators.packing import chunk_documents

    def doc(n):
        return " ".join(f"t{i}" for i in range(n))

    df = spark.createDataFrame(
        [(225, doc(225)), (300, doc(300)), (224, doc(224)), (449, doc(449)),
         (20, doc(20))],
        "doc_id bigint, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_len=256, overlap=32)
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # 225 tokens fit one 256-token chunk entirely: chunk at 224 would
    # be a subset; 300 needs two; 449: chunk@224 covers 224..448 (all)
    assert counts == {20: 1, 224: 1, 225: 1, 300: 2, 449: 2}
    # every token is still covered: last chunk end == doc length
    ends = {
        r["doc_id"]: r["end"]
        for r in out.groupBy("doc_id")
        .agg(F.max(F.col("start_tok") + F.col("n_tok")).alias("end"))
        .collect()
    }
    assert ends == {20: 20, 224: 224, 225: 225, 300: 300, 449: 449}


def test_pack_rejects_string_id_and_excludes_null_ids(spark):
    """Round-11 review: floor(id/width) on a string id yields NULL
    buckets and the prefix equi-join then silently returned an EMPTY
    packing; NULL ids vanished the same way. Non-numeric ids now fail
    loudly; NULL ids are excluded explicitly at the scan."""
    import pytest

    from postgresql_topn_spark.operators.packing import pack_token_stream

    sdf = spark.createDataFrame(
        [("a", 5), ("b", 3)], "doc_id string, n int"
    )
    with pytest.raises(TypeError, match="must be numeric"):
        pack_token_stream(sdf, "doc_id", "n")

    ndf = spark.createDataFrame(
        [(1, 5), (None, 99), (2, 3)], "doc_id long, n int"
    )
    rows = {
        r["doc_id"]: (r["start_offset"], r["n_tokens"])
        for r in pack_token_stream(ndf, "doc_id", "n").collect()
    }
    # the NULL-id row is excluded and does NOT shift anyone's offset
    assert rows == {1: (0, 5), 2: (5, 3)}
