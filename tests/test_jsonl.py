"""Sharded JSONL corpus sink/source: deterministic shard membership,
manifest integrity verification, round-trip fidelity."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.sources.jsonl import (
    read_jsonl_corpus,
    write_jsonl_corpus,
)

SCHEMA = "doc_id long, text string, lang string"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"text {i} body", ["en", "de"][i % 2]) for i in range(200)],
        SCHEMA,
    )


def test_round_trip_and_manifest(spark, corpus, tmp_path):
    path = str(tmp_path / "corpus")
    manifest = write_jsonl_corpus(corpus, path, n_shards=8)
    assert manifest["total_rows"] == 200
    assert sum(s["rows"] for s in manifest["shards"].values()) == 200
    assert os.path.exists(os.path.join(path, "_corpus_manifest.json"))
    back = read_jsonl_corpus(spark, path, SCHEMA, verify_manifest=True)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, corpus.collect())
    )


def test_shard_membership_partition_invariant(spark, corpus, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl_corpus(corpus, p1, n_shards=8)
    write_jsonl_corpus(corpus.repartition(13), p2, n_shards=8)

    def members(path):
        out = {}
        for d in glob.glob(os.path.join(path, "__shard=*")):
            shard = int(d.rsplit("=", 1)[1])
            df = (
                corpus.sparkSession.read.schema(SCHEMA).json(os.path.join(d, "*.json"))
            )
            out[shard] = sorted(r["doc_id"] for r in df.collect())
        return out

    assert members(p1) == members(p2)


def test_one_file_per_shard(spark, corpus, tmp_path):
    path = str(tmp_path / "corpus")
    write_jsonl_corpus(corpus, path, n_shards=4)
    for d in glob.glob(os.path.join(path, "__shard=*")):
        files = [f for f in os.listdir(d) if f.endswith(".json")]
        assert len(files) == 1, d


def test_manifest_verification_catches_tampering(spark, corpus, tmp_path):
    path = str(tmp_path / "corpus")
    write_jsonl_corpus(corpus, path, n_shards=4)
    # tamper: append a rogue line to one shard file (drop Hadoop's
    # local-FS .crc sidecar first — object stores have none, and we
    # want OUR manifest, not the transport layer, to catch this)
    victim = glob.glob(os.path.join(path, "__shard=*", "*.json"))[0]
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    with open(victim, "a") as f:
        f.write('{"doc_id":99999,"text":"injected","lang":"xx"}\n')
    with pytest.raises(ValueError, match="manifest verification"):
        read_jsonl_corpus(spark, path, SCHEMA, verify_manifest=True)


def test_rejects_bad_shards(corpus, tmp_path):
    with pytest.raises(ValueError):
        write_jsonl_corpus(corpus, str(tmp_path / "x"), n_shards=0)
