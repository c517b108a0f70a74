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


def _detach_crc(victim):
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)


def test_manifest_catches_duplicate_multiplicity_swap(spark, corpus, tmp_path):
    """ADVICE r3: BIT_XOR alone cancels on even multiplicity — swapping a
    duplicate PAIR of lines for a duplicate pair of different lines kept
    row count and XOR digest identical. The modular-sum component must
    catch it."""
    dup = spark.createDataFrame(
        [(1, "aaaa", "en"), (1, "aaaa", "en"), (2, "bbbb", "en")],
        "doc_id bigint, text string, lang string",
    )
    path = str(tmp_path / "dupcorpus")
    write_jsonl_corpus(dup, path, n_shards=1)
    victim = glob.glob(os.path.join(path, "__shard=*", "*.json"))[0]
    _detach_crc(victim)
    with open(victim) as f:
        lines = f.readlines()
    a_line = next(ln for ln in lines if '"aaaa"' in ln)
    b_line = next(ln for ln in lines if '"bbbb"' in ln)
    # the duplicate pair of a-lines becomes a duplicate pair of b-lines:
    # same row count, same BIT_XOR (h(a)^h(a) = 0 = h(b)^h(b))
    tampered = [b_line if ln == a_line else ln for ln in lines]
    assert tampered != lines
    with open(victim, "w") as f:
        f.writelines(tampered)
    with pytest.raises(ValueError, match="manifest verification"):
        read_jsonl_corpus(
            spark,
            path,
            "doc_id bigint, text string, lang string",
            verify_manifest=True,
        )


def test_pre_sum_manifest_still_verifies(spark, corpus, tmp_path):
    """An r3-era manifest (no checksum_sum keys) must still verify on the
    rows+XOR components instead of failing on the missing field."""
    import json as _json

    path = str(tmp_path / "legacy")
    write_jsonl_corpus(corpus, path, n_shards=4)
    mpath = os.path.join(path, "_corpus_manifest.json")
    with open(mpath) as f:
        manifest = _json.load(f)
    for shard in manifest["shards"].values():
        shard.pop("checksum_sum")
    with open(mpath, "w") as f:
        _json.dump(manifest, f)
    read_jsonl_corpus(spark, path, SCHEMA, verify_manifest=True)


def test_round_trip_hostile_strings(spark, tmp_path):
    """Escaping fidelity under randomized hostile text: JSON
    metacharacters, backslash runs, newlines/tabs/CR inside values
    (JSONL is line-framed — an unescaped newline would split a record),
    control chars, astral-plane and combining unicode, JSON-lookalike
    payloads, empty strings, and NULLs. The roundtrip must return the
    exact multiset."""
    import random

    rng = random.Random(31415)
    atoms = [
        '"', "\\", "\\\\", '\\"', "\n", "\r", "\t", "\x01", "\x1f",
        "😀", "é", "ß", "'", "{", "}", "[", "]", ",", ":",
        '{"a": 1}', "null", "true", "-- comment", "line1\nline2",
        " ", " ",  # JS line separators, classic JSONL trap
    ]
    def hostile():
        return "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 12)))
    rows = [(i, hostile(), "xx") for i in range(150)]
    rows += [(900, None, "xx"), (901, "", "xx"), (902, " \t ", "xx")]
    corpus = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "hostile")
    write_jsonl_corpus(corpus, path, n_shards=4)
    back = read_jsonl_corpus(
        spark, path, schema=SCHEMA, verify_manifest=True
    )
    got = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in back.collect()
    )
    assert got == sorted(rows)
