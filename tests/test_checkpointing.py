"""Reliable stage-boundary checkpoints (VERDICT r7 item 2).

The flagship pipelines and `lr_train` cut lineage at every stage
boundary; by default with executor-local blocks (`localCheckpoint`),
optionally — `checkpoint_dir=...` — with RELIABLE checkpoints on
shared storage that survive executor loss. A materialization point
must never change values: these pins collect both modes and require
identical output, row for row.
"""

import pytest
from pyspark.sql import functions as F


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


class TestStageCut:
    def test_identity_and_files_written(self, spark, tmp_path):
        from postgresql_topn_spark.operators.checkpointing import stage_cut

        df = spark.range(100).select(
            F.col("id"), (F.col("id") * 3 % 7).alias("v")
        )
        base = _rows(df, "id")
        assert _rows(stage_cut(df), "id") == base
        ckdir = str(tmp_path / "ck")
        out = stage_cut(df, ckdir)
        assert _rows(out, "id") == base
        # reliable mode actually wrote checkpoint files
        import os

        found = [
            f
            for root, _dirs, files in os.walk(ckdir)
            for f in files
        ]
        assert found, "reliable stage_cut wrote no checkpoint files"

    def test_no_lingering_cache(self, spark, tmp_path):
        from postgresql_topn_spark.operators.checkpointing import stage_cut

        df = spark.range(50)
        out = stage_cut(df, str(tmp_path / "ck2"))
        out.count()
        # the reliable cut never touches the input's cache state
        assert not df.storageLevel.useMemory

    def test_caller_cache_survives(self, spark, tmp_path):
        """ADVICE r8: the old persist/unpersist staging dropped a cache
        the CALLER had placed on df (and raised on non-default levels).
        The parquet cut must leave the caller's storage level alone."""
        from pyspark import StorageLevel

        from postgresql_topn_spark.operators.checkpointing import stage_cut

        df = spark.range(40).select(F.col("id"), (F.col("id") % 5).alias("v"))
        df.persist(StorageLevel.DISK_ONLY)
        try:
            df.count()
            out = stage_cut(df, str(tmp_path / "ck3"))
            assert _rows(out, "id") == _rows(df, "id")
            assert df.storageLevel.useDisk  # still cached, same level
        finally:
            df.unpersist()

    def test_no_global_checkpoint_dir_and_no_interleave(
        self, spark, tmp_path
    ):
        """VERDICT r8 item 3: the reliable cut must not mutate the
        SparkContext-global checkpoint dir, and two pipelines cutting
        into different dirs must each land in their own dir."""
        import os

        from postgresql_topn_spark.operators.checkpointing import (
            cut_path,
            stage_cut,
        )

        before = spark.sparkContext._jsc.sc().getCheckpointDir()
        d1, d2 = str(tmp_path / "pipe_a"), str(tmp_path / "pipe_b")
        a = stage_cut(spark.range(10), d1)
        b = stage_cut(spark.range(20), d2)
        assert a.count() == 10 and b.count() == 20
        after = spark.sparkContext._jsc.sc().getCheckpointDir()
        assert str(before) == str(after)  # global state untouched
        assert cut_path(a).startswith(d1) and cut_path(b).startswith(d2)
        assert os.listdir(d1) and os.listdir(d2)

    def test_release_and_supersedes(self, spark, tmp_path):
        import os

        from postgresql_topn_spark.operators.checkpointing import (
            cut_path,
            release_cut,
            stage_cut,
        )

        d = str(tmp_path / "chain")
        c1 = stage_cut(spark.range(5), d)
        p1 = cut_path(c1)
        # superseding cut: new files written first, old dir deleted
        c2 = stage_cut(c1.select((F.col("id") + 1).alias("id")), d,
                       supersedes=c1)
        assert not os.path.exists(p1)
        assert sorted(r["id"] for r in c2.collect()) == [1, 2, 3, 4, 5]
        # release is idempotent-safe and no-ops on non-cut frames
        assert release_cut(spark, c2) is True
        assert release_cut(spark, c2) is False
        assert release_cut(spark, spark.range(3)) is False
        assert release_cut(spark, None) is False
        # localCheckpoint mode: supersedes is ignored, no cut_path
        lc = stage_cut(spark.range(4), None, supersedes=c2)
        assert cut_path(lc) is None and lc.count() == 4


def test_lr_train_dir_footprint_is_o1(spark, sf_dir, tmp_path):
    """Iterative reliable checkpointing keeps ONE live file set per
    loop variable: after lr_train(iters=3) only the final w and b cuts
    remain (the returned model reads them) — superseded iteration
    state and the training working set are released as the loop runs
    (VERDICT r8 item 3)."""
    import os

    from postgresql_topn_spark.operators.classifier import lr_train
    from postgresql_topn_spark.suite import load_table

    docs = load_table(spark, sf_dir, "documents")
    ckdir = str(tmp_path / "lr_o1")
    model = lr_train(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        n_buckets=64,
        iters=3,
        lr=1.0,
        checkpoint_dir=ckdir,
    )
    live = [d for d in os.listdir(ckdir) if d.startswith("cut-")]
    assert len(live) == 2, f"expected final w+b cuts only, got {live}"
    # and the model still reads cleanly from the surviving cuts
    assert model.count() > 0
    # ADVICE r9: the model exposes BOTH surviving cut paths so callers
    # can reclaim them after persisting the model elsewhere
    from postgresql_topn_spark.operators.checkpointing import release_cut

    paths = model._lr_cut_paths
    assert len(paths) == 2
    assert sorted(os.path.basename(p) for p in paths) == sorted(live)
    for p in paths:
        assert release_cut(spark, p) is True
    assert not [d for d in os.listdir(ckdir) if d.startswith("cut-")]


def test_lr_cut_paths_empty_in_local_mode(spark, sf_dir):
    from postgresql_topn_spark.operators.classifier import lr_train
    from postgresql_topn_spark.suite import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = lr_train(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        n_buckets=32,
        iters=1,
    )
    assert model._lr_cut_paths == ()


def test_sweep_cuts_reclaims_orphans(spark, tmp_path):
    """VERDICT r9 item 4: a pipeline killed between `stage_cut` and
    its `release_cut` strands cut-<uuid>/ dirs; `sweep_cuts` discovers
    and deletes the old ones while leaving young cuts and non-cut
    entries alone."""
    import os

    from postgresql_topn_spark.operators.checkpointing import (
        stage_cut,
        sweep_cuts,
    )

    d = str(tmp_path / "orphans")
    # simulate the failure: two cuts land, NOBODY releases them
    stage_cut(spark.range(5), d)
    stage_cut(spark.range(7), d)
    bystander = os.path.join(d, "not-a-cut")
    os.makedirs(bystander)
    # dry_run lists both orphans, deletes nothing
    listed = sweep_cuts(spark, d, older_than_s=0, dry_run=True)
    assert len(listed) == 2
    assert len([x for x in os.listdir(d) if x.startswith("cut-")]) == 2
    # young cuts survive a conservative threshold
    assert sweep_cuts(spark, d, older_than_s=3600) == []
    # the reap: both orphans deleted, bystander + dir intact
    swept = sweep_cuts(spark, d, older_than_s=0)
    assert swept == listed
    assert [x for x in os.listdir(d) if x.startswith("cut-")] == []
    assert os.path.isdir(bystander)
    # idempotent; missing dir is a no-op
    assert sweep_cuts(spark, d, older_than_s=0) == []
    assert sweep_cuts(spark, str(tmp_path / "missing"), older_than_s=0) == []


def test_sweep_cuts_ages_by_files_not_dir_mtime(spark, tmp_path):
    """ADVICE r10 / VERDICT r10 item 2: object stores synthesize
    directory markers with mtime 0 (or unrelated to the write time),
    so the age test must key on the newest FILE inside each cut, treat
    resolved-mtime-0 as age-unknown-skip, and only fall back to the
    dir mtime when the cut holds no files."""
    import os

    from postgresql_topn_spark.operators.checkpointing import (
        cut_path,
        stage_cut,
        sweep_cuts,
    )

    d = str(tmp_path / "s3ish")
    live = stage_cut(spark.range(5), d)
    live_dir = cut_path(live)
    # S3A-style: the directory entry claims epoch-0, files are fresh.
    # The old dir-mtime rule read this LIVE cut as infinitely old.
    os.utime(live_dir, (0, 0))
    assert sweep_cuts(spark, d, older_than_s=3600) == []
    assert os.path.isdir(live_dir)

    # converse: fresh dir entry, genuinely old files -> reaped
    stale = stage_cut(spark.range(3), d)
    stale_dir = cut_path(stale)
    for f in os.listdir(stale_dir):
        os.utime(os.path.join(stale_dir, f), (1000, 1000))
    os.utime(stale_dir, None)  # dir mtime = now
    swept = sweep_cuts(spark, d, older_than_s=3600)
    assert [p.removeprefix("file:") for p in swept] == [stale_dir]
    assert not os.path.exists(stale_dir) and os.path.isdir(live_dir)

    # empty cut dirs: mtime-0 is age-unknown (never deleted, even at
    # threshold 0); a real old mtime still falls back and reaps
    unknown = os.path.join(d, "cut-unknownage")
    os.makedirs(unknown)
    os.utime(unknown, (0, 0))
    oldempty = os.path.join(d, "cut-oldempty")
    os.makedirs(oldempty)
    os.utime(oldempty, (1000, 1000))
    swept = sweep_cuts(spark, d, older_than_s=3600)
    assert [p.removeprefix("file:") for p in swept] == [oldempty]
    assert os.path.isdir(unknown)
    assert [
        p.removeprefix("file:")
        for p in sweep_cuts(spark, d, older_than_s=0, dry_run=True)
    ] == [cut_path(live)]
    # live cut's files are young only relative to real thresholds


def test_sweep_cuts_recurses_into_subdirectories(spark, tmp_path):
    """ADVICE r11: a cut whose only direct children are SUBDIRECTORIES
    (partitioned write, stranded _temporary/ tree) must resolve its
    age from files at ANY depth. Under the old direct-children scan
    such cuts fell back to the dir marker mtime — 0/synthetic on S3A —
    and were skipped forever: a permanent storage leak."""
    import os

    from postgresql_topn_spark.operators.checkpointing import sweep_cuts

    d = str(tmp_path / "s3ish")
    # fresh nested file + epoch-0 markers everywhere: LIVE, never swept
    live = os.path.join(d, "cut-nested-live")
    os.makedirs(os.path.join(live, "_temporary", "0"))
    inner = os.path.join(live, "_temporary", "0", "part-00000")
    with open(inner, "w") as fh:
        fh.write("x")
    os.utime(live, (0, 0))
    os.utime(os.path.join(live, "_temporary"), (0, 0))
    assert sweep_cuts(spark, d, older_than_s=3600) == []
    assert os.path.isdir(live)

    # genuinely old nested file, fresh dir markers: reaped by file age
    stale = os.path.join(d, "cut-nested-stale")
    os.makedirs(os.path.join(stale, "k=1"))
    inner = os.path.join(stale, "k=1", "part-00000")
    with open(inner, "w") as fh:
        fh.write("x")
    os.utime(inner, (1000, 1000))
    swept = sweep_cuts(spark, d, older_than_s=3600)
    assert [p.removeprefix("file:") for p in swept] == [stale]
    assert not os.path.exists(stale) and os.path.isdir(live)


class TestLrTrainCheckpointed:
    def test_model_identical(self, spark, sf_dir, tmp_path):
        from postgresql_topn_spark.operators.classifier import lr_train
        from postgresql_topn_spark.suite import load_table

        docs = load_table(spark, sf_dir, "documents")
        kw = dict(n_buckets=64, iters=2, lr=1.0)
        m_local = lr_train(
            docs.where(F.col("lang") == "en"),
            docs.where(F.col("lang") != "en"),
            **kw,
        )
        m_ck = lr_train(
            docs.where(F.col("lang") == "en"),
            docs.where(F.col("lang") != "en"),
            checkpoint_dir=str(tmp_path / "lr_ck"),
            **kw,
        )
        assert _rows(m_local, "bucket") == _rows(m_ck, "bucket")


@pytest.mark.parametrize(
    "gate,order",
    [
        ("pipeline_curation", ["doc_id"]),
        ("pipeline_select_mix", ["doc_id"]),
        ("pipeline_select_recipe", ["doc_id"]),
        ("pipeline_deliver_dataset", ["doc_id", "chunk_idx"]),
        ("multimodal_semantic_dedup", ["doc_id"]),
    ],
)
def test_flagship_pipeline_checkpointed_identical(
    spark, sf_dir, tmp_path, gate, order
):
    from postgresql_topn_spark import suite

    fn = suite.QUERIES[gate]
    base = _rows(fn(spark, sf_dir), *order)
    ck = _rows(fn(spark, sf_dir, checkpoint_dir=str(tmp_path / gate)), *order)
    assert base == ck
    assert base, f"{gate} returned no rows at {sf_dir}"


def test_model_roundtrip_gate_matches_in_session_models(spark, sf_dir):
    """pipeline_model_roundtrip persists both model families to parquet
    and scores through the reloaded frames; the result must be
    row-identical to scoring with the in-session models (the gate's
    whole claim)."""
    from postgresql_topn_spark import suite
    from postgresql_topn_spark.operators.classifier import lr_score, lr_train
    from postgresql_topn_spark.operators.dsir import dsir_importance, dsir_model
    from pyspark.sql import functions as F2

    docs = suite.load_table(spark, sf_dir, "documents")
    lr_model = lr_train(
        docs.where(F2.col("lang") == "en"),
        docs.where(F2.col("lang") != "en"),
        n_buckets=512,
        iters=3,
        lr=1.0,
    )
    scored = lr_score(docs, lr_model, n_buckets=512)
    dm = dsir_model(docs, docs.where(F2.col("lang") == "en"), n_buckets=4096)
    w = dsir_importance(docs, dm, n_buckets=4096)
    expected = _rows(
        scored.join(w, "doc_id").select(
            "doc_id", "z_micro", "prob", "n_feats", "logw_micro"
        ),
        "doc_id",
    )
    got = _rows(
        suite.QUERIES["pipeline_model_roundtrip"](spark, sf_dir), "doc_id"
    )
    assert got == expected
    assert got


def test_deliver_dataset_ships_as_verifiable_jsonl(spark, sf_dir, tmp_path):
    """The step after the manifest: the deliver-dataset output ships
    through write_jsonl_corpus (sharded, manifest-checksummed) and a
    training run reads it back with verify_manifest=True — the full
    select -> chunk -> pack -> split -> SHIP lane, row-identical
    through the store boundary."""
    from postgresql_topn_spark import suite
    from postgresql_topn_spark.sources.jsonl import (
        read_jsonl_corpus,
        write_jsonl_corpus,
    )

    out = suite.QUERIES["pipeline_deliver_dataset"](spark, sf_dir)
    base = _rows(out, "doc_id", "chunk_idx")
    dest = str(tmp_path / "shards")
    manifest = write_jsonl_corpus(
        out.withColumn(
            "chunk_id",
            out["doc_id"] * 1048576 + out["chunk_idx"],
        ),
        dest,
        shard_key="chunk_id",
        n_shards=4,
    )
    assert manifest["total_rows"] == len(base)
    back = read_jsonl_corpus(
        spark,
        dest,
        schema=(
            "doc_id bigint, chunk_idx int, n_tok bigint, "
            "start_offset bigint, first_bin bigint, last_bin bigint, "
            "split string, chunk_id bigint"
        ),
        verify_manifest=True,
    )
    got = [
        tuple(r)
        for r in back.select(
            "doc_id",
            "chunk_idx",
            "n_tok",
            "start_offset",
            "first_bin",
            "last_bin",
            "split",
        )
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ]
    assert got == base
