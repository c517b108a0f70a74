"""Smoke pins for the janitor CLI (VERDICT r10 item 8): both
subcommands drive the real library operators and print one JSON line."""

import json
import os

from pyspark.sql import functions as F


def _run(capsys, spark, argv):
    from postgresql_topn_spark.maintenance import main

    assert main(argv, spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_sweep_subcommand(spark, tmp_path, capsys):
    from postgresql_topn_spark.operators.checkpointing import (
        cut_path,
        stage_cut,
    )

    d = str(tmp_path / "ck")
    orphan = cut_path(stage_cut(spark.range(5), d))
    for f in os.listdir(orphan):
        os.utime(os.path.join(orphan, f), (1000, 1000))
    live = cut_path(stage_cut(spark.range(3), d))

    rep = _run(capsys, spark, ["sweep", "--dir", d, "--age", "3600",
                               "--dry-run"])
    assert rep["cmd"] == "sweep" and rep["dry_run"] is True
    assert rep["n_swept"] == 1 and os.path.isdir(orphan)

    rep = _run(capsys, spark, ["sweep", "--dir", d, "--age", "3600"])
    assert rep["n_swept"] == 1
    assert not os.path.exists(orphan) and os.path.isdir(live)


def test_compact_subcommand(spark, tmp_path, capsys):
    d = str(tmp_path / "frag")
    spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).repartition(16).write.parquet(d)
    n_before = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_before == 16

    rep = _run(capsys, spark, ["compact", "--dir", d, "--target-mb", "64"])
    assert rep["cmd"] == "compact" and rep["n_files"] >= 1
    n_after = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_after == rep["n_files"] < n_before
    assert spark.read.parquet(d).count() == 2000


def test_session_ownership(spark, tmp_path, capsys):
    """An injected session is NOT stopped by the CLI."""
    _run(capsys, spark, ["sweep", "--dir", str(tmp_path / "none")])
    assert spark.range(1).count() == 1


def test_compact_rollup_subcommand(spark, sf_dir, tmp_path, capsys):
    from pyspark.sql import functions as F2

    from postgresql_topn_spark.functions.aggregates import topn_union_agg
    from postgresql_topn_spark.sources.rollup import (
        read_topn_rollup,
        write_topn_rollup,
    )
    from postgresql_topn_spark.sources.tables import load_table

    path = str(tmp_path / "rollup")
    ev = load_table(spark, sf_dir, "events")
    for i in range(2):
        write_topn_rollup(
            ev,
            path,
            F2.to_date("ts"),
            "event_type",
            counters=1_000_000,
            mode="append" if i else "overwrite",
        )

    def merged():
        r = read_topn_rollup(spark, path)
        m = topn_union_agg(r, ["bucket"], "topn", counters=1_000_000)
        return {str(x["bucket"]): dict(x["topn"]) for x in m.collect()}

    before = merged()
    raw_before = spark.read.parquet(path).count()
    rep = _run(
        capsys,
        spark,
        ["compact-rollup", "--dir", path, "--counters", "1000000"],
    )
    assert rep["cmd"] == "compact-rollup"
    assert rep["n_rows"] == raw_before // 2
    assert merged() == before  # readers see identical merged sketches
