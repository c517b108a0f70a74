"""Stage-boundary materialization for composed pipelines.

Multi-stage curation pipelines (quality filter -> dedup -> semantic
dedup -> DSIR; classifier GD iterations) cut lineage at every stage
boundary: downstream stages fan the survivor set into several branches,
and without a cut each branch re-executes the whole upstream chain
(measured 10x re-run on `pipeline_select_mix` at sf0.1).

Two cut flavors, one knob:

- default (`checkpoint_dir=None`): `localCheckpoint` — blocks live in
  executor memory/disk. Fastest, but lost on executor death; at
  cluster scale a lost executor replays every stage upstream of the
  cut. The right choice for interactive/single-box runs.
- `checkpoint_dir=<HDFS/S3 path>`: RELIABLE checkpoint — the stage
  materializes to shared storage, so a failed executor recomputes
  nothing upstream. This is how a production pipeline persists
  survivor sets between stages (the reference's materialized rollup
  discipline, README.md:73-116, applied to dataflow stages). Same
  values either way — the cut is a materialization point, never a
  semantic change.

`connected_components` (operators/dedup.py) pioneered this plumbing
for its per-round loop state; this module is the same contract for
straight-line stage boundaries, shared by `lr_train` and the flagship
suite pipelines (`pipeline_select_mix`, `pipeline_select_recipe`,
`pipeline_deliver_dataset`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stage_cut(df: DataFrame, checkpoint_dir: "str | None" = None) -> DataFrame:
    """Materialize `df` as a pipeline stage boundary.

    Default: lazy `localCheckpoint` — the first downstream action
    materializes the blocks executor-locally; zero extra jobs.

    With `checkpoint_dir`: reliable `checkpoint`. Spark writes reliable
    checkpoint files in a SEPARATE job after a materializing action, so
    the frame is persisted first — the write job reads the cache
    instead of recomputing the stage — and unpersisted once the
    checkpoint files back it (the `connected_components` recipe,
    condensed for a one-shot cut).

    NOTE: `setCheckpointDir` mutates SparkContext-global state; any
    other reliable-checkpoint user on the session sees this dir.

    LIFETIME: reliable checkpoint files are the recovery state — Spark
    leaves them on disk for the application's lifetime unless the
    session was built with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (GC-
    driven removal once the DataFrame is unreachable). Iterative
    callers (`lr_train`, `train_bpe`) write one file set per cut;
    budget the checkpoint dir for iterations x state size, or enable
    the cleaner / clean the dir after the job — superseded iteration
    state is dead weight the moment the next cut lands.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=False)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    cached = df.persist()
    out = cached.checkpoint(eager=True)
    cached.unpersist()
    return out
