"""Physical-plan audit helpers — the scale-readiness checks.

At 100 TB the difference between a good and a bad operator is visible
in the physical plan long before it is visible in a timing: a filter
that didn't reach the parquet scan, a shuffle that didn't need to
exist, a Python stage that crept into a hot path. These helpers turn
`.explain("formatted")` into assertable facts so tests can pin the
plan shape each operator was designed for (see tests/test_plans.py):

- `topn_add_agg` must shuffle exactly twice (count + rank) with a
  map-side partial aggregate before the first exchange;
- `cosine_topk` / `ivf_topk` must never shuffle the corpus — one
  Python stage, one tiny rank exchange;
- interval queries on partitioned rollups must show PartitionFilters;
- column pruning must reach ReadSchema.

The reference gets its equivalents from PostgreSQL (parallel append,
partial aggregation — CHANGELOG.md:20-23); here Catalyst supplies them
and these checks prove we didn't accidentally opt out.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def hash_shuffles(df: DataFrame) -> int:
    """Shuffles that repartition by key (hash/range/single) — excludes
    the round-robin repartition some operators add only to spread
    single-file local scans."""
    p = plan_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", p))


def broadcast_exchanges(df: DataFrame) -> int:
    return plan_str(df, "simple").count("BroadcastExchange")


def python_stages(df: DataFrame) -> int:
    """Python-execution nodes (ArrowEval / MapInPandas / grouped-map) —
    the operators' slow lane; tests pin the exact budgeted count."""
    p = plan_str(df, "simple")
    return sum(
        p.count(n)
        # "FlatMapGroupsInPandas" also matches the ...WithState node
        # (substring), and "MapInArrow" matches PythonMapInArrow — the
        # stateful/arrow Python lanes are counted, not double-counted
        for n in (
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas",
            "MapInArrow",
            "BatchEvalPython",
        )
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan ('' if none)."""
    # greedy to the line's last ']': an In(col, [v1,v2]) filter contains
    # brackets that a lazy [^\]]* capture would truncate at, silently
    # dropping every filter after it
    return " | ".join(re.findall(r"PushedFilters: \[(.*)\]", plan_str(df)))

def read_schema(df: DataFrame) -> str:
    """The ReadSchema section(s) — what the scan actually reads."""
    return " | ".join(re.findall(r"ReadSchema: ([^\n]*)", plan_str(df)))


def has_partial_aggregate(df: DataFrame) -> bool:
    """True if the plan contains a map-side partial aggregate (the
    reference's serialize/combine parallel-agg, free from Catalyst)."""
    return bool(re.search(r"partial_\w+", plan_str(df)))
