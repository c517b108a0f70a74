"""postgresql_topn_spark — a PySpark-native engine with the query and
data-processing capabilities of citusdata/postgresql-topn.

The reference (/root/reference, postgresql-topn v2.7.0) adds to PostgreSQL:
one sketch encoding (JSONB map item->count), three scalar functions
(`topn`, `topn_add`, `topn_union`), two aggregates (`topn_add_agg`,
`topn_union_agg`), one `+` operator, the `topn_record` composite type and
the `topn.number_of_counters` GUC (see SURVEY.md §2, topn.c:89-97).

This package re-expresses that surface Spark-first:

- Tier 1 ("composition", default): every operator is built from native
  Catalyst expressions + DataFrame transformations (groupBy / window /
  map_* higher-order functions). Exact whenever distinct items fit the
  counter budget (which is also when the reference is exact), and fully
  shuffle-parallel with partial aggregation, AQE and whole-stage codegen
  for free.
- Tier 2 ("sketch", opt-in): bounded-memory space-saving-style state with
  the reference's prune policies (topn.c:440-446, 869-908) via
  applyInPandas, for huge-cardinality groups.

Beyond the reference surface, the package carries a full large-scale
training-data-pipeline toolkit: deduplication (exact with quality-aware
keepers, shingle/char-gram Jaccard, MinHash+LSH, SimHash, winnowing,
embedding near-dup, transitive clustering, train/test decontamination,
Bloom incremental prescreens), similarity search (brute force, banded
LSH + multi-probe, IVF, IVF-PQ with ADC + exact rerank), six mergeable
sketch families sharing one rollup algebra (topn, HLL, KMV with set
intersections, Count-Min, Bloom, KLL — grouped rollups, sliding-window
folds, streaming sinks), text analysis (language-ID, quality,
repetition, PII scrub, unigram/bigram LM scoring, BM25/TF-IDF search,
BPE training), exact two-pass heavy hitters, sampling/mixing
(deterministic Bernoulli/stratified/temperature/weighted), chunking +
context packing, sessionization + rate anomaly detection, dataset
profiling, multimodal decode plumbing, and sources/sinks (sharded
JSONL with manifests, bucketed tables, partitioned rollups,
compaction). See PIPELINE.md for the end-to-end composition and
STATUS.md for the operator-by-operator map.
"""

from postgresql_topn_spark.conf import number_of_counters, set_number_of_counters
from postgresql_topn_spark.functions.sketch import (
    SKETCH_TYPE,
    TOPN_RECORD_TYPE,
    normalize_item,
    sketch_entries,
    topn_entries,
    explode_topn,
    topn_add,
    topn_union,
    topn_plus,
    SketchColumn,
    sketch_diff,
    merge_sketches,
    prune_sketch,
    empty_sketch,
    sketch_to_json,
    sketch_from_json,
)
from postgresql_topn_spark.functions.aggregates import (
    topn_add_agg,
    topn_union_agg,
    topn_union_over_window,
    topn_weighted_agg,
)

__all__ = [
    "number_of_counters",
    "set_number_of_counters",
    "SKETCH_TYPE",
    "TOPN_RECORD_TYPE",
    "normalize_item",
    "sketch_entries",
    "topn_entries",
    "explode_topn",
    "topn_add",
    "topn_union",
    "topn_plus",
    "SketchColumn",
    "sketch_diff",
    "merge_sketches",
    "prune_sketch",
    "empty_sketch",
    "sketch_to_json",
    "sketch_from_json",
    "topn_add_agg",
    "topn_union_agg",
    "topn_union_over_window",
    "topn_weighted_agg",
]

__version__ = "0.1.0"
