"""Dedup operator invariants (exact, Jaccard, MinHash-LSH, SimHash)."""

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_table,
)


def docs_df(spark):
    base = "spark makes big data simple and fast for everyone today right now"
    near = base.replace("fast", "quick")  # one token differs
    other = "completely different content about databases and storage engines here"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, other),
        (5, "tiny"),  # < k tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestExactDedup:
    def test_groups_and_keepers(self, spark):
        out = {
            r["content_key"]: (r["keeper_id"], r["dup_count"])
            for r in exact_dedup(docs_df(spark), F.md5("text"), "doc_id").collect()
        }
        assert len(out) == 4  # 5 docs, one exact pair
        assert (1, 2) in out.values()  # keeper=1, count=2


class TestJaccard:
    def test_exact_dup_scores_one(self, spark):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs(docs_df(spark), "doc_id", "text", threshold=0.3).collect()
        }
        assert pairs[(1, 2)] == 1.0
        assert 0.3 <= pairs[(1, 3)] < 1.0  # near dup
        assert (1, 4) not in pairs

    def test_threshold_filters(self, spark):
        high = jaccard_pairs(docs_df(spark), "doc_id", "text", threshold=0.99).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in high} == {(1, 2)}

    def test_shingle_df_cap(self, spark):
        # capping ultra-frequent shingles must not add pairs
        base = jaccard_pairs(docs_df(spark), "doc_id", "text", threshold=0.3)
        capped = jaccard_pairs(
            docs_df(spark), "doc_id", "text", threshold=0.3, max_shingle_df=2
        )
        assert capped.count() <= base.count()


class TestMinhashLSH:
    def test_recall_on_planted_dups(self, spark, sf_dir):
        """LSH candidates + exact rerank must recover every pair the
        exact join finds at the same threshold (driver-planted near-dups
        have jaccard >= 0.9 where r=2,b=16 recall is ~1)."""
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
        }
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
        }
        assert lsh == exact

    def test_precision_is_exact(self, spark):
        out = minhash_lsh_pairs(docs_df(spark), "doc_id", "text", threshold=0.3).collect()
        for r in out:
            assert r["jaccard"] >= 0.3


class TestSimhash:
    def test_identical_docs_same_hash(self, spark):
        sh = {r["__id"]: r["__sh"] for r in simhash_table(docs_df(spark), "doc_id", "text").collect()}
        assert sh[1] == sh[2]

    def test_exact_dups_found_at_distance_zero(self, spark):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_pairs(docs_df(spark), "doc_id", "text", max_hamming=3).collect()
        }
        assert pairs.get((1, 2)) == 0

    def test_hamming_bound_respected(self, spark):
        for r in simhash_pairs(docs_df(spark), "doc_id", "text", max_hamming=3).collect():
            assert r["hamming"] <= 3

    def test_char_ngram_prefix_filter_exact(self, spark):
        """Prefix-filter candidates must lose NO qualifying pair: the
        char-ngram join equals a brute-force all-pairs gram Jaccard."""
        from itertools import combinations

        from postgresql_topn_spark.operators.dedup import (
            char_ngram_jaccard_pairs,
        )

        rows = docs_df(spark).collect()
        n, t = 8, 0.5

        def grams(s):
            return {s[i : i + n] for i in range(len(s) - n + 1)}

        expected = set()
        for (ia, ta), (ib, tb) in combinations(
            [(r["doc_id"], r["text"]) for r in rows], 2
        ):
            ga, gb = grams(ta), grams(tb)
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= t:
                expected.add((min(ia, ib), max(ia, ib)))
        got = {
            (r["doc_a"], r["doc_b"])
            for r in char_ngram_jaccard_pairs(
                docs_df(spark), "doc_id", "text", threshold=t, n=n
            ).collect()
        }
        assert got == expected

    def test_md5_form_same_invariants(self, spark):
        from postgresql_topn_spark.operators.dedup import (
            simhash_md5_pairs,
            simhash_md5_table,
        )

        sh = {
            r["__id"]: r["__sh"]
            for r in simhash_md5_table(docs_df(spark), "doc_id", "text").collect()
        }
        assert sh[1] == sh[2]
        assert all(0 <= v < (1 << 60) for v in sh.values())
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_md5_pairs(
                docs_df(spark), "doc_id", "text", max_hamming=3
            ).collect()
        }
        assert pairs.get((1, 2)) == 0
        assert all(h <= 3 for h in pairs.values())


class TestConnectedComponents:
    def test_transitive_chain_and_separate_clusters(self, spark):
        """a~b, b~c must land in ONE component even though (a,c) is not
        an edge; an unrelated pair forms its own; min id labels."""
        from postgresql_topn_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
        )
        out = {
            r["node"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_long_chain_converges(self, spark):
        """A path graph is the worst case for label propagation (diameter
        = n-1); the fixpoint must still be exact."""
        from postgresql_topn_spark.operators.dedup import connected_components

        n = 12
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "doc_a bigint, doc_b bigint"
        )
        out = {
            r["node"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert out == {i: 0 for i in range(n + 1)}

    def test_minhash_merge_law(self, spark):
        """Element-wise min-merge of per-doc signatures must equal the
        signature computed directly over the pooled text — the algebra
        that makes MinHash a mergeable rollup sketch. Identical sets
        estimate Jaccard 1.0; disjoint sets estimate ~0."""
        from postgresql_topn_spark.operators.dedup import (
            minhash_est_jaccard,
            minhash_signatures_md5,
            minhash_union_agg,
        )

        part1 = "alpha beta gamma delta epsilon zeta"
        part2 = "one two three four five six seven"
        df = spark.createDataFrame(
            [(1, "g", part1), (2, "g", part2)],
            "doc_id bigint, grp string, text string",
        )
        sigs = minhash_signatures_md5(df, "doc_id", "text")
        with_grp = sigs.join(
            df.select(F.col("doc_id").alias("__id"), "grp"), "__id"
        )
        merged = minhash_union_agg(with_grp, ["grp"], "__sig").collect()[0].sig
        # compare against the true shingle-set union: the two texts
        # re-labeled under one id (concatenating the strings instead
        # would add spurious boundary shingles)
        both = spark.createDataFrame(
            [(1, part1), (1, part2)], "doc_id bigint, text string"
        )
        direct = (
            minhash_signatures_md5(both, "doc_id", "text").collect()[0]["__sig"]
        )
        assert merged == direct
        # estimator sanity: identical sets -> 1.0, disjoint sets -> ~0
        trio = spark.createDataFrame(
            [(1, part1), (2, part1), (3, part2)],
            "doc_id bigint, text string",
        )
        by_id = {
            r["__id"]: r["__sig"]
            for r in minhash_signatures_md5(trio, "doc_id", "text").collect()
        }
        est = spark.createDataFrame(
            [(by_id[1], by_id[2], by_id[3])],
            "a array<bigint>, b array<bigint>, c array<bigint>",
        ).select(
            minhash_est_jaccard("a", "b").alias("same"),
            minhash_est_jaccard("a", "c").alias("diff"),
        ).collect()[0]
        assert est.same == 1.0
        assert est.diff <= 0.25  # 16 hashes; disjoint sets rarely agree

    def test_winnow_pairs(self, spark):
        """Docs sharing a verbatim token run must pair (winnowing
        guarantees a shared fingerprint per shared window); unrelated
        docs must not. Both hash forms agree on the pair set."""
        from postgresql_topn_spark.operators.dedup import (
            winnow_fingerprint_pairs,
        )

        shared_run = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [
                (1, shared_run + " one two three"),
                (2, "x y z " + shared_run),
                (3, "totally different words only here now friend"),
            ],
            "doc_id bigint, text string",
        )
        md5_pairs = {
            (r.doc_a, r.doc_b)
            for r in winnow_fingerprint_pairs(df, min_shared=2).collect()
        }
        assert (1, 2) in md5_pairs
        assert all(3 not in p for p in md5_pairs)
        xx_pairs = {
            (r.doc_a, r.doc_b)
            for r in winnow_fingerprint_pairs(
                df, min_shared=2, md5_form=False
            ).collect()
        }
        assert xx_pairs == md5_pairs
        # a df cap of 1 drops every fingerprint shared by 2 docs -> no pairs
        capped = winnow_fingerprint_pairs(df, min_shared=1, max_fp_df=1).count()
        assert capped == 0

    def test_decontaminate(self, spark):
        """A test doc leaking a k-shingle from train is flagged with the
        exact distinct-shingle overlap; clean docs are absent; the
        max_shingle_df cap drops boilerplate-only matches."""
        from postgresql_topn_spark.operators.dedup import decontaminate

        train = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                # boilerplate shingles shared by BOTH train docs 2 and 3
                (2, "common header common header common header"),
                (3, "common header common header footer"),
            ],
            "doc_id bigint, text string",
        )
        test = spark.createDataFrame(
            [
                # shares 'quick brown fox' and 'brown fox jumps' with 1
                (10, "a quick brown fox jumps away"),
                (11, "completely unrelated content here"),
                (12, "common header common header trailer"),
            ],
            "doc_id bigint, text string",
        )
        out = {
            (r.test_id, r.train_id): r.shared_shingles
            for r in decontaminate(train, test, k=3).collect()
        }
        assert out[(10, 1)] == 2
        assert (11, 1) not in out and (11, 2) not in out
        assert (12, 2) in out and (12, 3) in out
        # train-side document-frequency cap: the boilerplate shingles
        # occur in 2 train docs, so max_shingle_df=1 drops them from the
        # index — doc 12's matches vanish while doc 10's rare-shingle
        # match survives
        capped = {
            (r.test_id, r.train_id)
            for r in decontaminate(
                train, test, k=3, max_shingle_df=1
            ).collect()
        }
        assert (10, 1) in capped
        assert (12, 2) not in capped and (12, 3) not in capped

    def test_reliable_checkpoint_mode(self, spark, tmp_path):
        """checkpoint_dir switches rounds to reliable per-round parquet
        cuts: identical labels, no SparkContext-global checkpoint dir
        mutated, and the dir footprint is O(1) in rounds — after the
        call exactly ONE cut survives (the final labels, backing the
        returned frame); superseded rounds and the edge cut are
        released as the loop runs."""
        import os

        from postgresql_topn_spark.operators.checkpointing import (
            release_cut,
        )
        from postgresql_topn_spark.operators.dedup import connected_components

        # a 5-hop chain forces several propagation rounds
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
            "doc_a bigint, doc_b bigint",
        )
        ckpt = str(tmp_path / "cc_ckpt")
        before = spark.sparkContext._jsc.sc().getCheckpointDir()
        result = connected_components(edges, checkpoint_dir=ckpt)
        out = {r["node"]: r["component"] for r in result.collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}
        after = spark.sparkContext._jsc.sc().getCheckpointDir()
        assert str(before) == str(after)
        live = [d for d in os.listdir(ckpt) if d.startswith("cut-")]
        assert len(live) == 1, f"expected only the final labels cut: {live}"
        # the caller reclaims the last cut when done with the labels
        assert release_cut(spark, result) is True
        assert [d for d in os.listdir(ckpt) if d.startswith("cut-")] == []

    def test_cluster_labels_on_documents(self, spark):
        """End-to-end: jaccard edges over the toy corpus -> 1,2,3 share a
        component labeled 1; 4 and 5 are not in any edge."""
        from postgresql_topn_spark.operators.dedup import (
            connected_components,
            jaccard_pairs,
        )

        edges = jaccard_pairs(docs_df(spark), "doc_id", "text", threshold=0.3)
        out = {
            r["node"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1}


class TestEmptyInputs:
    def test_operators_tolerate_empty_relations(self, spark):
        """Every core operator must return an empty (not failing)
        result on empty input — the behavior a pipeline hits whenever a
        filter stage strips a partition's rows."""
        from postgresql_topn_spark.functions.aggregates import (
            topn_add_agg,
            topn_union_agg_global,
        )
        from postgresql_topn_spark.functions.sketch import explode_topn
        from postgresql_topn_spark.operators.dedup import (
            connected_components,
            jaccard_pairs,
            minhash_signatures_md5,
            winnow_fingerprint_pairs,
        )
        from postgresql_topn_spark.operators.similarity import cosine_topk

        empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
        empty_ev = spark.createDataFrame([], "g string, item string")
        empty_edges = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
        empty_vec = spark.createDataFrame(
            [], "vec_id bigint, embedding array<float>"
        )
        sk = topn_add_agg(empty_ev, ["g"], "item", counters=10)
        assert sk.count() == 0
        assert explode_topn(sk, "topn", 3, keep=["g"], counters=10).count() == 0
        assert topn_union_agg_global(sk, "topn", counters=10).count() == 0
        assert jaccard_pairs(empty_docs, "doc_id", "text", threshold=0.5).count() == 0
        assert connected_components(empty_edges).count() == 0
        assert winnow_fingerprint_pairs(empty_docs).count() == 0
        assert minhash_signatures_md5(empty_docs, "doc_id", "text").count() == 0
        assert cosine_topk(empty_vec, empty_vec).count() == 0


class TestBucketPairs:
    """Invariants of the chunked within-bucket pair generator: every
    unordered pair appears exactly once regardless of chunk width, and a
    hot bucket completes without the O(m^2)-bytes projection shape."""

    def test_pair_set_matches_brute_force(self, spark):
        from itertools import combinations

        from postgresql_topn_spark.operators.dedup import _bucket_pairs

        # bucket sizes straddling the chunk width: 1 (dropped), 2, 5
        # (multi-chunk at chunk=3), 11 (several chunks + remainder)
        rows = (
            [("a", 100)]
            + [("b", 200 + i) for i in range(2)]
            + [("c", 300 + i) for i in range(5)]
            + [("d", 400 + i) for i in range(11)]
        )
        df = spark.createDataFrame(rows, "k string, p bigint")
        for chunk in (1, 3, 4096):
            got = {
                tuple(sorted((r["__a"], r["__b"])))
                for r in _bucket_pairs(df, ["k"], "p", chunk=chunk).collect()
            }
            want = set()
            for key in ("b", "c", "d"):
                members = [p for kk, p in rows if kk == key]
                want |= {tuple(sorted(c)) for c in combinations(members, 2)}
            assert got == want, f"chunk={chunk}"
        # no duplicates either: count equals pair count
        n = _bucket_pairs(df, ["k"], "p", chunk=3).count()
        assert n == len(want)

    def test_hot_bucket_completes(self, spark):
        from postgresql_topn_spark.operators.dedup import _bucket_pairs

        m = 6000  # one hot bucket: 18M pairs; naive shape would push
        # m^2 = 36M array elements through the first projection
        df = spark.range(m).select(F.lit("hot").alias("k"), F.col("id").alias("p"))
        n = _bucket_pairs(df, ["k"], "p", chunk=512).count()
        assert n == m * (m - 1) // 2


class TestExactDedupQualityKeeper:
    def test_best_quality_wins_ties_min_id(self, spark):
        from postgresql_topn_spark.operators.dedup import exact_dedup

        rows = [
            # key A: id 3 has the best quality
            (1, "A", 5.0), (2, "A", 9.0), (3, "A", 11.0),
            # key B: tie on quality -> min id (4) wins
            (4, "B", 7.0), (5, "B", 7.0),
            # key C: NULL quality loses to any non-NULL
            (6, "C", None), (7, "C", 1.0),
            # key D: all NULL -> min id wins
            (8, "D", None), (9, "D", None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, k string, q double")
        got = {
            r["content_key"]: (r["keeper_id"], r["dup_count"])
            for r in exact_dedup(df, "k", "doc_id", quality="q").collect()
        }
        assert got == {"A": (3, 3), "B": (4, 2), "C": (7, 2), "D": (8, 2)}

    def test_default_policy_unchanged(self, spark):
        from postgresql_topn_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(5, "A"), (2, "A"), (9, "B")], "doc_id long, k string"
        )
        got = {
            r["content_key"]: r["keeper_id"]
            for r in exact_dedup(df, "k", "doc_id").collect()
        }
        assert got == {"A": 2, "B": 9}

    def test_single_shuffle_with_partial_combine(self, spark):
        from postgresql_topn_spark.operators.dedup import exact_dedup
        from postgresql_topn_spark.plans.audit import (
            has_partial_aggregate,
            hash_shuffles,
            python_stages,
        )

        df = spark.range(100).select(
            (F.col("id") % 7).cast("string").alias("k"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 13).alias("q"),
        )
        out = exact_dedup(df, "k", "doc_id", quality="q")
        assert hash_shuffles(out) == 1
        assert has_partial_aggregate(out)
        assert python_stages(out) == 0


class TestSubstringRuns:
    """substring_run_pairs: token-granular shared-run detection (Lee et
    al. 2022 ExactSubstr as relational algebra)."""

    def test_basic_run_and_offsets(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_run_pairs

        df = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j k l"),
                (2, "x y a b c d e f g h i j"),  # shares a..j at (1, 3)
                (3, "nothing in common at all"),
            ],
            "doc_id bigint, text string",
        )
        out = substring_run_pairs(
            df, "doc_id", "text", min_run_tokens=8, shingle_k=4
        ).collect()
        assert [tuple(r) for r in out] == [(1, 2, 1, 3, 10)]

    def test_two_disjoint_runs_stay_separate(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_run_pairs

        # two shared 5-token runs separated by different middles
        df = spark.createDataFrame(
            [
                (1, "p q r s t MID1 u v w x y"),
                (2, "p q r s t MID2 u v w x y"),
            ],
            "doc_id bigint, text string",
        )
        out = sorted(
            tuple(r)
            for r in substring_run_pairs(
                df, "doc_id", "text", min_run_tokens=5, shingle_k=4
            ).collect()
        )
        assert out == [(1, 2, 1, 1, 5), (1, 2, 7, 7, 5)]

    def test_intra_doc_repeat_makes_two_alignments(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_run_pairs

        # doc 2 contains the shared run twice -> two diagonals
        df = spark.createDataFrame(
            [
                (1, "a b c d e"),
                (2, "a b c d e SEP a b c d e"),
            ],
            "doc_id bigint, text string",
        )
        out = sorted(
            tuple(r)
            for r in substring_run_pairs(
                df, "doc_id", "text", min_run_tokens=5, shingle_k=5
            ).collect()
        )
        assert out == [(1, 2, 1, 1, 5), (1, 2, 1, 7, 5)]

    def test_short_docs_and_validation(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_run_pairs

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b")], "doc_id bigint, text string"
        )
        # docs shorter than k produce no shingles, no crash
        assert (
            substring_run_pairs(
                df, "doc_id", "text", min_run_tokens=4, shingle_k=4
            ).count()
            == 0
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="min_run_tokens"):
            substring_run_pairs(
                df, "doc_id", "text", min_run_tokens=3, shingle_k=4
            )

    def test_hot_gram_cap_bounds_candidates(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_run_pairs

        # the ubiquitous boilerplate run appears in every doc; capping
        # its grams removes those candidates entirely
        rows = [(i, "the same boiler plate line here") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        uncapped = substring_run_pairs(
            df, "doc_id", "text", min_run_tokens=6, shingle_k=4
        ).count()
        capped = substring_run_pairs(
            df,
            "doc_id",
            "text",
            min_run_tokens=6,
            shingle_k=4,
            max_shingle_df=5,
        ).count()
        assert uncapped == 45 and capped == 0

    def test_plan_all_jvm(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_run_pairs
        from postgresql_topn_spark.plans.audit import python_stages
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = substring_run_pairs(docs, "doc_id", "text")
        assert python_stages(out) == 0


class TestSubstringDedup:
    """substring_dedup: interval-union coverage + keep-earliest drop
    policy over substring_run_pairs (VERDICT r4 item 5)."""

    def _decide(self, spark, rows, **kw):
        from postgresql_topn_spark.operators.dedup import substring_dedup

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = substring_dedup(df, "doc_id", "text", **kw)
        return {
            r["doc_id"]: (
                r["n_tokens"],
                r["covered_tokens"],
                r["coverage"],
                r["keep"],
            )
            for r in out.collect()
        }

    def test_hand_computed_coverage_and_drop(self, spark):
        # doc 2 shares tokens 1..10 (its positions 3..12) with doc 1:
        # 10 of 12 tokens covered -> 0.8333 > theta=0.5 -> dropped.
        # doc 1 (earlier) owes nothing; doc 3 clean.
        rows = [
            (1, "a b c d e f g h i j k l"),
            (2, "x y a b c d e f g h i j"),
            (3, "nothing shared here at all among these tokens"),
        ]
        got = self._decide(
            spark, rows, min_run_tokens=8, shingle_k=4, theta=0.5
        )
        assert got[1] == (12, 0, 0.0, True)
        assert got[2] == (12, 10, 0.833333, False)
        assert got[3] == (8, 0, 0.0, True)

    def test_overlapping_runs_union_not_double_counted(self, spark):
        # doc 3 shares its WHOLE text with doc 1 AND with doc 2 (same
        # span): union coverage is 5 tokens, not 10
        rows = [
            (1, "a b c d e"),
            (2, "a b c d e extra tail tokens here"),
            (3, "a b c d e"),
        ]
        got = self._decide(
            spark, rows, min_run_tokens=5, shingle_k=5, theta=0.9
        )
        n, covered, coverage, keep = got[3]
        assert (n, covered, coverage) == (5, 5, 1.0)
        assert not keep  # 1.0 > 0.9
        # doc 2: shares its first 5 of 9 tokens with doc 1 only
        assert got[2] == (9, 5, 0.555556, True)
        # doc 1 is earliest: nothing owed
        assert got[1] == (5, 0, 0.0, True)

    def test_disjoint_runs_sum(self, spark):
        # two disjoint 5-token shared runs in a 11-token doc: 10 covered
        rows = [
            (1, "p q r s t MID1 u v w x y"),
            (2, "p q r s t MID2 u v w x y"),
        ]
        got = self._decide(
            spark, rows, min_run_tokens=5, shingle_k=4, theta=0.95
        )
        assert got[2] == (11, 10, 0.909091, True)  # 10/11 <= 0.95

    def test_theta_boundary_inclusive_keep(self, spark):
        # coverage exactly == theta keeps the doc (drop requires >)
        rows = [(1, "a b c d"), (2, "a b c d w x y z")]
        got = self._decide(
            spark, rows, min_run_tokens=4, shingle_k=4, theta=0.5
        )
        assert got[2] == (8, 4, 0.5, True)

    def test_theta_validation(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_dedup

        df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="theta"):
            substring_dedup(df, "doc_id", "text", theta=1.5)

    def test_all_jvm_no_python_stages(self, spark):
        from postgresql_topn_spark.operators.dedup import substring_dedup
        from postgresql_topn_spark.plans.audit import python_stages

        df = spark.createDataFrame(
            [(i, "w x y z " * 8) for i in range(20)],
            "doc_id bigint, text string",
        )
        out = substring_dedup(df, "doc_id", "text")
        assert python_stages(out) == 0


class TestLevenshteinPairs:
    """levenshtein_pairs: blocking + length pre-filter + edit-distance
    verify (record-linkage flavor)."""

    def test_hand_computed_pairs(self, spark):
        from postgresql_topn_spark.operators.dedup import levenshtein_pairs

        rows = [
            (1, "acme widget deluxe"),
            (2, "acme widgit deluxe"),   # 1 substitution from doc 1
            (3, "acme widget delux"),    # 1 deletion from doc 1
            (4, "zenith widget deluxe"), # different block (first token)
            (5, "acme completely different thing entirely"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = sorted(
            tuple(r)
            for r in levenshtein_pairs(df, "doc_id", "text", max_dist=2).collect()
        )
        assert got == [(1, 2, 1), (1, 3, 1), (2, 3, 2)]

    def test_blocking_prevents_cross_block_pairs(self, spark):
        from postgresql_topn_spark.operators.dedup import levenshtein_pairs

        # identical except the first (blocking) token: dist 1 but never
        # compared — the documented blocking trade-off
        rows = [(1, "a same tail"), (2, "b same tail")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        assert levenshtein_pairs(df, "doc_id", "text", max_dist=5).count() == 0

    def test_custom_block_and_hot_block_cap(self, spark):
        from pyspark.sql import functions as F

        from postgresql_topn_spark.operators.dedup import levenshtein_pairs

        rows = [(i, f"x{'y' * (i % 3)} common") for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        # constant custom block: all 12 in one block -> 66 candidates
        allp = levenshtein_pairs(
            df, "doc_id", "text", max_dist=99, block=F.lit("one")
        )
        assert allp.count() == 66
        # cap of 10 drops the single 12-member block entirely
        capped = levenshtein_pairs(
            df,
            "doc_id",
            "text",
            max_dist=99,
            block=F.lit("one"),
            max_block_size=10,
        )
        assert capped.count() == 0

    def test_matches_duckdb_levenshtein(self, spark):
        """Spark's levenshtein must agree with DuckDB's on the same
        strings (both classic unweighted Wagner-Fischer)."""
        import duckdb

        from postgresql_topn_spark.operators.dedup import levenshtein_pairs

        rows = [
            (1, "kitten sat"), (2, "kitten sitting"), (3, "kitten s"),
            (4, "kitten   sat"),  # whitespace run: same first token
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["dist"]
            for r in levenshtein_pairs(df, "doc_id", "text", max_dist=9).collect()
        }
        con = duckdb.connect()
        for (a, b), d in got.items():
            ta = rows[a - 1][1]
            tb = rows[b - 1][1]
            assert con.execute(
                "SELECT levenshtein(?, ?)", [ta, tb]
            ).fetchone()[0] == d

    def test_nulls_and_validation(self, spark):
        from postgresql_topn_spark.operators.dedup import levenshtein_pairs

        df = spark.createDataFrame(
            [(1, None), (2, "ok text"), (3, "ok test")],
            "doc_id bigint, text string",
        )
        got = levenshtein_pairs(df, "doc_id", "text", max_dist=2).collect()
        assert [(r["doc_a"], r["doc_b"], r["dist"]) for r in got] == [(2, 3, 1)]
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_dist"):
            levenshtein_pairs(df, "doc_id", "text", max_dist=-1)


class TestTfidfCosinePairs:
    """tfidf_cosine_pairs: weighted sparse cosine over k-token
    shingles (replica math computed in-test, oracle-style)."""

    def _docs(self, spark):
        rows = [
            (1, "a b c d"),
            (2, "a b c e"),   # shares 'a b','b c' with doc 1
            (3, "x y z w"),   # shares nothing
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_hand_replicated_similarity(self, spark):
        import math

        from postgresql_topn_spark.operators.dedup import tfidf_cosine_pairs

        got = {
            (r["doc_a"], r["doc_b"]): r["cos_sim"]
            for r in tfidf_cosine_pairs(
                self._docs(spark), "doc_id", "text",
                shingle_k=2, min_sim=0.0,
            ).collect()
        }
        # replica: N=3; df('a b')=df('b c')=2, singles df=1
        shared = math.log(3 / 2)
        rare = math.log(3 / 1)
        norm = math.sqrt(2 * shared**2 + rare**2)
        exp = round((2 * shared**2) / (norm * norm), 6)
        assert got == {(1, 2): exp}  # (1,3)/(2,3): no shared terms
        assert 0.2 < exp < 0.25

    def test_min_sim_threshold_and_validation(self, spark):
        from postgresql_topn_spark.operators.dedup import tfidf_cosine_pairs

        high = tfidf_cosine_pairs(
            self._docs(spark), "doc_id", "text", shingle_k=2, min_sim=0.5
        )
        assert high.count() == 0  # 0.214 < 0.5
        import pytest as _pytest

        with _pytest.raises(ValueError, match="min_sim"):
            tfidf_cosine_pairs(
                self._docs(spark), "doc_id", "text", min_sim=1.5
            )

    def test_max_df_prunes_measure_and_index(self, spark):
        from postgresql_topn_spark.operators.dedup import tfidf_cosine_pairs

        # cap at df <= 1: the shared (df=2) shingles leave the measure,
        # so doc 1 and 2 share nothing -> no pair at all
        out = tfidf_cosine_pairs(
            self._docs(spark), "doc_id", "text",
            shingle_k=2, min_sim=0.0, max_df=1,
        )
        assert out.count() == 0

    def test_identical_docs_score_one(self, spark):
        from postgresql_topn_spark.operators.dedup import tfidf_cosine_pairs

        rows = [(1, "p q r s t u"), (2, "p q r s t u"), (3, "m n o p q r")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["cos_sim"]
            for r in tfidf_cosine_pairs(
                df, "doc_id", "text", shingle_k=3, min_sim=0.99
            ).collect()
        }
        assert got == {(1, 2): 1.0}

    def test_all_jvm(self, spark):
        from postgresql_topn_spark.operators.dedup import tfidf_cosine_pairs
        from postgresql_topn_spark.plans.audit import python_stages

        out = tfidf_cosine_pairs(self._docs(spark), "doc_id", "text")
        assert python_stages(out) == 0


def test_levenshtein_pairs_empty_doc_survives(spark):
    """Review pin: the default blocking key used getItem(0), which
    CRASHES under ANSI on an empty token array; empty/whitespace-only
    docs must simply not block with anyone."""
    from postgresql_topn_spark.operators.dedup import levenshtein_pairs

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello worlds"), (3, "   "), (4, "")],
        "doc_id bigint, text string",
    )
    got = [
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in levenshtein_pairs(df, "doc_id", "text", max_dist=2).collect()
    ]
    assert got == [(1, 2, 1)]


def test_connected_components_local_vs_distributed(spark):
    """r14: below `spark.topn.cc.localEdgeThreshold` the loop runs as a
    driver-local mirror of the same min-label recurrence; labels must be
    IDENTICAL to the distributed fixpoint (threshold=0 forces the
    distributed loop), on long-diameter and star graphs alike."""
    from postgresql_topn_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(10, 40)]  # 30-node path
    edges += [(100, k) for k in range(101, 110)]  # star
    edges += [(5, 5), (39, 10)]  # self-loop + cycle back
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")

    local = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    spark.conf.set("spark.topn.cc.localEdgeThreshold", "0")
    try:
        dist = {
            (r["node"], r["component"])
            for r in connected_components(df, max_iter=80).collect()
        }
    finally:
        spark.conf.unset("spark.topn.cc.localEdgeThreshold")
    assert local == dist
    # schema parity: same column names and node type either way
    assert [f.name for f in connected_components(df).schema.fields] == [
        "node",
        "component",
    ]


def test_connected_components_string_ids(spark):
    """Review pin: the convergence check cast labels to decimal(38,0),
    crashing on string doc ids (ANSI) — every pair generator supports
    string ids, so the labeling layer must too."""
    from postgresql_topn_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_max_iter_exhaustion_raises(spark):
    """Review pin: returning partially-propagated labels silently
    split components; exhausting max_iter now fails loudly."""
    import pytest

    from postgresql_topn_spark.operators.dedup import connected_components

    # a 6-node path needs several propagation rounds; 1 is not enough
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, "src", "dst", max_iter=1)


def test_minhash_bands_and_char_ngram_threshold_validation(spark):
    """Review pin: assert-based validation vanishes under python -O;
    out-of-range thresholds surfaced as cryptic runtime slice errors."""
    import pytest

    from postgresql_topn_spark.operators.dedup import (
        char_ngram_jaccard_pairs,
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=32, bands=5)
    with pytest.raises(ValueError, match="threshold"):
        char_ngram_jaccard_pairs(df, "doc_id", "text", threshold=1.5)
    with pytest.raises(ValueError, match="threshold"):
        char_ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0)


def test_tfidf_zero_idf_fires_with_short_docs(spark):
    """Review pin: N must count docs that produced >= 1 shingle — with
    N over ALL docs, a corpus containing sub-shingle_k docs could never
    reach df == N, so the zero-idf stopword guard never fired."""
    from postgresql_topn_spark.operators.dedup import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [
            (1, "the same boilerplate line here"),
            (2, "the same boilerplate line there"),
            (3, "short"),  # < 3 tokens: no shingles
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_cosine_pairs(df, "doc_id", "text", shingle_k=3, min_sim=0.0)
    rows = {(r["doc_a"], r["doc_b"]): r["cos_sim"] for r in out.collect()}
    # 'the same boilerplate' and 'same boilerplate line' have df == N
    # == 2 -> weight 0; the docs still share no POSITIVE-weight term,
    # so no pair survives (every shared term is ubiquitous)
    assert rows == {}


def test_substring_runs_randomized_vs_bruteforce(spark):
    """Definition-level differential for substring_run_pairs: a direct
    O(n^2) pure-Python scan over every (pair, diagonal) computes the
    maximal shared token runs >= 16, independent of the gram/island
    algebra. Random 50-word-vocab docs (a coincidental 16-token run is
    ~50^-16) with planted shared chunks — one long, one exactly at the
    threshold, one just below (must be absent), a pair sharing TWO runs
    on different diagonals, and an adversarial repeated-token block
    that matches on 9 diagonals at once."""
    import random

    from postgresql_topn_spark.operators.dedup import substring_run_pairs

    rng = random.Random(31337)

    def doc(n):
        return [f"w{rng.randrange(50)}" for _ in range(n)]

    docs = {i: doc(rng.randrange(40, 80)) for i in range(10)}

    def plant(src, dst, length, at=None):
        s = rng.randrange(0, len(docs[src]) - length)
        chunk = docs[src][s : s + length]
        p = rng.randrange(0, len(docs[dst])) if at is None else at
        docs[dst] = docs[dst][:p] + chunk + docs[dst][p:]

    plant(0, 1, 25)
    plant(2, 3, 18)
    plant(2, 3, 21)   # second shared run, different diagonal
    plant(4, 5, 16)   # exactly at threshold
    plant(6, 7, 15)   # below threshold -> must NOT appear
    docs[8] = docs[8][:5] + ["rr"] * 20 + docs[8][5:]
    docs[9] = docs[9][:9] + ["rr"] * 20 + docs[9][9:]

    def brute(A, B):
        out = []
        for d in range(-(len(B) - 1), len(A)):
            i, j, run = max(0, d), max(0, d) - d, 0
            si = sj = None
            while i <= len(A) and j <= len(B):
                if i < len(A) and j < len(B) and A[i] == B[j]:
                    if run == 0:
                        si, sj = i, j
                    run += 1
                else:
                    if run >= 16:
                        out.append((si + 1, sj + 1, run))
                    run = 0
                i += 1
                j += 1
        return out

    want = sorted(
        (a, b, sa, sb, r)
        for a in docs
        for b in docs
        if a < b
        for sa, sb, r in brute(docs[a], docs[b])
    )
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = sorted(
        map(
            tuple,
            substring_run_pairs(df, "doc_id", "text")
            .select("doc_a", "doc_b", "a_start", "b_start", "run_tokens")
            .collect(),
        )
    )
    assert got == want
    # the planted shapes really are all present
    pairs = {(a, b) for a, b, *_ in want}
    assert {(0, 1), (4, 5), (8, 9)} <= pairs and (6, 7) not in pairs
    assert sum(1 for a, b, *_ in want if (a, b) == (2, 3)) >= 2
    assert sum(1 for a, b, *_ in want if (a, b) == (8, 9)) == 9


def test_char_ngram_prefix_filter_randomized(spark):
    """Randomized exactness sweep for the AllPairs/PPJoin prefix
    filter: strings over a 4-char alphabet share most of the 256
    possible 4-grams, so the 435 random pairs land densely around any
    threshold — the regime where an off-by-one in the prefix size
    (n - ceil(t*n) + 1) or in the length filter silently loses pairs.
    Brute-force gram Jaccard is the reference at three thresholds."""
    import random
    from itertools import combinations

    from postgresql_topn_spark.operators.dedup import (
        char_ngram_jaccard_pairs,
    )

    rng = random.Random(246)
    docs = {
        i: "".join(rng.choice("abcd") for _ in range(rng.randrange(20, 60)))
        for i in range(30)
    }
    # planted near-dups (single-char edits) so the 0.8 threshold has
    # qualifying pairs too — random 4-char strings top out around 0.6
    for src, dst in ((0, 30), (1, 31), (2, 32)):
        s = list(docs[src])
        s[rng.randrange(len(s))] = rng.choice("abcd")
        docs[dst] = "".join(s)
    n = 4

    def grams(s):
        return {s[i : i + n] for i in range(len(s) - n + 1)}

    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    for t in (0.3, 0.5, 0.8):
        expected = set()
        for (ia, ta), (ib, tb) in combinations(docs.items(), 2):
            ga, gb = grams(ta), grams(tb)
            if ga and gb and len(ga & gb) / len(ga | gb) >= t:
                expected.add((min(ia, ib), max(ia, ib)))
        got = {
            (r["doc_a"], r["doc_b"])
            for r in char_ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=t, n=n
            ).collect()
        }
        assert got == expected, t
        assert expected  # the sweep actually exercises each threshold


def test_char_ngram_reliable_cut_identical_and_releasable(
    spark, sf_dir, tmp_path
):
    """ADVICE r10: `checkpoint_dir=` switches the PPJoin postings cut
    from localCheckpoint to a reliable `stage_cut` — identical pairs,
    and the returned frame carries the cut handle so the staging dir
    is reclaimable after consumption."""
    import os

    from postgresql_topn_spark.operators.checkpointing import (
        cut_path,
        release_cut,
    )
    from postgresql_topn_spark.operators.dedup import (
        char_ngram_jaccard_pairs,
    )
    from postgresql_topn_spark.suite import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    kw = dict(threshold=0.5, n=8)
    base = sorted(
        tuple(r)
        for r in char_ngram_jaccard_pairs(
            docs, "doc_id", "text", **kw
        ).collect()
    )
    d = str(tmp_path / "ppjoin")
    out = char_ngram_jaccard_pairs(
        docs, "doc_id", "text", checkpoint_dir=d, **kw
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == base and base
    p = cut_path(out)
    assert p is not None and p.startswith(d) and os.path.isdir(p)
    assert release_cut(spark, out) is True
    assert not os.path.exists(p)


def test_connected_components_randomized_vs_union_find(spark):
    """Random graph + a deliberately long path (high diameter — forces
    the min-label fixpoint through many rounds, the classic place an
    early-converged iteration returns wrong labels) vs a pure-Python
    union-find; component label must be the min node id."""
    import random

    from postgresql_topn_spark.operators.dedup import connected_components

    rng = random.Random(13)
    edges = [
        (rng.randrange(150), rng.randrange(150)) for _ in range(120)
    ]
    chain = rng.sample(range(200, 290), 60)
    edges += list(zip(chain, chain[1:]))  # a 60-node path

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    # union-find roots are path-dependent; canonicalize both sides to
    # min-id-per-component before comparing
    comp_min = {}
    for x, r in want.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want_min = {x: comp_min[r] for x, r in want.items()}
    assert got == want_min
    # the planted path really is one component labeled by its min node
    assert len({got[c] for c in chain}) == 1 and got[chain[0]] == min(chain)


def test_minhash_small_hash_shingle_does_not_capture_signature(spark):
    """Regression for the M61 permutation-modulus bug (round-5 sf0.1
    sweep): with (a*h + b) mod 2^61-1 over 32-bit h, the permuted value
    stayed proportional to a*h, so ONE shingle with a tiny 32-bit hash
    captured the minimum of every permutation and the signatures of a
    jaccard-0.9 superset pair agreed in 0/32 slots. Reconstruct that
    shape: B's shingles are a subset of A's, and A's one extra shingle
    is chosen (by search) to have the smallest 32-bit hash among 20k
    candidates (~2^14, far below any other). Under the prime-field
    family the extra item must NOT dominate: agreement stays near the
    true jaccard and LSH recovers the pair."""
    from pyspark.sql import functions as F

    from postgresql_topn_spark.operators.dedup import (
        hashed_shingles_from_tokens,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    base = [f"tok{i}" for i in range(11)]  # 9 shingles
    cands = spark.createDataFrame(
        [(i, f"{base[-2]} {base[-1]} cand{i}") for i in range(20_000)],
        "i long, text string",
    ).select(
        "i",
        F.element_at(
            F.transform(
                hashed_shingles_from_tokens(F.split("text", r"\s+"), 3),
                lambda h: F.pmod(h, F.lit(1 << 32)),
            ),
            1,
        ).alias("h"),
    )
    best = cands.orderBy("h", "i").first()
    assert best["h"] < 1 << 22  # the planted hash really is tiny
    docs = spark.createDataFrame(
        [
            (1, " ".join(base + [f"cand{best['i']}"])),  # A: 10 shingles
            (2, " ".join(base)),                          # B: 9, subset
        ],
        "doc_id long, text string",
    )
    sigs = {
        r["__id"]: r["__sig"]
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    }
    agree = sum(1 for x, y in zip(sigs[1], sigs[2]) if x == y)
    # true jaccard 0.9 -> expected agreement ~29/32; the broken family
    # gave 0. Any sane threshold separates them; 20 is conservative.
    assert agree >= 20, agree
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert pairs.get((1, 2)) == 0.9


def test_minhash_estimator_tracks_true_jaccard(spark):
    """Statistical sentinel for the permutation family: on randomized
    set pairs spanning low/mid/high true Jaccard — including the
    superset shape the M61 family collapsed on — the 32-hash signature
    agreement must track the true value within binomial noise
    (|est - J| <= 0.25 per pair at n=32; the broken family gave est=0
    at J=0.9)."""
    import random

    from postgresql_topn_spark.operators.dedup import (
        minhash_est_jaccard,
        minhash_signatures_md5,
    )
    from pyspark.sql import functions as F

    rng = random.Random(8642)
    vocab = [f"w{i}" for i in range(400)]
    pairs, rows, did = [], [], 0
    for _ in range(12):
        base = rng.sample(vocab, 60)
        keep = rng.choice([10, 30, 45, 57])  # spans J ~0.09..0.9
        other = base[:keep] + rng.sample(
            [w for w in vocab if w not in base], 60 - keep
        )
        # token overlap induces 3-shingle overlap; the TRUE jaccard is
        # computed from the actual shingle sets below, so the induced
        # distribution (which spans ~0.1..0.9) is all that matters
        rows.append((did, " ".join(w for w in base))); a_id = did; did += 1
        rows.append((did, " ".join(w for w in other))); b_id = did; did += 1
        pairs.append((a_id, b_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # true 3-shingle jaccard per pair, computed directly
    texts = dict(rows)
    def sh(t):
        tk = t.split()
        return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
    sigs = {
        r["__id"]: r["__sig"]
        for r in minhash_signatures_md5(
            df, "doc_id", "text", num_hashes=32
        ).collect()
    }
    checked = 0
    for a_id, b_id in pairs:
        A, B = sh(texts[a_id]), sh(texts[b_id])
        true_j = len(A & B) / len(A | B)
        est = sum(
            1 for x, y in zip(sigs[a_id], sigs[b_id]) if x == y
        ) / 32.0
        assert abs(est - true_j) <= 0.25, (true_j, est)
        checked += 1
    assert checked == 12
    # and the Column-side estimator agrees with the python agreement
    two = spark.createDataFrame(
        [(sigs[pairs[0][0]], sigs[pairs[0][1]])],
        "sa array<bigint>, sb array<bigint>",
    ).select(minhash_est_jaccard(F.col("sa"), F.col("sb")).alias("e"))
    got = two.collect()[0]["e"]
    exp = sum(
        1 for x, y in zip(sigs[pairs[0][0]], sigs[pairs[0][1]]) if x == y
    ) / 32.0
    assert abs(got - exp) < 1e-9


class TestCorpusLineDedup:
    """CCNet/RefinedWeb-style cross-document line dedup: exact
    boilerplate lines collapse to one canonical occurrence (or vanish
    everywhere), documents are REWRITTEN, never dropped."""

    ROWS = [
        (1, "unique alpha\nshared banner\nunique beta"),
        (2, "shared banner\nunique gamma"),
        (3, "shared banner\nshared banner\nunique delta"),
        (4, None),
        (5, "   "),
        (6, "shared banner"),  # nothing but boilerplate
        (7, "para one\n\nshared para\n\npara two"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "doc_id bigint, text string"
        )

    def test_keep_first_canonical(self, spark):
        from postgresql_topn_spark.operators.dedup import corpus_line_dedup

        out = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_kept"])
            for r in corpus_line_dedup(self._df(spark)).collect()
        }
        # doc 1 holds the canonical 'shared banner' (smallest id/idx)
        assert out[1] == ("unique alpha\nshared banner\nunique beta", 3, 3)
        assert out[2] == ("unique gamma", 2, 1)
        # doc 3's OWN repeat is also deduped away
        assert out[3] == ("unique delta", 3, 1)
        assert out[4] == ("", 0, 0)
        assert out[5] == ("", 0, 0)
        assert out[6] == ("", 1, 0)

    def test_drop_frequent_removes_everywhere(self, spark):
        from postgresql_topn_spark.operators.dedup import corpus_line_dedup

        out = {
            r["doc_id"]: r["clean_text"]
            for r in corpus_line_dedup(
                self._df(spark), policy="drop_frequent", max_df=2
            ).collect()
        }
        # 'shared banner' occurs 5x >= 2 -> gone from doc 1 too
        assert out[1] == "unique alpha\nunique beta"
        assert out[2] == "unique gamma"
        assert out[3] == "unique delta"
        assert out[6] == ""

    def test_paragraph_granularity(self, spark):
        from postgresql_topn_spark.operators.dedup import corpus_line_dedup

        df = spark.createDataFrame(
            [(1, "keep me\n\nshared para"), (2, "shared para\n\nme too")],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: r["clean_text"]
            for r in corpus_line_dedup(
                df, granularity="paragraph"
            ).collect()
        }
        assert out[1] == "keep me\nshared para"
        assert out[2] == "me too"

    def test_invalid_args(self, spark):
        from postgresql_topn_spark.operators.dedup import corpus_line_dedup

        with pytest.raises(ValueError):
            corpus_line_dedup(self._df(spark), policy="nope")
        with pytest.raises(ValueError):
            corpus_line_dedup(
                self._df(spark), policy="drop_frequent", max_df=0
            )
        with pytest.raises(ValueError):
            corpus_line_dedup(self._df(spark), granularity="word")

    def test_duckdb_parity_over_corpus(self, spark, sf_dir):
        """Independent relational replay over the fixture corpus +
        crafted rows, both policies — clean_text, n_lines and
        n_lines_kept value-for-value. (The fixture has no newlines,
        so every fixture doc is one 'line'; cross-DOC duplicate lines
        then exercise the whole-doc-as-line path, and the crafted
        rows exercise multi-line rewriting.)"""
        import os

        import duckdb

        from postgresql_topn_spark.operators.dedup import corpus_line_dedup
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        edges = self._df(spark).withColumn(
            "doc_id", F.col("doc_id") + 9000
        )
        both = docs.unionByName(edges)

        con = duckdb.connect()
        pq = os.path.join(sf_dir, "documents.parquet")
        con.execute(
            f"CREATE VIEW docs AS SELECT * FROM read_parquet('{pq}')"
        )
        con.execute("CREATE TABLE edges(doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO edges VALUES (?, ?)",
            [(i + 9000, t) for i, t in self.ROWS],
        )
        base_sql = r"""
            WITH base AS (
              SELECT doc_id, text FROM docs
              UNION ALL SELECT doc_id, text FROM edges
            ),
            t AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)),
                                 l -> len(trim(l)) > 0) AS lines
              FROM base
            ),
            occ AS (
              SELECT doc_id, generate_subscripts(lines, 1) - 1 AS idx,
                     unnest(lines) AS line
              FROM t
            ),
            occ2 AS (
              SELECT *, count(*) OVER (PARTITION BY line) AS n,
                     ROW_NUMBER() OVER (PARTITION BY line
                                        ORDER BY doc_id, idx) AS rn
              FROM occ
            ),
            kept AS (SELECT * FROM occ2 WHERE {pred}),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY idx) AS ct,
                     CAST(count(*) AS BIGINT) AS nk
              FROM kept GROUP BY doc_id
            )
            SELECT b.doc_id,
                   COALESCE(r.ct, '') AS clean_text,
                   CAST(COALESCE(len(t.lines), 0) AS BIGINT) AS n_lines,
                   COALESCE(r.nk, 0) AS n_lines_kept
            FROM base b
            LEFT JOIN t USING (doc_id)
            LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
        """
        for policy, pred in (
            ("keep_first", "rn = 1"),
            ("drop_frequent", "n < 2"),
        ):
            got = {
                r["doc_id"]: (
                    r["clean_text"],
                    r["n_lines"],
                    r["n_lines_kept"],
                )
                for r in corpus_line_dedup(
                    both, policy=policy, max_df=2
                ).collect()
            }
            rows = con.execute(base_sql.format(pred=pred)).fetchall()
            oracle = {r[0]: (r[1], r[2], r[3]) for r in rows}
            assert set(got) == set(oracle)
            mism = {
                k: (got[k], oracle[k])
                for k in got
                if got[k] != oracle[k]
            }
            assert not mism, (
                policy,
                len(mism),
                list(mism.items())[:2],
            )

    def test_plan_shape_keyed_exchanges_no_python(self, spark, sf_dir):
        from postgresql_topn_spark.operators.dedup import corpus_line_dedup
        from postgresql_topn_spark.plans.audit import python_stages
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = corpus_line_dedup(docs)
        # the whole rewriter is JVM-side; join STRATEGY is size-driven
        # (the planner may broadcast the stats/spine sides at toy SF —
        # at corpus scale their estimates exceed the threshold and the
        # keyed shuffle join takes over), so the pin is the Python
        # budget, not the exchange kind
        assert python_stages(out) == 0

    def test_line_df_audit_view(self, spark):
        from postgresql_topn_spark.operators.dedup import line_df

        stats = {
            r["line_key"]: (
                r["n_total"],
                r["n_docs"],
                r["first_id"],
                r["first_idx"],
            )
            for r in line_df(self._df(spark)).collect()
        }
        import hashlib

        key = hashlib.md5(b"shared banner").hexdigest()
        # 5 occurrences across docs 1/2/3(x2)/6; canonical = (1, 1)
        assert stats[key] == (5, 4, 1, 1)
        ua = hashlib.md5(b"unique alpha").hexdigest()
        assert stats[ua] == (1, 1, 1, 0)

    def test_null_id_doc_is_hollow_and_never_canonical(self, spark):
        """ADVICE r9: a NULL-id doc must neither claim keep_first's
        canonical occurrence (Spark windows sort NULLs first, so the
        old window form let it — then its rebuilt row dropped at the
        id-keyed join, deleting the line corpus-wide) nor count toward
        drop_frequent frequencies; it surfaces as an empty husk."""
        from postgresql_topn_spark.operators.dedup import (
            corpus_line_dedup,
            line_df,
        )

        df = spark.createDataFrame(
            [
                (None, "shared banner\nghost only"),
                (1, "shared banner\nunique alpha"),
                (2, "shared banner"),
            ],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_kept"])
            for r in corpus_line_dedup(df).collect()
        }
        # doc 1 (not the NULL doc) holds the canonical occurrence, so
        # the banner SURVIVES in the corpus
        assert out[1] == ("shared banner\nunique alpha", 2, 2)
        assert out[2] == ("", 1, 0)
        assert out[None] == ("", 0, 0)
        # drop_frequent: banner df is 2 (NULL doc not counted) — at
        # max_df=3 it stays, at 2 it goes
        keep3 = {
            r["doc_id"]: r["clean_text"]
            for r in corpus_line_dedup(
                df, policy="drop_frequent", max_df=3
            ).collect()
        }
        assert keep3[2] == "shared banner"
        # audit view agrees: canonical is (1, 0), df counts exclude NULL
        import hashlib

        key = hashlib.md5(b"shared banner").hexdigest()
        stats = {
            r["line_key"]: (r["n_total"], r["n_docs"], r["first_id"])
            for r in line_df(df).collect()
        }
        assert stats[key] == (2, 2, 1)
        assert hashlib.md5(b"ghost only").hexdigest() not in stats

    def test_agg_form_matches_retired_window_form(self, spark, sf_dir):
        """Identity pin for the round-10 skew hardening: per-line stats
        moved from Window.partitionBy(line_key) (count + row_number —
        an unsplittable single-task sort for a hot boilerplate line;
        AQE cannot split skewed window partitions) to a map-side-
        combinable hash aggregate (count + min(struct(__id,__idx)))
        joined back on line_key, where AQE skew-join splitting DOES
        apply. (__id,__idx) is unique per occurrence, so min(struct)
        is exactly the rn=1 row; this pins the equivalence on the
        fixture corpus + edge rows for both policies."""
        from pyspark.sql import Window

        from postgresql_topn_spark.operators.dedup import (
            _line_occurrences,
            corpus_line_dedup,
        )
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        edges = self._df(spark).withColumn(
            "doc_id", F.col("doc_id") + 9000
        )
        both = docs.unionByName(edges)

        def window_form(policy):
            occ = _line_occurrences(both, "doc_id", "text", "line")
            by_key = Window.partitionBy("line_key")
            occ = occ.select(
                "__id",
                "__idx",
                "__line",
                F.count(F.lit(1)).over(by_key).alias("__n"),
                F.row_number()
                .over(by_key.orderBy("__id", "__idx"))
                .alias("__rn"),
            )
            keep = (
                F.col("__rn") == 1
                if policy == "keep_first"
                else F.col("__n") < 2
            )
            rebuilt = occ.groupBy("__id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(keep, F.struct("__idx", "__line"))
                            )
                        ),
                        lambda s: s["__line"],
                    ),
                    "\n",
                ).alias("clean_text"),
                F.count(F.lit(1)).cast("long").alias("n_lines"),
                F.sum(keep.cast("long")).cast("long").alias("n_lines_kept"),
            )
            spine = both.select(F.col("doc_id").alias("__id"))
            return spine.join(rebuilt, "__id", "left").select(
                F.col("__id").alias("doc_id"),
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                F.coalesce("n_lines", F.lit(0).cast("long")).alias(
                    "n_lines"
                ),
                F.coalesce("n_lines_kept", F.lit(0).cast("long")).alias(
                    "n_lines_kept"
                ),
            )

        for policy in ("keep_first", "drop_frequent"):
            got = {
                r["doc_id"]: (
                    r["clean_text"],
                    r["n_lines"],
                    r["n_lines_kept"],
                )
                for r in corpus_line_dedup(
                    both, policy=policy, max_df=2
                ).collect()
            }
            ref = {
                r["doc_id"]: (
                    r["clean_text"],
                    r["n_lines"],
                    r["n_lines_kept"],
                )
                for r in window_form(policy).collect()
            }
            assert got == ref, policy


def test_prefix_candidates_agg_form_matches_retired_window_form(
    spark, sf_dir
):
    """Identity pin for the round-10 PPJoin skew hardening: gram df via
    cut + hash-aggregate + join-back must produce exactly the window
    form's pair set (df values are identical, so the global (df, gram)
    prefix order — and with it every candidate and verified pair — is
    unchanged)."""
    from pyspark.sql.window import Window

    from postgresql_topn_spark.operators.dedup import (
        _bucket_pairs,
        _char_gram_arrays,
        char_ngram_jaccard_pairs,
    )
    from postgresql_topn_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    threshold, n = 0.7, 5

    # the retired window implementation of _prefix_candidates, inlined
    garr = _char_gram_arrays(docs, "doc_id", "text", n)
    posts = garr.select("__id", F.explode("__g").alias("__sh"), "__n")
    ranked = posts.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("__sh"))
    )
    plen = (
        F.col("__n")
        - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
        + 1
    ).cast("int")
    prefix = (
        ranked.groupBy("__id", "__n")
        .agg(
            F.array_sort(F.collect_list(F.struct("__df", "__sh"))).alias(
                "__g"
            )
        )
        .select(
            F.struct(
                F.col("__id").alias("id"), F.col("__n").alias("n")
            ).alias("__p"),
            F.explode(F.slice("__g", F.lit(1), plen)).alias("__e"),
        )
        .where(F.col("__e.__df") >= 2)
        .select("__p", F.col("__e.__sh").alias("__sh"))
    )
    cand = _bucket_pairs(prefix, ["__sh"], "__p")
    lo = F.least(F.col("__a.n"), F.col("__b.n"))
    hi = F.greatest(F.col("__a.n"), F.col("__b.n"))
    window_cand = (
        cand.where(lo >= F.ceil(F.lit(threshold) * hi - F.lit(1e-9)))
        .select(
            F.least("__a.id", "__b.id").alias("doc_a"),
            F.greatest("__a.id", "__b.id").alias("doc_b"),
        )
        .distinct()
    )
    # full operator output is candidates + exact verification; compare
    # the final verified pair sets (the strongest end-to-end identity)
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in char_ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=threshold, n=n
        ).collect()
    }
    ref_cand = {
        (r["doc_a"], r["doc_b"]) for r in window_cand.collect()
    }
    # every verified pair must come from the window-form candidate set,
    # and candidate counts match (the df identity)
    assert {(a, b) for a, b, _ in got} <= ref_cand
    from postgresql_topn_spark.operators.dedup import _prefix_candidates

    agg_cand = {
        (r["doc_a"], r["doc_b"])
        for r in _prefix_candidates(posts, threshold).collect()
    }
    assert agg_cand == ref_cand
