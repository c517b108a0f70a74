"""gopher_quality_signals: the published Gopher quality-rule set
(Rae et al. 2021, Table A1) — value pins at the paper's thresholds,
NULL discipline, a no-Python/no-shuffle plan pin, and a full DuckDB
replay over the fixture corpus + hostile edge rows (the repo's
fixed-point parity discipline, applied in pytest since the driver
registry is at its freshness cap)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.operators.text import (
    GOPHER_STOPWORDS,
    gopher_quality_signals,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "with great speed to be sure that all of us have seen it happen "
    "again and again every single day of the long year with more "
    "words added here to cross fifty words total easily now done"
)

EDGE_ROWS = [
    (1, GOOD),                               # passes every rule
    (2, "# # # short"),                      # symbols + too short
    (3, None),                               # NULL text -> NULL struct
    (4, "   "),                              # whitespace-only -> NULL
    (5, "- a\n- b\n- c\n" * 30),             # bullet wall
    (6, "so it goes...\nand on...\n" * 40),  # ellipsis-ended lines
    (7, "\t- tab-led line\nplain the be line of text\n"),
    (8, ("ab " * 60).strip()),               # mean word len 2 -> fail
]


class TestGopherRules:
    def test_threshold_pins(self, spark):
        df = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
        g = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id", gopher_quality_signals("text").alias("g")
            ).collect()
        }
        assert g[1]["passes"] is True and g[1]["n_stop_hits"] == 8
        assert g[2]["passes"] is False and g[2]["symbol_word_ratio"] > 0.1
        assert g[3] is None and g[4] is None
        assert g[5]["passes"] is False and g[5]["bullet_line_frac"] == 1.0
        assert g[6]["ellipsis_line_frac"] == 1.0 and g[6]["passes"] is False
        # space-only ltrim: the tab-led bullet line does NOT count
        assert g[7]["bullet_line_frac"] == 0.0
        assert g[8]["passes"] is False and g[8]["mean_word_len"] == 2.0

    def test_where_passes_drops_null_rows(self, spark):
        df = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
        kept = [
            r["doc_id"]
            for r in df.where(
                gopher_quality_signals("text")["passes"]
            ).collect()
        ]
        assert kept == [1]

    def test_scan_stage_no_python(self, spark):
        from postgresql_topn_spark.plans.audit import (
            hash_shuffles,
            python_stages,
        )
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        out = docs.select(
            "doc_id", gopher_quality_signals("text").alias("g")
        )
        assert hash_shuffles(out) == 0
        assert python_stages(out) == 0

    def test_duckdb_parity_over_corpus(self, spark):
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        )
        edges = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
        edges = edges.withColumn("doc_id", F.col("doc_id") + 9000)
        both = docs.unionByName(edges)
        got = {
            r["doc_id"]: (None if r["g"] is None else tuple(r["g"]))
            for r in both.select(
                "doc_id", gopher_quality_signals("text").alias("g")
            ).collect()
        }

        con = duckdb.connect()
        pq = os.path.join(SF_DIR, "documents.parquet")
        con.execute(
            f"CREATE VIEW docs AS SELECT * FROM read_parquet('{pq}')"
        )
        con.execute(
            "CREATE TABLE edges(doc_id BIGINT, text VARCHAR)"
        )
        con.executemany(
            "INSERT INTO edges VALUES (?, ?)",
            [(i + 9000, t) for i, t in EDGE_ROWS],
        )
        stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
        rows = con.execute(
            f"""
            WITH base AS (
              SELECT doc_id, text FROM docs
              UNION ALL SELECT doc_id, text FROM edges
            ),
            t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 w -> w <> '') AS toks,
                     list_filter(string_split(text, chr(10)),
                                 l -> len(trim(l)) > 0) AS lines
              FROM base
            ),
            m AS (
              SELECT doc_id, text, toks, lines,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     CAST(len(lines) AS DOUBLE) AS n_lines
              FROM t
            )
            SELECT doc_id, n_words,
              round(CAST(list_sum(list_transform(toks, w -> len(w)))
                         AS DOUBLE) / n_words, 6) AS mwl,
              round((CAST(len(text) - len(replace(text, '#', ''))
                          AS DOUBLE)
                     + (CAST(len(text) - len(replace(text, '...', ''))
                             AS DOUBLE) / 3
                        + CAST(len(text) - len(replace(text, '…', ''))
                               AS DOUBLE)))
                    / n_words, 6) AS swr,
              round(CAST(len(list_filter(lines,
                        l -> regexp_matches(ltrim(l), '^[-*•]')))
                    AS DOUBLE) / n_lines, 6) AS bullet,
              round(CAST(len(list_filter(lines,
                        l -> regexp_matches(rtrim(l),
                                            '(\\.\\.\\.|…)$')))
                    AS DOUBLE) / n_lines, 6) AS ellip,
              round(CAST(len(list_filter(toks,
                        w -> regexp_matches(w, '[a-zA-Z]')))
                    AS DOUBLE) / n_words, 6) AS alpha,
              CAST(len(list_intersect(
                     list_distinct(list_transform(toks, w -> lower(w))),
                     [{stop_list}])) AS BIGINT) AS stop_hits
            FROM m
            WHERE text IS NOT NULL AND len(text) > 0 AND n_words > 0
            """
        ).fetchall()
        oracle = {
            r[0]: (
                r[1],
                r[2],
                r[3],
                r[4],
                r[5],
                r[6],
                r[7],
                (
                    50 <= r[1] <= 100_000
                    and 3.0 <= r[2] <= 10.0
                    and r[3] <= 0.1
                    and (r[4] or 0.0) <= 0.9
                    and (r[5] or 0.0) <= 0.3
                    and r[6] >= 0.8
                    and r[7] >= 2
                ),
            )
            for r in rows
        }
        judged = {k: v for k, v in got.items() if v is not None}
        assert set(judged) == set(oracle)
        mism = {
            k: (judged[k], oracle[k])
            for k in judged
            if judged[k] != oracle[k]
        }
        assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:3]}"
        # the NULL rows are exactly the unjudgeable ones
        assert {k for k, v in got.items() if v is None} == {9003, 9004}


REP_ROWS = [
    (1, "a clean sentence with plenty of ordinary variation in it and "
        "then another quite different line\nsecond line here is unique"),
    (2, "copy paste copy paste copy paste copy paste copy paste copy "
        "paste copy paste copy paste"),
    (3, "same line\nsame line\nsame line\nother"),
    (4, None),
    (5, "  "),
    (6, "p1 body text\n\np1 body text\n\nunique paragraph"),
]


class TestGopherRepetition:
    def test_threshold_pins(self, spark):
        from postgresql_topn_spark.operators.text import (
            gopher_repetition_signals,
        )

        df = spark.createDataFrame(REP_ROWS, "doc_id long, text string")
        g = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id", gopher_repetition_signals("text").alias("g")
            ).collect()
        }
        # clean doc: every singleton gram is NOT a repetition
        assert g[1]["passes"] is True
        assert g[1]["top_4gram_char_frac"] == 0.0
        # wall of copy-paste: n-gram rules fire, fractions saturate
        assert g[2]["passes"] is False
        assert g[2]["dup_5gram_char_frac"] == 1.0
        assert g[2]["top_2gram_char_frac"] > 0.2
        # duplicate lines: line rules fire, paragraph rules don't
        assert g[3]["passes"] is False
        assert g[3]["dup_line_frac"] == 0.5
        assert g[3]["dup_line_char_frac"] > 0.2
        assert g[3]["dup_para_char_frac"] == 0.0
        # duplicate paragraphs fire the para rules
        assert g[6]["dup_para_char_frac"] > 0.2 and g[6]["passes"] is False
        assert g[4] is None and g[5] is None

    def test_scan_stage_no_python(self, spark):
        from postgresql_topn_spark.operators.text import (
            gopher_repetition_signals,
        )
        from postgresql_topn_spark.plans.audit import (
            hash_shuffles,
            python_stages,
        )
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        out = docs.select(
            "doc_id", gopher_repetition_signals("text").alias("g")
        )
        assert hash_shuffles(out) == 0
        assert python_stages(out) == 0

    def test_arrow_kernel_equals_catalyst_form(self, spark):
        """gopher_repetition_signals_pandas (the Arrow scan kernel,
        VERDICT r9 item 3) must equal the Catalyst HOF form FIELD FOR
        FIELD on the fixture corpus + the crafted rows + extra hostile
        rows (tabs/newline-leading text, unicode, rounding-boundary
        repeats) — the Column form stays the oracle lane, the kernel
        is the throughput lane, and this pin is what lets
        pipeline_curation use either."""
        from postgresql_topn_spark.operators.text import (
            GOPHER_REP_FIELDS,
            gopher_repetition_signals,
            gopher_repetition_signals_pandas,
        )
        from postgresql_topn_spark.sources.tables import load_table

        hostile = [
            (9101, "\tword a b word word\nword word"),
            (9102, "x y x y x y… tail"),
            (9103, "aa aa aa bb bb cc"),  # count tie: 'aa aa' vs 'bb bb'
            (9104, "one\n\n\nthree\n\n one"),
            (9105, "s " * 400),
            # rounding-boundary doc: dup_line_char_frac = 197/640 =
            # 0.3078125 exactly — Spark's shortest-repr HALF_UP gives
            # .307813, the exact-binary expansion gives .307812; pins
            # the Decimal(repr(x)) discipline in _rep_signals_py
            (9106, "\n".join(["x" * 197, "x" * 197, "y" * 123,
                              "z" * 123])),
        ]
        edges = spark.createDataFrame(
            [(i + 9000, t) for i, t in REP_ROWS] + hostile,
            "doc_id long, text string",
        )
        both = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ).unionByName(edges)

        col_form = {
            r["doc_id"]: r["g"]
            for r in both.select(
                "doc_id", gopher_repetition_signals("text").alias("g")
            ).collect()
        }
        arrow_form = {
            r["doc_id"]: r
            for r in gopher_repetition_signals_pandas(
                both, "text"
            ).collect()
        }
        assert set(col_form) == set(arrow_form)
        mism = []
        for did, g in col_form.items():
            a = arrow_form[did]
            for f in GOPHER_REP_FIELDS:
                cv = None if g is None else g[f]
                av = a["rep_" + f]
                if cv != av:
                    mism.append((did, f, cv, av))
        assert not mism, (len(mism), mism[:5])

    def test_arrow_kernel_rejects_colliding_and_nonstring_input(
        self, spark
    ):
        """ADVICE r10: re-applying the kernel (or any rep_* user
        column) must raise a clear error instead of shadowing at
        schema build, and a non-string text_col fails at the API
        boundary rather than mis-signaling in the kernel."""
        import pytest

        from postgresql_topn_spark.operators.text import (
            gopher_repetition_signals_pandas,
        )

        df = spark.createDataFrame(
            [(1, "a b a b", 0.5)],
            "doc_id long, text string, rep_dup_line_frac double",
        )
        with pytest.raises(ValueError, match="rep_dup_line_frac"):
            gopher_repetition_signals_pandas(df, "text")
        # a different prefix sidesteps the clash
        ok = gopher_repetition_signals_pandas(df, "text", prefix="r2_")
        assert ok.count() == 1
        # double application of the default prefix = the clash case
        once = gopher_repetition_signals_pandas(
            df.drop("rep_dup_line_frac"), "text"
        )
        with pytest.raises(ValueError, match="already exist"):
            gopher_repetition_signals_pandas(once, "text")
        with pytest.raises(TypeError, match="must be string"):
            gopher_repetition_signals_pandas(
                df.drop("rep_dup_line_frac"), "doc_id"
            )

    def test_duckdb_parity_ngram_and_line_fracs(self, spark):
        """Replay the n-gram/line char fractions in DuckDB via the
        explode+group form (exact counts, independent algorithm) over
        the fixture corpus + the crafted rows — the sorted-fold and
        the relational form must agree value-for-value."""
        from postgresql_topn_spark.operators.text import (
            gopher_repetition_signals,
        )
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        )
        edges = spark.createDataFrame(
            REP_ROWS, "doc_id long, text string"
        ).withColumn("doc_id", F.col("doc_id") + 9000)
        both = docs.unionByName(edges)
        got = {
            r["doc_id"]: r["g"]
            for r in both.select(
                "doc_id", gopher_repetition_signals("text").alias("g")
            ).collect()
            if r["g"] is not None
        }

        con = duckdb.connect()
        pq = os.path.join(SF_DIR, "documents.parquet")
        con.execute(
            f"CREATE VIEW docs AS SELECT * FROM read_parquet('{pq}')"
        )
        con.execute("CREATE TABLE edges(doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO edges VALUES (?, ?)",
            [(i + 9000, t) for i, t in REP_ROWS],
        )
        rows = con.execute(
            r"""
            WITH base AS (
              SELECT doc_id, text FROM docs
              UNION ALL SELECT doc_id, text FROM edges
            ),
            t AS (
              SELECT doc_id, text, len(text) AS n_chars,
                     list_filter(string_split_regex(trim(text), '\s+'),
                                 w -> w <> '') AS toks
              FROM base
              WHERE text IS NOT NULL AND len(text) > 0
            ),
            t2 AS (SELECT * FROM t WHERE len(toks) > 0),
            g AS (
              SELECT doc_id, n_chars,
                     unnest(list_transform(
                       range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     )) AS gram
              FROM t2 WHERE len(toks) >= 3
            ),
            gc AS (
              SELECT doc_id, n_chars, gram, count(*) AS cnt
              FROM g GROUP BY doc_id, n_chars, gram
            ),
            top3 AS (
              -- argmax by count, ties toward the larger mass: pack
              -- (cnt, mass) into one BIGINT key (mass < 2^40 here)
              SELECT doc_id,
                     round(least(1.0,
                       CAST(COALESCE(arg_max(cnt * len(gram),
                              cnt * 1099511627776 + cnt * len(gram))
                            FILTER (WHERE cnt >= 2), 0)
                            AS DOUBLE) / n_chars), 6) AS v
              FROM gc GROUP BY doc_id, n_chars
            ),
            g5 AS (
              SELECT doc_id, n_chars,
                     unnest(list_transform(
                       range(1, len(toks) - 3),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                            toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]
                     )) AS gram
              FROM t2 WHERE len(toks) >= 5
            ),
            g5c AS (
              SELECT doc_id, n_chars, gram, count(*) AS cnt
              FROM g5 GROUP BY doc_id, n_chars, gram
            ),
            dup5 AS (
              SELECT doc_id,
                     round(least(1.0,
                       CAST(COALESCE(sum(CASE WHEN cnt >= 2
                                    THEN (cnt - 1) * len(gram) END), 0)
                            AS DOUBLE) / n_chars), 6) AS v
              FROM g5c GROUP BY doc_id, n_chars
            ),
            ln AS (
              SELECT doc_id,
                     unnest(list_filter(string_split(text, chr(10)),
                                        l -> len(trim(l)) > 0)) AS line
              FROM t2
            ),
            pr AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split(text, chr(10) || chr(10)),
                       x -> len(trim(x)) > 0)) AS para
              FROM t2
            ),
            prc AS (
              SELECT doc_id, para, count(*) AS cnt, len(para) AS pl
              FROM pr GROUP BY doc_id, para
            ),
            duppara AS (
              SELECT doc_id,
                     round(least(1.0,
                       CAST(COALESCE(sum(CASE WHEN cnt >= 2
                                    THEN (cnt - 1) * pl END), 0) AS DOUBLE)
                       / sum(cnt * pl)), 6) AS v
              FROM prc GROUP BY doc_id
            ),
            lc AS (
              SELECT doc_id, line, count(*) AS cnt, len(line) AS ll
              FROM ln GROUP BY doc_id, line
            ),
            dupline AS (
              SELECT doc_id,
                     round(least(1.0,
                       CAST(COALESCE(sum(CASE WHEN cnt >= 2
                                    THEN (cnt - 1) * ll END), 0) AS DOUBLE)
                       / sum(cnt * ll)), 6) AS v
              FROM lc GROUP BY doc_id
            )
            SELECT t2.doc_id,
                   COALESCE(top3.v, 0.0) AS top3,
                   COALESCE(dup5.v, 0.0) AS dup5,
                   dupline.v AS dupline,
                   duppara.v AS duppara
            FROM t2
            LEFT JOIN top3 USING (doc_id)
            LEFT JOIN dup5 USING (doc_id)
            LEFT JOIN dupline USING (doc_id)
            LEFT JOIN duppara USING (doc_id)
            """
        ).fetchall()
        oracle = {r[0]: (r[1], r[2], r[3], r[4]) for r in rows}
        assert set(got) == set(oracle)

        def _sig(k):
            return (
                got[k]["top_3gram_char_frac"],
                got[k]["dup_5gram_char_frac"],
                got[k]["dup_line_char_frac"],
                got[k]["dup_para_char_frac"],
            )

        mism = {
            k: (_sig(k), oracle[k]) for k in got if _sig(k) != oracle[k]
        }
        assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:3]}"


C4_ROWS = [
    (1, "This is a proper sentence with enough words here.\n"
        "Another full sentence that also ends properly!\n"
        "And a third one to cross the sentence floor, yes?\n"
        "menu home about"),
    (2, "Enable Javascript to view this page properly please.\n"
        "Short line.\nok"),
    (3, "function f() { return 1; } This has sentences. "
        "It even has three of them. Truly it does."),
    (4, "lorem ipsum dolor sit amet and some more words here.\n"
        "Another good sentence is right here with words.\n"
        "A third sentence lands right here with many words."),
    (5, None),
    (6, ""),
    (7, 'A quoted line also counts as terminated, he said, "sure."\n'
        "Sentence two is right here and it has enough words.\n"
        "Sentence three follows with plenty of words too."),
]


class TestC4Clean:
    def test_rule_pins(self, spark):
        from postgresql_topn_spark.operators.text import c4_clean

        df = spark.createDataFrame(C4_ROWS, "doc_id long, text string")
        c = {
            r["doc_id"]: r["c"]
            for r in df.select(
                "doc_id", c4_clean("text").alias("c")
            ).collect()
        }
        # nav line dropped, page passes
        assert c[1]["n_lines_kept"] == 3 and c[1]["passes"] is True
        assert "menu home about" not in c[1]["clean_text"]
        # javascript line dropped -> sentence floor fails the page
        assert c[2]["n_lines_kept"] == 0 and c[2]["passes"] is False
        # curly brace fails the page even with enough sentences
        assert c[3]["n_sentences"] >= 3 and c[3]["passes"] is False
        # lorem ipsum fails the page
        assert c[4]["passes"] is False
        assert c[5] is None and c[6] is None
        # quote-terminated lines count
        assert c[7]["n_lines_kept"] == 3 and c[7]["passes"] is True

    def test_scan_stage_no_python(self, spark):
        from postgresql_topn_spark.operators.text import c4_clean
        from postgresql_topn_spark.plans.audit import (
            hash_shuffles,
            python_stages,
        )
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        out = docs.select("doc_id", c4_clean("text").alias("c"))
        assert hash_shuffles(out) == 0
        assert python_stages(out) == 0

    def test_duckdb_parity_over_corpus(self, spark):
        from postgresql_topn_spark.operators.text import c4_clean
        from postgresql_topn_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        )
        edges = spark.createDataFrame(
            C4_ROWS, "doc_id long, text string"
        ).withColumn("doc_id", F.col("doc_id") + 9000)
        both = docs.unionByName(edges)
        got = {
            r["doc_id"]: (None if r["c"] is None else tuple(r["c"]))
            for r in both.select(
                "doc_id", c4_clean("text").alias("c")
            ).collect()
        }

        con = duckdb.connect()
        pq = os.path.join(SF_DIR, "documents.parquet")
        con.execute(
            f"CREATE VIEW docs AS SELECT * FROM read_parquet('{pq}')"
        )
        con.execute("CREATE TABLE edges(doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO edges VALUES (?, ?)",
            [(i + 9000, t) for i, t in C4_ROWS],
        )
        rows = con.execute(
            r"""
            WITH base AS (
              SELECT doc_id, text FROM docs
              UNION ALL SELECT doc_id, text FROM edges
            ),
            t AS (
              SELECT doc_id, text,
                     list_filter(string_split(text, chr(10)),
                                 l -> len(trim(l)) > 0) AS lines
              FROM base
              WHERE text IS NOT NULL AND len(text) > 0
            ),
            k AS (
              SELECT doc_id, text, lines,
                     list_filter(lines, l ->
                       regexp_matches(trim(l), '[.!?"]$')
                       AND len(list_filter(
                             string_split_regex(trim(l), '\s+'),
                             w -> w <> '')) >= 5
                       AND NOT contains(lower(l), 'javascript')
                     ) AS kept
              FROM t
            ),
            c AS (
              SELECT doc_id, text, lines, kept,
                     COALESCE(array_to_string(kept, chr(10)), '') AS clean_text
              FROM k
            )
            SELECT doc_id, clean_text,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_lines_kept,
                   CAST(len(clean_text)
                        - len(replace(replace(replace(clean_text,
                              '.', ''), '!', ''), '?', ''))
                        AS BIGINT) AS n_sentences,
                   (len(clean_text)
                    - len(replace(replace(replace(clean_text,
                          '.', ''), '!', ''), '?', ''))) >= 3
                   AND NOT contains(lower(text), 'lorem ipsum')
                   AND NOT contains(text, '{') AS passes
            FROM c
            """
        ).fetchall()
        oracle = {r[0]: tuple(r[1:]) for r in rows}
        judged = {k: v for k, v in got.items() if v is not None}
        assert set(judged) == set(oracle)
        mism = {
            k: (judged[k], oracle[k])
            for k in judged
            if judged[k] != oracle[k]
        }
        assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:2]}"
        assert {k for k, v in got.items() if v is None} == {9005, 9006}
