"""SQL-defined text functions == Column implementations, value-level,
over the fixture corpus plus hostile edge rows; and the no-Python plan
contract that distinguishes them from the sql_api shims."""

import os

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sql_text import (
    register_text_sql_functions,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

EDGE_ROWS = [
    (9001, None),
    (9002, ""),
    (9003, "   "),
    (9004, "\t\nthe  of\tis\n"),
    (9005, "the the the and of is to !!! ??? 123 abc123"),
    (9006, "der die und nicht das"),
    (9007, "le les el la the"),
    # multi-line hostiles: the fixture corpus has no newlines, so these
    # rows are what exercises the line/paragraph code paths of the
    # round-9 struct twins (bullets, '...'/'…' line endings, duplicate
    # lines AND paragraphs, quote/punct-terminated C4 keepers, the
    # javascript line rule, '{' and 'lorem ipsum' page rules)
    (9008, "- bullet one\n- bullet two\nplain the be line\nender..."),
    (9009, "same line\nsame line\nsame line\nother {brace}"),
    (9010, "p1 body text\n\np1 body text\n\nlorem ipsum dolor sit"),
    (9011, 'He said it counts when quoted, "sure."\n'
           "Enable javascript to continue browsing here please.\n"
           "Another proper sentence with enough words, truly!\n"
           "short one\n"
           "A third full sentence sits right here with words…"),
    (9012, "copy paste copy paste copy paste copy paste copy paste "
           "copy paste copy paste copy paste"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    from postgresql_topn_spark.sources.tables import load_table

    register_text_sql_functions(spark)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    edges = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    both = docs.unionByName(edges)
    both.createOrReplaceTempView("sql_text_corpus")
    return both


def _pairs(df):
    return {r[0]: r[1] for r in df.collect()}


@pytest.mark.parametrize(
    "sql_call,col_fn",
    [
        ("ws_token_count(text)", "ws_token_count"),
        ("bpe_token_count(text)", "bpe_token_count"),
        ("lang_id(text)", "lang_id"),
        ("quality_score(text)", "quality_score"),
        ("fingerprint_md5(text)", "fingerprint_md5"),
        # round 9: the published C4+Gopher structs for SQL consumers —
        # full struct equality incl. every signal and the verdict
        ("gopher_quality_signals(text)", "gopher_quality_signals"),
        ("gopher_repetition_signals(text)", "gopher_repetition_signals"),
        ("c4_clean(text)", "c4_clean"),
    ],
)
def test_sql_matches_column(spark, corpus, sql_call, col_fn):
    import postgresql_topn_spark.operators.text as text_ops

    got = _pairs(
        spark.sql(f"SELECT doc_id, {sql_call} FROM sql_text_corpus")
    )
    want = _pairs(
        corpus.select("doc_id", getattr(text_ops, col_fn)("text"))
    )
    assert got == want


def test_hash_uniform_matches_column(spark, corpus):
    from postgresql_topn_spark.operators.sampling import hash_uniform

    got = _pairs(
        spark.sql(
            "SELECT doc_id, hash_uniform(cast(doc_id AS STRING), 7)"
            " FROM sql_text_corpus"
        )
    )
    want = _pairs(corpus.select("doc_id", hash_uniform("doc_id", 7)))
    assert got == want


def test_sql_functions_plan_no_python(spark, corpus):
    """The whole point vs the sql_api Python shims: a SQL-UDF call
    inlines into the Catalyst plan — zero Python stages, the Column
    API's exact scan-speed contract for SQL-only consumers."""
    from postgresql_topn_spark.plans.audit import python_stages

    df = spark.sql(
        "SELECT doc_id, quality_score(text) q, lang_id(text) l,"
        " ws_token_count(text) n FROM sql_text_corpus"
    )
    assert python_stages(df) == 0
    # the struct twins inline the same way — a SQL-only consumer can
    # run the whole published filter chain at scan speed
    chain = spark.sql(
        "SELECT doc_id FROM sql_text_corpus WHERE"
        " gopher_quality_signals(text).passes"
        " AND gopher_repetition_signals(text).passes"
        " AND c4_clean(text).passes"
    )
    assert python_stages(chain) == 0


def test_sql_sampling_filter_composes(spark, corpus):
    """The portable md5-uniform as a pure-SQL WHERE: deterministic
    sampling for SQL consumers, same keep set as the Column API."""
    from postgresql_topn_spark.operators.sampling import (
        deterministic_sample,
    )

    got = {
        r[0]
        for r in spark.sql(
            "SELECT doc_id FROM sql_text_corpus"
            " WHERE hash_uniform(cast(doc_id AS STRING), 3) < 0.25"
        ).collect()
    }
    want = {
        r[0]
        for r in deterministic_sample(corpus, "doc_id", 0.25, seed=3)
        .select("doc_id")
        .collect()
    }
    assert got == want and got


def test_sql_surface_does_not_import_operator_stack():
    """ADVICE r10 layering: the lightweight SQL-text surface shares the
    published Gopher tables through the leaf `published_constants`
    module — importing it must not pull operators/text (or any
    operators module) into the process."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "import postgresql_topn_spark.functions.sql_text\n"
        "bad = [m for m in sys.modules"
        " if m.startswith('postgresql_topn_spark.operators')]\n"
        "assert not bad, bad\n"
        "from postgresql_topn_spark.published_constants import ("
        " GOPHER_STOPWORDS)\n"
        "from postgresql_topn_spark.operators.text import ("
        " GOPHER_STOPWORDS as RE)\n"
        "assert RE is GOPHER_STOPWORDS\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("ok")
