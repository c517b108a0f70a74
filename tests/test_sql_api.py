"""spark.sql() surface: registered topn UDTF/UDFs and the CSV ingestion
path (sql/copy_data.sql parity)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sql_api import register_sql_functions
from postgresql_topn_spark.sources.tables import read_customer_reviews_csv


@pytest.fixture(scope="module")
def sql_session(spark):
    register_sql_functions(spark, counters=1000)
    sk = spark.createDataFrame(
        [(1, {"a": 5, "b": 3, "c": 3}), (2, {"x": 1}), (3, None)],
        "id int, sketch map<string,bigint>",
    )
    sk.createOrReplaceTempView("sketches")
    return spark


def test_topn_udtf_lateral(sql_session):
    rows = sql_session.sql(
        "SELECT id, t.item, t.frequency FROM sketches, "
        "LATERAL topn(sketch, 2) t ORDER BY id, frequency DESC, item"
    ).collect()
    # NULL sketch (id=3) emits no rows; ties break item ASC
    assert [(r.id, r.item, r.frequency) for r in rows] == [
        (1, "a", 5),
        (1, "b", 3),
        (2, "x", 1),
    ]


def test_topn_udtf_n_gt_counters_errors(sql_session):
    with pytest.raises(Exception, match="number of counters"):
        sql_session.sql("SELECT * FROM topn(map('a', 1L), 1001)").collect()


def test_topn_add_union_sql(sql_session):
    r = sql_session.sql(
        "SELECT topn_add(NULL, NULL) AS e, topn_add(NULL, 'x') AS one, "
        "topn_add(map('a', 1L), NULL) AS keep, "
        "topn_union(map('a', 1L), NULL) AS strict_null, "
        "topn_union(map('a', 1L, 'b', 2L), map('a', 9L)) AS merged"
    ).collect()[0]
    assert r.e == {} and r.one == {"x": 1} and r.keep == {"a": 1}
    assert r.strict_null is None
    assert r.merged == {"a": 10, "b": 2}


def test_csv_reviews_roundtrip(spark, tmp_path):
    p = str(tmp_path / "reviews.csv")
    with open(p, "w") as f:
        f.write(
            'AE22,1998-01-02,5,10,9,1713353,"Book A",22,Book,Cat,Sub,"{B1,B2}"\n'
            "AE23,1998-03-04,3,1,0,1713354,Book B,11,Book,Cat2,,{}\n"
        )
    df = read_customer_reviews_csv(spark, p)
    rows = {r.customer_id: r for r in df.collect()}
    assert rows["AE22"].similar_product_ids == ["B1", "B2"]
    assert rows["AE23"].similar_product_ids == []
    assert rows["AE22"].review_rating == 5
    assert str(rows["AE23"].review_date) == "1998-03-04"
    # flagship composition over the CSV: per-category top product sketch
    from postgresql_topn_spark.functions.aggregates import topn_add_agg

    sk = topn_add_agg(df, ["product_group"], "product_id", counters=100)
    assert sk.count() == 1
