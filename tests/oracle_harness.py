"""Local replica of the driver's DuckDB-oracle comparison: row count +
column names + order-insensitive canonical value comparison."""

from __future__ import annotations

import datetime
import math
import os

import duckdb


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canonical_rows(columns, rows):
    cols = list(columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def compare(spark_df, con, sql):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    sc, sr = canonical_rows(s_cols, s_rows)
    oc, orr = canonical_rows(o_cols, o_rows)
    problems = []
    if sc != oc:
        problems.append(f"column mismatch: spark={sc} oracle={oc}")
    if len(sr) != len(orr):
        problems.append(f"row count mismatch: spark={len(sr)} oracle={len(orr)}")
    if not problems and sr != orr:
        diff_s = [r for r in sr if r not in set(orr)][:5]
        diff_o = [r for r in orr if r not in set(sr)][:5]
        problems.append(f"value mismatch: spark-only={diff_s} oracle-only={diff_o}")
    return problems
