"""Session configuration — the Spark equivalent of the reference's GUC.

Reference: ``topn.number_of_counters`` (topn.c:159-179), default 1000,
valid range 1 .. JSONB_MAX_PAIRS (= 14,913,080 on the reference test
build, expected/add_agg.out:48). We mirror it as the Spark session conf
``spark.topn.numberOfCounters`` read at operator-construction time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

CONF_KEY = "spark.topn.numberOfCounters"
DEFAULT_COUNTERS = 1000
MAX_COUNTERS = 14_913_080

# int64 saturation bound for frequencies (topn.c:48, 997-1009).
INT64_MAX = 9223372036854775807


def _validate(value: int) -> int:
    value = int(value)
    if not (1 <= value <= MAX_COUNTERS):
        # mirrors PG's GUC range error, expected/add_agg.out:47-53
        raise ValueError(
            f"{CONF_KEY}={value} is outside the valid range [1, {MAX_COUNTERS}]"
        )
    return value


def number_of_counters(spark: SparkSession | None = None) -> int:
    """Current counter budget; validates like the reference GUC."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        return DEFAULT_COUNTERS
    return _validate(spark.conf.get(CONF_KEY, str(DEFAULT_COUNTERS)))


def set_number_of_counters(spark: SparkSession, value: int) -> None:
    """Set the counter budget — ``SET topn.number_of_counters`` parity.

    Like PostgreSQL's GUC assign hook, the setter also refreshes any
    SQL-function registration that follows the conf
    (functions/sql_api.py), so the next ``spark.sql()`` call sees the
    new budget — the reference reads its GUC per call (topn.c:229-233).
    """
    spark.conf.set(CONF_KEY, str(_validate(value)))
    # Only reach into the SQL registration module if it was ever
    # imported: a Column-API-only deployment (no pandas installed) must
    # be able to call this setter, and no session can be in the
    # follow-the-conf set unless sql_api was imported to register it.
    import sys

    sql_api = sys.modules.get("postgresql_topn_spark.functions.sql_api")
    if sql_api is not None:
        sql_api.refresh_sql_registration(spark)


def resolve_counters(counters: int | None, spark: SparkSession | None = None) -> int:
    """Explicit argument wins; falls back to the session conf."""
    if counters is not None:
        return _validate(counters)
    return number_of_counters(spark)
