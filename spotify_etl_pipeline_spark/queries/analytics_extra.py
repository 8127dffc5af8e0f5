"""Additional SQL-surface coverage: ranking-distribution window functions
and regex scalar functions — registered late so the correctness-sweep
rotation (catalog.py) is undisturbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_fixture
from .catalog import register


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey)
    """,
    survey="W1",
    doc="Ranking-distribution windows (ntile / percent_rank / cume_dist) "
    "per market segment; the order key carries a unique tie-break "
    "(c_custkey) so ntile bucket boundaries are deterministic. One "
    "shuffle on the partition key; no global sort.",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "regexp_scalar_functions",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_id,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           regexp_matches(c_name, '^Customer#') AS well_formed
    FROM customer
    """,
    survey="F1,F3",
    doc="Regex scalar surface: capture-group extraction, global "
    "replacement, and pattern predicate over customer names. DuckDB "
    "regexp_replace needs the explicit 'g' flag to match Spark's "
    "replace-all default; patterns stay in the POSIX-compatible subset "
    "both engines share.",
)
def regexp_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long").alias("name_id"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").rlike("^Customer#").alias("well_formed"),
    )
