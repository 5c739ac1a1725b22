"""Direct SQL entry surface: register the testdata tables as temp views and
run arbitrary ANSI SQL through ``spark.sql`` — the interface a user of the
reference engine's query layer would reach for first (SURVEY.md §2 Tier B:
the query surface must be reachable as SQL text, not only through the
DataFrame combinators; both lower to the same Catalyst plans).

``q_sql_text_interface`` proves the path end-to-end in the driver contract:
its implementation is a literal SQL string executed via ``run_sql``, and its
DuckDB oracle is the same ANSI text — one query, two engines, byte-equal
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from culvert_spark.queries import QUERIES, ORACLE, register, t  # noqa: F401

TABLES = (
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
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create (or refresh) a temp view per testdata table. Views go through
    ``queries.t`` so the events timestamp normalization and UTC session
    pinning apply to SQL-text users exactly as they do to the DataFrame
    API."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run one ANSI SQL statement against the registered testdata views."""
    register_views(spark, sf_dir)
    return spark.sql(sql)


_SQL_Q = """
SELECT n_name,
       COUNT(DISTINCT c_custkey) AS customers,
       COUNT(o_orderkey) AS orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM nation
JOIN customer ON c_nationkey = n_nationkey
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY n_name
ORDER BY n_name
"""


@register("q_sql_text_interface", _SQL_Q)
def q_sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text entry path: the exact ANSI string the DuckDB oracle runs
    is executed via ``spark.sql`` over the registered views — proving a user
    can drive this engine with SQL alone and get byte-equal results. The
    left join keeps customers with no orders (COUNT(o_orderkey) skips their
    NULLs); the revenue sum uses the DECIMAL pattern for cross-engine
    determinism."""
    return run_sql(spark, sf_dir, _SQL_Q)


_LATERAL_Q = """
SELECT n_name, t.c_name, t.c_acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
ORDER BY n_name, c_acctbal DESC, c_name
"""


@register("q_lateral_topk_per_nation", _LATERAL_Q)
def q_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY ... LIMIT — top-2
    customers per nation written the way an ANSI-SQL user writes per-group
    top-k. Catalyst decorrelates this into the same window/top-k physical
    shape as the DataFrame formulation (q_top3_orders_per_customer), which
    is the point: lateral joins don't execute as per-row subquery loops.
    The identical text runs on DuckDB (both engines support SQL:2016
    LATERAL), with (acctbal DESC, name) a total order for determinism."""
    return run_sql(spark, sf_dir, _LATERAL_Q)
