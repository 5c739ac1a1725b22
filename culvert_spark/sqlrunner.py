"""Direct SQL entry surface: register the testdata tables as temp views and
run arbitrary ANSI SQL through ``spark.sql`` — the interface a user of the
reference engine's query layer would reach for first (SURVEY.md §2 Tier B:
the query surface must be reachable as SQL text, not only through the
DataFrame combinators; both lower to the same Catalyst plans).

``q_sql_text_interface`` proves the path end-to-end in the driver contract:
its implementation is a literal SQL string executed via ``run_sql``, and its
DuckDB oracle is the same ANSI text — one query, two engines, byte-equal
results.

Spark-4 SQL-surface coverage note: WITH RECURSIVE (q_recursive_cte_chain,
UNION ALL-only — dense graphs stay on corpusops.q_bfs_reachable_parts,
cross-documented there), listagg WITHIN GROUP, GROUP BY ALL and CREATE
FUNCTION SQL UDFs are registered rows. MATCH_RECOGNIZE is NOT in Spark
4.1's parser — row-pattern queries ship as the window-function
composition `q_pattern_match_sequences` (queries.py), which is the
registered twin to revisit if a later Spark lands SQL:2016 row-pattern
recognition.
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


_RECURSIVE_Q = """
WITH RECURSIVE succ AS (
  SELECT CAST(p_partkey AS BIGINT) AS src,
         CAST((p_partkey * 7919) % 100003 AS BIGINT) AS dst
  FROM part),
walk(part, depth) AS (
  SELECT src, 0 FROM succ WHERE src <= 5
  UNION ALL
  SELECT s.dst, w.depth + 1
  FROM walk w JOIN succ s ON s.src = w.part
  WHERE w.depth < 8)
SELECT part AS part_id,
       CAST(MIN(depth) AS INT) AS min_depth,
       CAST(COUNT(*) AS BIGINT) AS n_paths
FROM walk
GROUP BY part
ORDER BY part_id
"""


@register("q_recursive_cte_chain", _RECURSIVE_Q)
def q_recursive_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``WITH RECURSIVE`` (landed in Spark 4.0, SPARK-24497):
    transitive closure over a successor graph derived from the part
    table — the org-chart / dependency-closure workload that previously
    required the driver-side BFS loop (q_bfs_reachable_parts remains the
    pre-4.x pattern and the checkpoint-free cross-check). The IDENTICAL
    text runs on DuckDB.

    Dialect constraint pinned here: Spark's recursive CTEs accept only
    ``UNION ALL`` (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so each
    recursion level enumerates PATHS, not visited nodes. The successor
    graph is therefore built with out-degree EXACTLY 1
    (``(key * 7919) % 100003``): one path per seed per level, rows
    bounded by seeds x depth — blowup-proof by construction, and
    ``n_paths`` makes the UNION ALL multiplicity part of the verified
    contract. A dense graph under UNION ALL would need the BFS-loop
    form instead; that trade is the reason both formulations ship.

    Scale: each recursion level is one equi-join frontier→succ; depth
    caps the plan. Same shape as the loop form, planned by Catalyst."""
    return run_sql(spark, sf_dir, _RECURSIVE_Q)


_LISTAGG_SPARK = """
SELECT r_name,
       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""

_LISTAGG_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS members,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@register("q_listagg_members", _LISTAGG_ORACLE)
def q_listagg_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``listagg(...) WITHIN GROUP (ORDER BY ...)`` — the SQL:2016
    ordered string aggregation added in Spark 4.0 (the ANSI spelling of
    the old collect_list+array_join+sort idiom, whose unordered form is
    nondeterministic under parallelism; WITHIN GROUP makes the
    deterministic variant first-class). DuckDB spells the same operator
    ``string_agg(expr, sep ORDER BY ...)`` — one of the few rows whose
    oracle text differs from the Spark text, documenting the dialect
    split. The explicit ORDER BY inside the aggregate is what makes the
    value hash stable at any parallelism."""
    return run_sql(spark, sf_dir, _LISTAGG_SPARK)


_GROUP_BY_ALL_Q = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY ALL
ORDER BY ALL
"""


@register("q_group_by_all", _GROUP_BY_ALL_Q)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` — the analyst-ergonomics
    syntax (every non-aggregate select item becomes a grouping key;
    ordering follows the select list) that both engines resolve to the
    identical classic plan; the IDENTICAL text runs on DuckDB, so the
    hash row proves the resolution rules agree, not just the arithmetic.
    DECIMAL sum for cross-engine determinism as everywhere."""
    return run_sql(spark, sf_dir, _GROUP_BY_ALL_Q)


_SQL_UDF_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS net_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q_sql_udf_revenue", _SQL_UDF_ORACLE)
def q_sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (``CREATE FUNCTION ... RETURN expr``,
    Spark 4.0): the reusable-business-logic surface that does NOT leave
    the JVM — the function body is inlined into the plan by Catalyst
    (unlike a Python UDF there is no serialization boundary, so it
    composes with whole-stage codegen and pushdown). The oracle inlines
    the same expression, proving the inlining is semantics-preserving.
    The function is session-scoped (TEMPORARY) and re-created
    idempotently."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION culvert_net("
        "price DOUBLE, discount DOUBLE) RETURNS DOUBLE "
        "RETURN price * (1 - discount)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(culvert_net(l_extendedprice, l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS net_revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


_PARAMS_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_totalprice > 1000.0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("q_params_identifier", _PARAMS_ORACLE)
def q_params_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.5+/4 surface): named parameter markers
    (``:name`` bound via ``spark.sql(..., args={...})``) plus the
    ``IDENTIFIER(:tbl)`` clause that turns a *string parameter* into a
    resolved table reference — the injection-safe templating path
    (parameters are bound as literals/identifiers by the parser, never
    string-spliced, so a value like ``"orders; DROP"`` cannot change the
    statement shape). The oracle is the same query with the parameters
    inlined as constants, proving binding is semantics-preserving.
    Scale: identical plan to the inlined query — the bound literal
    participates in predicate pushdown like any constant."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_price
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :floor
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """,
        args={"tbl": "orders", "floor": 1000.0},
    )
