"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``culvert_spark`` — this module only
assembles the registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from culvert_spark import queries as _q

_REGISTRIES = [_q]

try:  # text / dedup / similarity ops (filled in incrementally)
    from culvert_spark import textops as _t

    _REGISTRIES.append(_t)
except ImportError:  # pragma: no cover
    pass

try:  # multimodal (binary payload) ops — rows-only driver checks
    from culvert_spark import multimodal as _m

    _REGISTRIES.append(_m)
except ImportError:  # pragma: no cover
    pass

try:  # Arrow/pandas-UDF vectorized ops
    from culvert_spark import vectorops as _v

    _REGISTRIES.append(_v)
except ImportError:  # pragma: no cover
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _q.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _REGISTRIES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _REGISTRIES:
        out.update(mod.ORACLE)
    return out
