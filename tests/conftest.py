from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

TABLES = [
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
]


@pytest.fixture(scope="session")
def spark():
    from culvert_spark.session import get_spark

    s = get_spark(app_name="culvert_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def duck_with_views(con, sf_dir):
    """Register testdata parquet as views, mirroring the driver."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'"
            )
    return con


def canonical_rows(pdf):
    """Order-insensitive, column-name-sorted canonical form (mirrors the
    driver's value-hash comparison)."""
    import pandas as pd

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        canon = []
        for v in tup:
            if v is None or (isinstance(v, float) and v != v):
                canon.append("NULL")
            elif isinstance(v, float):
                canon.append(repr(v))
            elif isinstance(v, pd.Timestamp):
                canon.append(v.isoformat())
            elif hasattr(v, "isoformat"):
                canon.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon.append(str(list(v)))
            else:
                canon.append(str(v))
        rows.append(tuple(canon))
    rows.sort()
    return cols, rows


def assert_query_matches_oracle(spark, duck, name, sf_dir):
    """Run one registered query against its DuckDB oracle and compare."""
    import __spark_entry__ as entrymod

    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    spark_pdf = qfn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    con = duck_with_views(duck, sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    scols, srows = canonical_rows(spark_pdf)
    dcols, drows = canonical_rows(duck_pdf)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    if srows != drows:
        diffs = [
            (a, b) for a, b in zip(srows, drows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
