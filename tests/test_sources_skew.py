"""Source/sink round-trips, skew utilities, and the stream-stream join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from culvert_spark import skew, sources
from culvert_spark import streaming as st
from culvert_spark.queries import t as scan
from tests.conftest import SF_SMALL
from tests.test_streaming import SCHEMA, run_round, ts, write_batch


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_round_trip(spark, tmp_path, fmt):
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet").limit(500)
    # CSV has no native timestamp; normalize to string for the comparison.
    df = src.withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
    path = str(tmp_path / fmt)
    sources.write_table(df, path, fmt=fmt, max_records_per_file=200)
    back = sources.read_table(
        spark, path, fmt=fmt,
        schema=df.schema if fmt in ("csv", "json") else None,
    )
    assert back.count() == 500
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        sources.read_table(spark, str(tmp_path), fmt="csv")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    path = str(tmp_path / "by_status")
    sources.write_table(df, path, partition_by=("o_orderstatus",))
    back = sources.read_table(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == df.filter(F.col("o_orderstatus") == "F").count()
    # Partition filter must prune directories, not appear as a data filter.
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_salted_join_equals_plain_join(spark):
    ev = scan(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type"
    )
    dim = (
        ev.select("user_id").distinct().withColumn(
            "tier", F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
        )
    )
    plain = ev.join(dim, "user_id").select("event_id", "tier")
    salted = skew.salted_join(ev, dim, "user_id", salts=8).select(
        "event_id", "tier"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_outer(spark):
    ev = scan(spark, SF_SMALL, "events").select(
        "event_id", "user_id"
    )
    dim = spark.createDataFrame(
        [(0, "zero")], "user_id bigint, name string"
    )
    plain = ev.join(dim, "user_id", "left").select("event_id", "name")
    salted = skew.salted_join(ev, dim, "user_id", salts=4, how="left").select(
        "event_id", "name"
    )
    assert sorted(
        map(tuple, plain.fillna("~").collect())
    ) == sorted(map(tuple, salted.fillna("~").collect()))


def test_salted_count_equals_groupby(spark):
    ev = scan(spark, SF_SMALL, "events")
    plain = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.event_type: r.n
        for r in skew.salted_count(ev, "event_type", salts=8).collect()
    }
    assert plain == salted


def test_stream_stream_join(spark, tmp_path):
    """Views joined to purchases of the same user within the watermark
    horizon (both sides streaming)."""
    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "purch")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    write_batch(vsrc, 1, [
        ("u1", 1, ts("2024-01-01 10:00:00"), "view", 1.0),
        ("u2", 2, ts("2024-01-01 10:05:00"), "view", 1.0),
    ])
    write_batch(psrc, 1, [
        ("u1", 11, ts("2024-01-01 10:30:00"), "purchase", 9.0),
        ("u3", 12, ts("2024-01-01 10:31:00"), "purchase", 9.0),
    ])
    views = sources.stream_read_dir(spark, vsrc, SCHEMA).select(
        F.col("user_id"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = sources.stream_read_dir(spark, psrc, SCHEMA).select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = st.stream_stream_join(
        views, purchases, on="user_id",
        ts_left="view_ts", ts_right="purchase_ts", delay="1 hour",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.read.parquet(out).toPandas()
    # Only u1 appears on both sides.
    assert len(sink) == 1
    assert sink.iloc[0]["user_id"] == "u1"
    assert sink.iloc[0]["view_id"] == 1
    assert sink.iloc[0]["purchase_id"] == 11


def test_text_round_trip(spark, tmp_path):
    from culvert_spark import sources

    df = spark.createDataFrame(
        [("alpha line",), ("beta line",), ("gamma line",)], ["value"]
    )
    out = str(tmp_path / "text_out")
    sources.write_text(df, out)
    back = sources.read_text(spark, out)
    assert sorted(r.value for r in back.collect()) == [
        "alpha line", "beta line", "gamma line",
    ]


def test_text_whole_file_mode(spark, tmp_path):
    from culvert_spark import sources

    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    (doc_dir / "a.txt").write_text("line1\nline2")
    (doc_dir / "b.txt").write_text("solo")
    back = sources.read_text(spark, str(doc_dir), whole_text=True)
    vals = sorted(r.value for r in back.collect())
    assert vals == ["line1\nline2", "solo"]


def test_binary_file_source(spark, tmp_path):
    from culvert_spark import sources

    media = tmp_path / "media"
    media.mkdir()
    (media / "img1.bin").write_bytes(b"\x89PNGfake")
    (media / "img2.bin").write_bytes(b"\xff\xd8fake")
    (media / "skip.txt").write_text("not binary payload")
    df = sources.read_binary_files(spark, str(media), glob="*.bin")
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"img1.bin", "img2.bin"}
    assert bytes(rows["img1.bin"].content) == b"\x89PNGfake"
    assert rows["img2.bin"].length == 6


def test_compact_files_reduces_file_count(spark, tmp_path):
    """compact_files must (a) preserve every row, (b) cut the file count to
    ceil(rows/target), (c) leave the directory readable at the same path."""
    out = str(tmp_path / "fragmented")
    # Simulate a streaming sink's droppings: 16 tiny files.
    spark.range(0, 1600).repartition(16).write.parquet(out)
    before_rows = spark.read.parquet(out).count()

    n_before, n_after = sources.compact_files(
        spark, out, fmt="parquet", target_rows_per_file=1000
    )
    assert n_before >= 16
    assert n_after == 2  # ceil(1600/1000)
    after = spark.read.parquet(out)
    assert after.count() == before_rows == 1600
    # Same content, not just same count.
    assert after.agg(F.sum("id")).first()[0] == sum(range(1600))


def test_write_clustered_files_have_disjoint_ranges(spark, tmp_path):
    """Range-clustered output: each file covers a non-overlapping key range
    (this is what makes footer min/max statistics prune whole files), and
    the clustered copy holds exactly the input rows."""
    import itertools
    import os

    out = str(tmp_path / "clustered")
    df = spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("payload")
    )
    sources.write_clustered(df, out, cluster_by=("k",), num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.agg(F.sum("k")).first()[0] == df.agg(F.sum("k")).first()[0]

    files = [
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    ]
    assert len(files) > 1, "need multiple files to demonstrate clustering"
    ranges = []
    for f in files:
        mm = spark.read.parquet(f).agg(F.min("k"), F.max("k")).first()
        ranges.append((mm[0], mm[1]))
    for (lo1, hi1), (lo2, hi2) in itertools.combinations(ranges, 2):
        assert hi1 < lo2 or hi2 < lo1, "file key ranges overlap"


def test_write_zordered_prunes_both_dims(spark, tmp_path):
    """Z-order layout: with two independent keys, every file's footer
    min/max must be narrow on BOTH dimensions — a 1/8-wide range predicate
    on either key should skip at least half of the 16 files (range
    clustering on one key would leave the other dimension unprunable:
    every file spans the full domain)."""
    import os

    out = str(tmp_path / "zordered")
    df = spark.range(0, 20_000).select(
        F.pmod(F.xxhash64("id"), F.lit(256)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).alias("b"),
        F.col("id").alias("payload"),
    )
    sources.write_zordered(df, out, zorder_by=("a", "b"), num_files=16, bits=8)

    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert (
        back.agg(F.sum("payload")).first()[0]
        == df.agg(F.sum("payload")).first()[0]
    )
    assert back.columns == ["a", "b", "payload"], "helper column must not leak"

    files = [
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    ]
    assert len(files) >= 8, "need multiple files to demonstrate clustering"
    boxes = []
    for f in files:
        mm = (
            spark.read.parquet(f)
            .agg(F.min("a"), F.max("a"), F.min("b"), F.max("b"))
            .first()
        )
        boxes.append(tuple(mm))
    # Range predicate covering 1/8 of each domain; a file is "hit" when its
    # bounding box intersects the slab (what footer-stats pruning checks).
    hit_a = sum(1 for (alo, ahi, _, _) in boxes if alo <= 31)
    hit_b = sum(1 for (_, _, blo, bhi) in boxes if blo <= 31)
    assert hit_a <= len(files) // 2, f"a-dim pruning too weak: {hit_a}/{len(files)}"
    assert hit_b <= len(files) // 2, f"b-dim pruning too weak: {hit_b}/{len(files)}"
