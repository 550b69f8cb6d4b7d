"""Stream-stream interval join: matched-within-bound semantics, state
eviction via watermarks, and batch-plan equivalence."""

from __future__ import annotations

import os
from datetime import datetime

from javascript_vector_database_spark.streaming.joins import stream_interval_join

IMP_SCHEMA = "user_id long, imp_id long, imp_ts timestamp"
CLK_SCHEMA = "user_id long, clk_id long, clk_ts timestamp"


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2026, 1, 1, 12, minute, second)


def _write(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_stream_interval_join_matches_within_bound(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    os.makedirs(imp_dir), os.makedirs(clk_dir)
    imps = [
        (1, 100, _ts(0)),  # clicked at +2 min -> match
        (2, 200, _ts(1)),  # clicked at +11 min -> outside 10-min bound
        (3, 300, _ts(2)),  # never clicked
    ]
    clks = [
        (1, 9100, _ts(2)),
        (2, 9200, _ts(12)),
        (4, 9400, _ts(3)),  # click with no impression
    ]
    _write(spark, imps, IMP_SCHEMA, imp_dir)
    _write(spark, clks, CLK_SCHEMA, clk_dir)

    joined = stream_interval_join(
        spark.readStream.schema(IMP_SCHEMA).parquet(imp_dir),
        spark.readStream.schema(CLK_SCHEMA).parquet(clk_dir),
        left_ts="imp_ts",
        right_ts="clk_ts",
        bound_secs=600,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["imp_id"], r["clk_id"])
            for r in spark.sql("SELECT * FROM attrib").collect()
        }
        assert got == {(100, 9100)}

        # a second click file lands inside user 3's window -> new match
        _write(spark, [(3, 9300, _ts(4))], CLK_SCHEMA, clk_dir)
        q.processAllAvailable()
        got = {
            (r["imp_id"], r["clk_id"])
            for r in spark.sql("SELECT * FROM attrib").collect()
        }
        assert got == {(100, 9100), (300, 9300)}
    finally:
        q.stop()

    # batch equivalence: the same plan over static frames agrees
    batch = stream_interval_join(
        spark.createDataFrame(imps, IMP_SCHEMA),
        spark.createDataFrame(clks + [(3, 9300, _ts(4))], CLK_SCHEMA),
        left_ts="imp_ts",
        right_ts="clk_ts",
        bound_secs=600,
    )
    assert {(r["imp_id"], r["clk_id"]) for r in batch.collect()} == got


def test_stream_interval_join_requires_distinct_ts_names(spark):
    import pytest

    df = spark.createDataFrame([], IMP_SCHEMA)
    with pytest.raises(ValueError):
        stream_interval_join(df, df, left_ts="imp_ts", right_ts="imp_ts")


def test_stream_static_enrich(spark, tmp_path):
    """Each micro-batch broadcast-joins the static dim; rows with no dim
    match are dropped (inner), and batches arriving AFTER the query
    started still enrich."""
    import os

    from javascript_vector_database_spark.streaming.joins import (
        stream_static_enrich,
    )

    src = str(tmp_path / "enrich_src")
    os.makedirs(src, exist_ok=True)
    schema = "id long, k long"
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], ["k", "tier"])

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write([(10, 1), (11, 3)])  # k=3 has no dim row
    q = stream_static_enrich(spark, src, schema, dim, "k", query_name="enr")
    try:
        q.processAllAvailable()
        write([(12, 2)])
        q.processAllAvailable()
        got = {
            (r["id"], r["tier"])
            for r in spark.sql("SELECT id, tier FROM enr").collect()
        }
        assert got == {(10, "gold"), (12, "silver")}
    finally:
        q.stop()


def test_session_interval_merge_is_order_confluent(spark, tmp_path):
    # gap-connected components are a property of the point SET — feeding
    # the same events in three adversarially interleaved thirds must
    # converge to the batch sessionization exactly (incl. the bridging
    # case: two far points first, the connector arriving LAST merges
    # both intervals into one session)
    import random
    import uuid

    from javascript_vector_database_spark.streaming.stateful import (
        SESSION_GAP_MS,
        streaming_session_intervals,
    )

    gap = SESSION_GAP_MS
    rng = random.Random(5)
    rows = []
    eid = 0
    for uid in range(1, 6):
        base = 1_000_000_000_000 + uid * 10 * gap
        # three clusters, the middle one bridging the first via a chain
        for off in (0, gap, 2 * gap, 5 * gap, 11 * gap, 11 * gap + 10):
            rows.append((eid, uid, base + off))
            eid += 1
    rng.shuffle(rows)
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    schema = "event_id long, user_id long, ms long"
    name = f"sess_conf_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(thirds[0], schema=schema).write.mode(
        "append"
    ).parquet(src)
    q = streaming_session_intervals(spark, src, schema, query_name=name)
    try:
        q.processAllAvailable()
        for part in thirds[1:]:
            spark.createDataFrame(part, schema=schema).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
        live = spark.table(name)
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        wv = Window.partitionBy("user_id").orderBy(F.col("version").desc())
        got = sorted(
            (
                r["user_id"],
                r["iv"]["starts"],
                r["iv"]["ends"],
                r["iv"]["counts"],
            )
            for r in live.withColumn("__rn", F.row_number().over(wv))
            .where(F.col("__rn") == 1)
            .select(
                "user_id",
                F.explode(
                    F.arrays_zip("starts", "ends", "counts")
                ).alias("iv"),
            )
            .collect()
        )
    finally:
        q.stop()

    # batch reference: sort each user's points, split on gap
    expect = []
    per_user = {}
    for _, uid, ms in rows:
        per_user.setdefault(uid, []).append(ms)
    for uid, pts in per_user.items():
        pts.sort()
        cur = [pts[0], pts[0], 1]
        for ms in pts[1:]:
            if ms - cur[1] > gap:
                expect.append((uid, cur[0], cur[1], cur[2]))
                cur = [ms, ms, 1]
            else:
                cur[1] = ms
                cur[2] += 1
        expect.append((uid, cur[0], cur[1], cur[2]))
    assert got == sorted(expect)
