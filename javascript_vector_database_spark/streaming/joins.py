"""Stream-stream interval join — correlating two live change feeds.

Reference spec: the reference's change streams are single-collection push
feeds (MAP#rxdb/dist/esm/rx-collection.js `$` observable; SURVEY §2.1
"change stream") — correlating TWO live feeds (the ad-tech
impression/click shape, or doc-created vs doc-embedded events) has no
reference surface and is exactly what Structured Streaming's
watermark-bounded stream-stream join exists for.

Scale semantics (why the watermark + interval bound are load-bearing):
without them a stream-stream join must buffer BOTH sides forever; with
them Spark keeps per-key state only inside
``[watermark - bound, watermark]`` and evicts everything older, so state
is O(arrival rate × bound) regardless of how long the streams run — the
property that makes this runnable against an unbounded 100 TB/day feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "left_ts",
    right_ts: str = "right_ts",
    bound_secs: int = 600,
    watermark_secs: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Join right-side events landing within ``[left_ts, left_ts +
    bound_secs]`` of a matching-key left event.  Both sides are
    watermarked so the join state stays bounded; the time bound must be a
    join-condition range (not a post-filter) for Spark to derive the
    eviction policy.  ``left_ts``/``right_ts`` must be distinct names;
    the shared ``key`` column is emitted once."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, f"{watermark_secs} seconds")
    rw = right.withWatermark(right_ts, f"{watermark_secs} seconds")
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {bound_secs} SECONDS"))
    )
    return lw.join(rw, cond, how).drop(rw[key])


def stream_static_enrich(
    spark,
    source_dir: str,
    schema,
    dim_df,
    key: str,
    query_name: str = "enrich_stream",
):
    """Stream-static enrichment: every micro-batch equi-joins the static
    dimension (Spark plans it as a broadcast against each batch — the
    streaming form of the lookup join, reference src/search.ts join
    semantics under a readStream source).  The static side is re-read
    per batch if it is a file source, so slowly-changing dims pick up
    updates without restarting the query.  Append-mode memory sink."""
    from pyspark.sql import functions as F  # noqa: F401

    stream = spark.readStream.schema(schema).parquet(source_dir)
    enriched = stream.join(dim_df, key)
    return (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
